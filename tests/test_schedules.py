import numpy as np
import pytest

from moldiff_tpu.ops import schedules


ADVANCE_KW = dict(scale_start=0.9999, scale_end=0.0001, width=3)
SEGMENT_KW = dict(
    time_segment=[600, 400],
    segment_diff=[
        dict(scale_start=0.9999, scale_end=0.001, width=3),
        dict(scale_start=0.001, scale_end=0.0001, width=2),
    ],
)


@pytest.mark.parametrize(
    "name,kw",
    [
        ("advance", ADVANCE_KW),
        ("segment", SEGMENT_KW),
        ("cosine", {}),
        ("linear", dict(beta_start=1e-4, beta_end=0.02)),
        ("quad", dict(beta_start=1e-4, beta_end=0.02)),
        ("sigmoid", dict(beta_start=1e-4, beta_end=0.02)),
        ("const", dict(beta_end=0.01)),
        ("jsd", {}),
    ],
)
def test_schedule_properties(name, kw):
    T = 1000
    betas = schedules.get_beta_schedule(name, T, **kw)
    assert betas.shape == (T,)
    assert np.all(betas >= 0) and np.all(betas <= 1)
    alphas_bar = np.cumprod(1 - betas)
    assert alphas_bar[-1] < alphas_bar[0]


def test_advance_endpoints():
    betas, abar = schedules.advance_schedule(1000, 0.9999, 0.0001, 3, return_alphas_bar=True)
    assert abs(abar[0] - 0.9999) < 1e-6
    assert abs(abar[-1] - 0.0001) < 1e-6


def test_segment_continuity():
    betas = schedules.get_beta_schedule("segment", 1000, **SEGMENT_KW)
    abar = np.cumprod(1 - betas)
    # bond schedule: nearly fully decayed by the end of segment one (step 600)
    assert abar[599] < 0.002
    assert abar[-1] < 2e-4


def test_golden_vs_reference(reference_modules):
    ref_diffusion, _ = reference_modules
    for name, kw in [
        ("advance", ADVANCE_KW),
        ("segment", SEGMENT_KW),
        ("cosine", {}),
        ("linear", dict(beta_start=1e-4, beta_end=0.02)),
    ]:
        ours = schedules.get_beta_schedule(name, 1000, **kw)
        ref = ref_diffusion.get_beta_schedule(name, num_timesteps=1000, **kw)
        np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-15)
