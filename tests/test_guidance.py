"""Guided sampling tests: all 8 bond-guidance modes run inside the sampler
scan, produce finite outputs, actually steer positions, and respect padding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moldiff_tpu.models.bond_predictor import BondPredictor
from moldiff_tpu.models.moldiff import MolDiff, _bond_guidance_delta
from moldiff_tpu.ops import graph_ops
from moldiff_tpu.utils.config import Config

GUIDANCE_MODES = [
    "entropy", "uncertainty", "uncertainty_bond", "entropy_bond",
    "logit_bond", "logit", "crossent", "crossent_bond",
]


def tiny_moldiff():
    return MolDiff(Config({
        "node_dim": 16,
        "edge_dim": 8,
        "denoiser": {"num_blocks": 1, "cutoff": 10, "use_gate": True},
        "diff": {
            "num_timesteps": 6,
            "time_dim": 4,
            "categorical_space": "discrete",
            "diff_pos": {"beta_schedule": "advance", "scale_start": 0.9999,
                         "scale_end": 0.0001, "width": 3},
            "diff_atom": {"init_prob": "tomask", "beta_schedule": "advance",
                          "scale_start": 0.9999, "scale_end": 0.0001, "width": 3},
            "diff_bond": {"init_prob": "absorb", "beta_schedule": "advance",
                          "scale_start": 0.9999, "scale_end": 0.0001, "width": 3},
        },
    }), 8, 6)


def tiny_bondpred(num_edge_types=5):
    # sample-time predictor: no mask edge class (reference
    # scripts/sample_drug3d.py:88)
    return BondPredictor(Config({
        "node_dim": 16,
        "edge_dim": 8,
        "encoder": {"num_blocks": 1, "cutoff": 10, "use_gate": True,
                    "update_edge": True, "update_pos": False},
        "diff": {
            "num_timesteps": 6,
            "time_dim": 4,
            "categorical_space": "discrete",
            "diff_pos": {"beta_schedule": "advance", "scale_start": 0.9999,
                         "scale_end": 0.0001, "width": 3},
            "diff_atom": {"init_prob": "tomask", "beta_schedule": "advance",
                          "scale_start": 0.9999, "scale_end": 0.0001, "width": 3},
        },
    }), 8, num_edge_types)


@pytest.fixture(scope="module")
def setup():
    model = tiny_moldiff()
    params = model.init_params(jax.random.key(0))
    bp = tiny_bondpred()
    bp_params = bp.init_params(jax.random.key(1))
    b, n = 2, 6
    node_mask = np.ones((b, n), np.float32)
    node_mask[1, 4:] = 0.0  # ragged batch
    return model, params, bp, bp_params, jnp.asarray(node_mask)


@pytest.mark.slow
@pytest.mark.parametrize("mode", GUIDANCE_MODES)
def test_all_modes_sample_finite(setup, mode):
    model, params, bp, bp_params, node_mask = setup
    res = model.sample(
        params, node_mask, jax.random.key(2),
        guidance=(mode, 1e-2), bond_predictor=(bp, bp_params),
    )
    assert np.isfinite(np.asarray(res.pred_pos)).all(), mode
    assert np.isfinite(np.asarray(res.pred_node)).all(), mode
    assert np.isfinite(np.asarray(res.pred_halfedge)).all(), mode


def test_guidance_changes_positions(setup):
    model, params, bp, bp_params, node_mask = setup
    res0 = model.sample(params, node_mask, jax.random.key(3))
    res1 = model.sample(
        params, node_mask, jax.random.key(3),
        guidance=("uncertainty", 1e-1), bond_predictor=(bp, bp_params),
    )
    # same PRNG key: any difference comes from the guidance deltas
    assert not np.allclose(np.asarray(res0.pred_pos), np.asarray(res1.pred_pos))


def test_zero_scale_equals_unguided(setup):
    model, params, bp, bp_params, node_mask = setup
    res0 = model.sample(params, node_mask, jax.random.key(4))
    res1 = model.sample(
        params, node_mask, jax.random.key(4),
        guidance=("uncertainty", 0.0), bond_predictor=(bp, bp_params),
    )
    np.testing.assert_allclose(
        np.asarray(res0.pred_pos), np.asarray(res1.pred_pos), atol=1e-6
    )


@pytest.mark.slow
def test_dynamic_scale_matches_static(setup):
    """The guidance scale as a TRACED runtime argument (scale sweeps reuse
    one compile) must produce exactly the static-float-closure result."""
    model, params, bp, bp_params, node_mask = setup
    static = model.sample(
        params, node_mask, jax.random.key(5),
        guidance=("uncertainty", 1e-1), bond_predictor=(bp, bp_params),
    )

    @jax.jit
    def dyn(scale):
        res = model.sample(
            params, node_mask, jax.random.key(5),
            guidance=("uncertainty", scale), bond_predictor=(bp, bp_params),
        )
        return res.pred_pos

    np.testing.assert_allclose(
        np.asarray(dyn(jnp.float32(1e-1))), np.asarray(static.pred_pos),
        atol=1e-6,
    )
    # a different scale through the SAME compiled fn changes the output
    assert not np.allclose(np.asarray(dyn(jnp.float32(1e-3))),
                           np.asarray(static.pred_pos))


@pytest.mark.slow
def test_sampler_scale_sweep_no_recompile(setup):
    """MolSampler.set_guidance_scale sweeps scales through one compiled
    chain; results match samplers built statically at each scale."""
    from moldiff_tpu.data.featurize import MolFeaturizer
    from moldiff_tpu.sample.pipeline import MolSampler

    model, params, bp, bp_params, node_mask = setup
    feat = MolFeaturizer()
    sizes = np.array([5, 6], dtype=np.int64)

    def fresh(scale):
        s = MolSampler(model, feat, bond_predictor=(bp, bp_params),
                       guidance=("uncertainty", scale), buckets=(6,),
                       batch_size=2)
        return s.sample_sizes(params, sizes, jax.random.key(6))

    sweep = MolSampler(model, feat, bond_predictor=(bp, bp_params),
                       guidance=("uncertainty", 1e-1), buckets=(6,),
                       batch_size=2)
    out_a = sweep.sample_sizes(params, sizes, jax.random.key(6))
    sweep.set_guidance_scale(1e-3)
    out_b = sweep.sample_sizes(params, sizes, jax.random.key(6))
    assert len(sweep._compiled) == 1  # second scale reused the compiled fn

    for ours, ref in ((out_a, fresh(1e-1)), (out_b, fresh(1e-3))):
        for d_ours, d_ref in zip(ours, ref):
            np.testing.assert_allclose(
                d_ours["atom_pos"], d_ref["atom_pos"], atol=1e-6
            )


@pytest.mark.parametrize("mode", GUIDANCE_MODES)
def test_delta_respects_padding(setup, mode):
    """Guidance deltas on padded atoms must not leak into real atoms, and
    the delta itself must be finite everywhere."""
    model, params, bp, bp_params, node_mask = setup
    b, n = node_mask.shape
    e = graph_ops.num_halfedges(n)
    key = jax.random.key(5)
    ks = jax.random.split(key, 3)
    h_node = jax.nn.one_hot(jax.random.randint(ks[0], (b, n), 0, 8), 8)
    pos = jax.random.normal(ks[1], (b, n, 3))
    t = jnp.full((b,), 3, jnp.int32)
    he_prev = jax.random.randint(ks[2], (b, e), 0, 6)
    log_he = jnp.log(jnp.full((b, e, 6), 1.0 / 6))

    delta = _bond_guidance_delta(
        (bp, bp_params), mode, 1e-2,
        h_node_pert=h_node, pos_pert=pos, t=t, node_mask=node_mask,
        halfedge_type_prev=he_prev, log_halfedge_type=log_he,
    )
    assert np.isfinite(np.asarray(delta)).all(), mode


@pytest.mark.slow
def test_traj_saving(setup):
    model, params, bp, bp_params, node_mask = setup
    res = model.sample(params, node_mask, jax.random.key(6), save_traj=True)
    assert res.traj is not None
    h_node_traj, pos_traj, he_traj = res.traj
    T = model.num_timesteps
    assert pos_traj.shape[0] == T + 1  # prior + T steps
    assert np.isfinite(np.asarray(pos_traj)).all()


@pytest.mark.slow
def test_chunked_equals_single_scan(setup):
    """sample_chunked must be bitwise-identical to the single lax.scan
    (chunking just splits the sequential scan)."""
    model, params, bp, bp_params, node_mask = setup
    kw = dict(guidance=("uncertainty", 1e-2), bond_predictor=(bp, bp_params))
    r1 = model.sample(params, node_mask, jax.random.key(9), **kw)
    r2 = model.sample_chunked(params, node_mask, jax.random.key(9),
                              chunk_size=2, **kw)
    np.testing.assert_allclose(np.asarray(r1.pred_pos), np.asarray(r2.pred_pos),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1.pred_node),
                               np.asarray(r2.pred_node), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_guidance_interval(setup):
    """interval=1 == default every-step; interval=T behaves like guidance on
    only the steps where step % T == 0 (i.e. the final step), so it sits
    strictly between unguided and every-step for a large-scale signal."""
    model, params, bp, bp_params, node_mask = setup
    gd = ("uncertainty", 1e-1)
    every = model.sample(
        params, node_mask, jax.random.key(5),
        guidance=gd, bond_predictor=(bp, bp_params),
    )
    every_explicit = model.sample(
        params, node_mask, jax.random.key(5),
        guidance=gd, bond_predictor=(bp, bp_params), guidance_interval=1,
    )
    np.testing.assert_allclose(
        np.asarray(every.pred_pos), np.asarray(every_explicit.pred_pos),
        atol=1e-6,
    )

    k2 = model.sample(
        params, node_mask, jax.random.key(5),
        guidance=gd, bond_predictor=(bp, bp_params), guidance_interval=2,
    )
    # applying guidance on half the steps must differ from every step
    assert not np.allclose(np.asarray(every.pred_pos), np.asarray(k2.pred_pos))
    unguided = model.sample(params, node_mask, jax.random.key(5))
    assert not np.allclose(np.asarray(unguided.pred_pos), np.asarray(k2.pred_pos))

    # chunked path honors the interval and matches the single-scan path
    k2_chunked = model.sample_chunked(
        params, node_mask, jax.random.key(5), chunk_size=3,
        guidance=gd, bond_predictor=(bp, bp_params), guidance_interval=2,
    )
    np.testing.assert_allclose(
        np.asarray(k2.pred_pos), np.asarray(k2_chunked.pred_pos), atol=1e-5
    )


@pytest.mark.slow
def test_chunked_traj_equals_single_scan_traj(setup):
    """Chunked trajectory saving (host-concatenated per-chunk states) must
    reproduce the single-scan trajectory, guided and unguided."""
    model, params, bp, bp_params, node_mask = setup
    for kw in (
        {},
        dict(guidance=("uncertainty", 1e-2), bond_predictor=(bp, bp_params)),
    ):
        r1 = model.sample(params, node_mask, jax.random.key(11),
                          save_traj=True, **kw)
        r2 = model.sample_chunked(params, node_mask, jax.random.key(11),
                                  chunk_size=2, save_traj=True, **kw)
        assert r2.traj is not None and len(r2.traj) == 3
        for a, b in zip(r1.traj, r2.traj):
            assert np.asarray(a).shape == np.asarray(b).shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
