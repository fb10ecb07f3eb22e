"""Golden test of the reverse-sampler categorical chain vs the reference.

The subtlest parity risk is the recursive log-posterior threading
(reference models/model.py:292-298: q_v_posterior consumes the PREVIOUS
step's posterior, not the sampled one-hots). With scripted denoiser logits
the whole chain of log posteriors is deterministic, so it can be compared
step-by-step against the reference implementation run in torch.
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from moldiff_tpu.ops.categorical import CategoricalTransition
from moldiff_tpu.ops.schedules import get_beta_schedule

T, K, N = 8, 5, 7  # timesteps, classes, elements


def scripted_logits(step: int) -> np.ndarray:
    """Deterministic fake denoiser output per step."""
    rng = np.random.default_rng(1000 + step)
    return rng.normal(size=(N, K)).astype(np.float32)


@pytest.mark.parametrize("prior", ["uniform", "absorb", "tomask"])
def test_posterior_chain_golden(reference_modules, prior):
    import torch
    import torch.nn.functional as F

    diffusion, transition = reference_modules
    betas = get_beta_schedule(
        "advance", T, scale_start=0.9999, scale_end=0.0001, width=3
    )

    ours = CategoricalTransition(betas, K, init_prob=prior)
    ref = transition.GeneralCategoricalTransition(
        np.asarray(betas), K, init_prob=prior
    )

    # identical init: start from the prior's log probs
    _, _, log_ours = ours.sample_init((1, N), jax.random.key(0))
    # reference sample_init draws; instead build its log-init directly the
    # same way (log of init_prob broadcast)
    init_log = torch.log(
        torch.from_numpy(np.asarray(ref.init_prob, dtype=np.float32)) + 1e-30
    ).repeat(N, 1)
    log_ref = init_log
    log_our_chain = jnp.broadcast_to(
        jnp.log(jnp.asarray(ours.init_prob) + 1e-30)[None, None, :], (1, N, K)
    )

    batch = torch.zeros(N, dtype=torch.long)
    for i, step in enumerate(range(T)[::-1]):
        logits = scripted_logits(step)

        t_torch = torch.full((1,), step, dtype=torch.long)
        log_recon_t = F.log_softmax(torch.from_numpy(logits), dim=-1)
        log_ref = ref.q_v_posterior(
            log_recon_t, log_ref, t_torch, batch, v0_prob=True
        )

        t_jax = jnp.full((1,), step, dtype=jnp.int32)
        log_recon_j = jax.nn.log_softmax(jnp.asarray(logits)[None], axis=-1)
        log_our_chain = ours.q_v_posterior(
            log_recon_j, log_our_chain, t_jax, v0_prob=True
        )

        np.testing.assert_allclose(
            np.asarray(log_our_chain[0]),
            log_ref.numpy(),
            rtol=1e-4, atol=1e-5,
            err_msg=f"prior={prior} step={step}",
        )


def test_gumbel_sampling_equivalent_distribution(reference_modules):
    """Our Gumbel categorical sampler must match the reference's sampling
    distribution (chi-square-free sanity: empirical freq within 3 sigma)."""
    from moldiff_tpu.ops.categorical import log_sample_categorical

    probs = np.array([0.5, 0.2, 0.2, 0.05, 0.05], dtype=np.float32)
    log_p = jnp.log(jnp.broadcast_to(jnp.asarray(probs), (20000, K)))
    samples = np.asarray(log_sample_categorical(log_p[None], jax.random.key(7))[0])
    freq = np.bincount(samples, minlength=K) / len(samples)
    sigma = np.sqrt(probs * (1 - probs) / len(samples))
    assert np.all(np.abs(freq - probs) < 4 * sigma + 1e-3), (freq, probs)
