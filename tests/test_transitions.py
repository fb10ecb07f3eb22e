import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moldiff_tpu.ops import schedules
from moldiff_tpu.ops.categorical import (
    CategoricalTransition,
    categorical_kl,
    index_to_log_onehot,
    log_sample_categorical,
)
from moldiff_tpu.ops.gaussian import GaussianTransition

T = 50
K = 6


def _betas():
    return schedules.get_beta_schedule(
        "advance", T, scale_start=0.9999, scale_end=0.001, width=3
    )


# ---------------------------------------------------------------------------
# Gaussian transition
# ---------------------------------------------------------------------------

class TestGaussian:
    def test_posterior_coefficients_golden(self, reference_modules):
        _, ref_transition = reference_modules
        betas = _betas()
        ours = GaussianTransition(betas)
        ref = ref_transition.ContigousTransition(betas)
        np.testing.assert_allclose(np.asarray(ours.coef_x0), ref.coef_x0.numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ours.coef_xt), ref.coef_xt.numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ours.std), ref.std.numpy(), rtol=1e-6)

    def test_add_noise_statistics(self):
        tr = GaussianTransition(_betas())
        key = jax.random.PRNGKey(0)
        x = jnp.ones((4, 2000, 3))
        t = jnp.array([0, 10, 25, T - 1], dtype=jnp.int32)
        pert, noise = tr.add_noise(x, t, key)
        a_bar = np.asarray(tr.alphas_bar)[np.asarray(t)]
        means = np.asarray(pert).mean(axis=(1, 2))
        stds = np.asarray(pert).std(axis=(1, 2))
        np.testing.assert_allclose(means, np.sqrt(a_bar), atol=0.05)
        np.testing.assert_allclose(stds, np.sqrt(1 - a_bar), atol=0.05)

    def test_get_prev_returns_mean_at_t0(self):
        tr = GaussianTransition(_betas())
        key = jax.random.PRNGKey(1)
        x_t = jnp.ones((2, 5, 3))
        x0 = jnp.zeros((2, 5, 3))
        t = jnp.array([0, 0], dtype=jnp.int32)
        out1 = tr.get_prev_from_recon(x_t, x0, t, key)
        out2 = tr.get_prev_from_recon(x_t, x0, t, jax.random.PRNGKey(2))
        # at t == 0 the result is the deterministic posterior mean
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-7)


# ---------------------------------------------------------------------------
# Categorical transition
# ---------------------------------------------------------------------------

class TestCategorical:
    @pytest.mark.parametrize("prior", ["uniform", "absorb", "tomask"])
    def test_matrices_are_stochastic(self, prior):
        tr = CategoricalTransition(_betas(), K, init_prob=prior)
        q = np.asarray(tr.q_mats)
        np.testing.assert_allclose(q.sum(-1), 1.0, atol=1e-5)
        assert np.all(q >= -1e-7)

    def test_qmats_cumulative_product(self):
        tr = CategoricalTransition(_betas(), K, init_prob="absorb")
        one_step = np.transpose(np.asarray(tr.transpose_q_onestep_mats), (0, 2, 1))
        acc = one_step[0]
        np.testing.assert_allclose(np.asarray(tr.q_mats[0]), acc, atol=1e-6)
        for t in range(1, T):
            acc = acc @ one_step[t]
            np.testing.assert_allclose(np.asarray(tr.q_mats[t]), acc, atol=1e-5)

    @pytest.mark.parametrize("prior", ["absorb", "tomask"])
    def test_golden_vs_reference(self, reference_modules, prior):
        """q_mats, posterior, and v_Lt match the reference implementation."""
        import torch

        _, ref_transition = reference_modules
        betas = _betas()
        ours = CategoricalTransition(betas, K, init_prob=prior)
        ref = ref_transition.GeneralCategoricalTransition(betas, K, init_prob=prior)

        np.testing.assert_allclose(
            np.asarray(ours.q_mats), ref.q_mats.numpy(), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(ours.transpose_q_onestep_mats),
            ref.transpopse_q_onestep_mats.numpy(),
            rtol=1e-6,
        )

        # posterior on a batch: B=3 graphs, M=4 elements each
        rng = np.random.default_rng(0)
        B, M = 3, 4
        t_np = np.array([0, 7, T - 1], dtype=np.int64)
        logits_v0 = rng.normal(size=(B, M, K)).astype(np.float32)
        log_v0 = logits_v0 - np.log(np.exp(logits_v0).sum(-1, keepdims=True))
        vt = rng.integers(0, K, size=(B, M))
        log_vt = np.asarray(index_to_log_onehot(jnp.asarray(vt), K))

        ours_post = np.asarray(
            ours.q_v_posterior(
                jnp.asarray(log_v0), jnp.asarray(log_vt), jnp.asarray(t_np), v0_prob=True
            )
        )
        # reference uses flat [n, K] arrays with a per-element batch vector
        batch = torch.arange(B).repeat_interleave(M)
        ref_post = ref.q_v_posterior(
            torch.from_numpy(log_v0.reshape(-1, K)),
            torch.from_numpy(log_vt.reshape(-1, K)),
            torch.from_numpy(t_np),
            batch,
            v0_prob=True,
        ).numpy()
        np.testing.assert_allclose(
            ours_post.reshape(-1, K), ref_post, rtol=1e-4, atol=1e-5
        )

        # compute_v_Lt
        log_post_pred = np.log(
            np.full((B, M, K), 1.0 / K, dtype=np.float32)
        )
        ours_lt = np.asarray(
            ours.compute_v_Lt(
                jnp.asarray(ours_post), jnp.asarray(log_post_pred),
                jnp.asarray(log_v0), jnp.asarray(t_np),
            )
        )
        ref_lt = ref.compute_v_Lt(
            torch.from_numpy(ours_post.reshape(-1, K)),
            torch.from_numpy(log_post_pred.reshape(-1, K)),
            torch.from_numpy(log_v0.reshape(-1, K)),
            torch.from_numpy(t_np),
            batch,
        ).numpy()
        np.testing.assert_allclose(ours_lt.reshape(-1), ref_lt, rtol=1e-4, atol=1e-5)

    def test_posterior_bayes_identity(self):
        """q(v_{t-1}|v_t,v0) computed by the module equals explicit Bayes."""
        tr = CategoricalTransition(_betas(), K, init_prob="absorb")
        q_mats = np.asarray(tr.q_mats, dtype=np.float64)
        one_step = np.transpose(
            np.asarray(tr.transpose_q_onestep_mats, dtype=np.float64), (0, 2, 1)
        )
        t = 9
        v0, vt = 2, 0
        # explicit: p(v_{t-1}=k) ∝ q_one_step[t][k, vt] * q_mats[t-1][v0, k]
        post = one_step[t][:, vt] * q_mats[t - 1][v0, :]
        post = post / post.sum()

        log_v0 = np.asarray(index_to_log_onehot(jnp.asarray([[v0]]), K))
        log_vt = np.asarray(index_to_log_onehot(jnp.asarray([[vt]]), K))
        ours = np.exp(
            np.asarray(
                tr.q_v_posterior(
                    jnp.asarray(log_v0), jnp.asarray(log_vt),
                    jnp.asarray([t]), v0_prob=True,
                )
            )
        )[0, 0]
        np.testing.assert_allclose(ours, post, rtol=1e-3, atol=1e-5)

    def test_posterior_t0_returns_v0(self):
        tr = CategoricalTransition(_betas(), K, init_prob="tomask")
        log_v0 = jnp.log(jnp.full((1, 3, K), 1.0 / K))
        log_vt = index_to_log_onehot(jnp.zeros((1, 3), dtype=jnp.int32), K)
        out = tr.q_v_posterior(log_v0, log_vt, jnp.asarray([0]), v0_prob=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(log_v0), atol=1e-6)

    def test_add_noise_limits(self):
        """At t=T-1 samples follow the prior; at t=0 mostly stay put."""
        tr = CategoricalTransition(_betas(), K, init_prob="absorb")
        key = jax.random.PRNGKey(0)
        v = jnp.full((1, 20000), 3, dtype=jnp.int32)
        v_late, _, _ = tr.add_noise(v, jnp.asarray([T - 1]), key)
        frac_absorbed = np.asarray(v_late[..., 0]).mean()
        assert frac_absorbed > 0.9  # absorb prior concentrates on class 0
        v_early, _, _ = tr.add_noise(v, jnp.asarray([0]), key)
        assert np.asarray(v_early[..., 3]).mean() > 0.99

    def test_gumbel_sampler_distribution(self):
        probs = jnp.asarray([0.6, 0.3, 0.1])
        logits = jnp.log(jnp.broadcast_to(probs, (50000, 3)))
        s = np.asarray(log_sample_categorical(logits, jax.random.PRNGKey(0)))
        emp = np.bincount(s, minlength=3) / len(s)
        np.testing.assert_allclose(emp, np.asarray(probs), atol=0.01)

    def test_kl_nonnegative(self, rng):
        a = rng.normal(size=(10, K)).astype(np.float32)
        b = rng.normal(size=(10, K)).astype(np.float32)
        la = jnp.asarray(a - np.log(np.exp(a).sum(-1, keepdims=True)))
        lb = jnp.asarray(b - np.log(np.exp(b).sum(-1, keepdims=True)))
        assert np.all(np.asarray(categorical_kl(la, lb)) >= -1e-6)
