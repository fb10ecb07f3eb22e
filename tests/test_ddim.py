"""DDIM position sampling (ops/gaussian.py:ddim_prev + pos_sampler='ddim').

Key invariants:
  * eta=1 DDIM step == the DDPM ancestral posterior EXACTLY (same mean and
    std, so with the same key the draws match);
  * eta=0 is deterministic (key-independent);
  * t=0 returns the x0 prediction (no-noise final step, both samplers);
  * the full sampler runs with pos_sampler='ddim', composes with respacing,
    and eta=0 chains are reproducible across different noise keys for the
    position head given identical categorical draws.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moldiff_tpu.ops.gaussian import GaussianTransition
from moldiff_tpu.ops.schedules import get_beta_schedule
from tests.test_guidance import tiny_moldiff


@pytest.fixture(scope="module")
def tr():
    betas = get_beta_schedule(
        beta_schedule="advance", num_timesteps=30,
        scale_start=0.9999, scale_end=0.0001, width=3,
    )
    return GaussianTransition(betas)


class TestDdimStep:
    def test_eta1_equals_ddpm_posterior(self, tr):
        """sigma_ddim(eta=1) == posterior std and the means coincide, so the
        same key gives the same draw."""
        key_x, key_n = jax.random.split(jax.random.key(0))
        x_t = jax.random.normal(key_x, (3, 5, 3))
        x0 = 0.5 * jax.random.normal(jax.random.key(9), (3, 5, 3))
        for tv in (1, 7, 15, 29):
            t = jnp.full((3,), tv, jnp.int32)
            ddpm = tr.get_prev_from_recon(x_t, x0, t, key_n)
            ddim = tr.ddim_prev(x_t, x0, t, key_n, eta=1.0)
            np.testing.assert_allclose(
                np.asarray(ddpm), np.asarray(ddim), rtol=2e-4, atol=2e-5
            )

    def test_eta0_deterministic(self, tr):
        x_t = jax.random.normal(jax.random.key(1), (2, 4, 3))
        x0 = jax.random.normal(jax.random.key(2), (2, 4, 3))
        t = jnp.full((2,), 10, jnp.int32)
        a = tr.ddim_prev(x_t, x0, t, jax.random.key(3), eta=0.0)
        b = tr.ddim_prev(x_t, x0, t, jax.random.key(4), eta=0.0)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_t0_returns_x0(self, tr):
        x_t = jax.random.normal(jax.random.key(5), (2, 4, 3))
        x0 = jax.random.normal(jax.random.key(6), (2, 4, 3))
        t = jnp.zeros((2,), jnp.int32)
        for eta in (0.0, 0.7, 1.0):
            out = tr.ddim_prev(x_t, x0, t, jax.random.key(7), eta=eta)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(x0), rtol=1e-5, atol=1e-6
            )
        # DDPM t=0 also returns its posterior mean == x0 (coef_x0[0] == 1)
        ddpm = tr.get_prev_from_recon(x_t, x0, t, jax.random.key(8))
        np.testing.assert_allclose(
            np.asarray(ddpm), np.asarray(x0), rtol=1e-5, atol=1e-6
        )


class TestDdimSampler:
    @pytest.fixture(scope="class")
    def setup(self):
        model = tiny_moldiff()
        params = model.init_params(jax.random.key(0))
        node_mask = jnp.ones((2, 6), jnp.float32)
        return model, params, node_mask

    def test_ddim_sample_finite(self, setup):
        model, params, node_mask = setup
        res = model.sample(
            params, node_mask, jax.random.key(1),
            pos_sampler="ddim", eta=0.0,
        )
        for x in (res.pred_node, res.pred_pos, res.pred_halfedge):
            assert np.isfinite(np.asarray(x)).all()

    @pytest.mark.slow
    def test_ddim_eta1_first_step_matches_ddpm(self, setup):
        """eta=1 equals DDPM exactly per step (TestDdimStep proves the
        formula); through the model, one reverse step from the same prior
        state must coincide to float tolerance. (Whole-chain comparison is
        deliberately NOT asserted: the per-step float-path difference is
        ~1e-7 but the denoiser between steps amplifies it chaotically.)"""
        model, params, node_mask = setup
        b, n = node_mask.shape
        key = jax.random.key(2)
        k_node, k_pos, k_edge, k_step = jax.random.split(key, 4)
        _, h_node, log_node = model.node_transition.sample_init((b, n), k_node)
        pos = model.pos_transition.sample_init((b, n, 3), k_pos)
        e = h_node.shape[1] * (h_node.shape[1] - 1) // 2
        _, h_edge, log_edge = model.edge_transition.sample_init((b, e), k_edge)
        t = jnp.full((b,), model.num_timesteps - 1, jnp.int32)
        preds = model.forward(params, h_node, pos, h_edge, t, node_mask)
        ddpm = model.pos_transition.get_prev_from_recon(
            pos, preds.pred_pos, t, k_step
        )
        ddim = model.pos_transition.ddim_prev(
            pos, preds.pred_pos, t, k_step, eta=1.0
        )
        np.testing.assert_allclose(
            np.asarray(ddpm), np.asarray(ddim), rtol=2e-4, atol=2e-5
        )

    @pytest.mark.slow
    def test_ddim_with_respacing(self, setup):
        model, params, node_mask = setup
        res = model.sample(
            params, node_mask, jax.random.key(3),
            pos_sampler="ddim", eta=0.0, num_steps=3,
        )
        assert np.isfinite(np.asarray(res.pred_pos)).all()

    def test_unknown_sampler_raises(self, setup):
        model, params, node_mask = setup
        with pytest.raises(ValueError, match="pos_sampler"):
            model.sample(
                params, node_mask, jax.random.key(4), pos_sampler="euler"
            )
