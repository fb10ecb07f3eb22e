"""Continuous categorical-space mode: Gaussian diffusion on scaled one-hots
(reference model.py:75-95, 186-189, 301-306)."""
import jax
import numpy as np
import pytest

from moldiff_tpu.models.moldiff import MolDiff
from moldiff_tpu.ops import graph_ops
from moldiff_tpu.utils.config import Config


def cont_config():
    return Config({
        "node_dim": 16,
        "edge_dim": 8,
        "denoiser": {"num_blocks": 1, "cutoff": 10, "use_gate": True},
        "diff": {
            "num_timesteps": 8,
            "time_dim": 4,
            "categorical_space": "continuous",
            "scaling": [1.0, 4.0, 8.0],
            "diff_pos": {"beta_schedule": "advance", "scale_start": 0.9999,
                         "scale_end": 0.0001, "width": 3},
            "diff_atom": {"beta_schedule": "advance", "scale_start": 0.9999,
                          "scale_end": 0.0001, "width": 3},
            "diff_bond": {"beta_schedule": "advance", "scale_start": 0.9999,
                          "scale_end": 0.0001, "width": 3},
        },
    })


class TestContinuousMode:
    def test_loss_and_grads(self, rng):
        model = MolDiff(cont_config(), 8, 6)
        params = model.init_params(jax.random.key(0))
        b, n = 3, 6
        e = graph_ops.num_halfedges(n)
        node_type = rng.integers(0, 7, (b, n)).astype(np.int32)
        pos = rng.normal(size=(b, n, 3)).astype(np.float32)
        he = rng.integers(0, 5, (b, e)).astype(np.int32)
        mask = np.ones((b, n), np.float32)

        def loss_fn(p):
            l, aux = model.get_loss(p, node_type, pos, he, mask, jax.random.key(1))
            return l

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        for g in jax.tree.leaves(grads):
            assert np.isfinite(np.asarray(g)).all()

    def test_sample_decodes(self):
        model = MolDiff(cont_config(), 8, 6)
        params = model.init_params(jax.random.key(0))
        node_mask = np.ones((2, 6), np.float32)
        res = model.sample(params, node_mask, jax.random.key(2))
        assert res.pred_node.shape == (2, 6, 8)
        assert np.isfinite(np.asarray(res.pred_pos)).all()

    def test_add_noise_t0_near_onehot(self):
        """At t=0 the perturbed one-hots should stay close to x0/scaling."""
        model = MolDiff(cont_config(), 8, 6)
        tr = model.node_transition
        import jax.numpy as jnp

        v = jnp.zeros((1, 5), jnp.int32)
        pert, x0 = tr.add_noise(v, jnp.zeros((1,), jnp.int32), jax.random.key(3))
        assert x0[0, 0, 0] == pytest.approx(1 / 4.0)
        np.testing.assert_allclose(np.asarray(pert), np.asarray(x0), atol=0.15)

    def test_sample_with_traj(self):
        model = MolDiff(cont_config(), 8, 6)
        params = model.init_params(jax.random.key(0))
        node_mask = np.ones((1, 5), np.float32)
        res = model.sample(params, node_mask, jax.random.key(4), save_traj=True)
        assert res.traj[1].shape[0] == model.num_timesteps + 1


def test_golden_vs_reference_continuous(reference_modules, rng):
    """Continuous-categorical add_noise must match the reference
    ContigousTransition(betas, num_classes, scaling) (transition.py:9-41)."""
    import torch

    from moldiff_tpu.ops.gaussian import GaussianTransition
    from moldiff_tpu.ops.schedules import get_beta_schedule

    _, transition = reference_modules
    T, K, scaling = 12, 5, 4.0
    betas = get_beta_schedule("advance", T, scale_start=0.9999,
                              scale_end=0.0001, width=3)
    ours = GaussianTransition(betas, num_classes=K, scaling=scaling)
    ref = transition.ContigousTransition(np.asarray(betas), K, scaling)

    v = rng.integers(0, K, size=(7,))
    t = rng.integers(0, T, size=(1,))
    # compare the deterministic part: x0 scaling and the mean coefficient
    import jax
    import jax.numpy as jnp

    pert_ours, x0_ours = ours.add_noise(
        jnp.asarray(v)[None], jnp.asarray(t, dtype=jnp.int32),
        jax.random.key(0),
    )
    with torch.no_grad():
        pert_ref, x0_ref = ref.add_noise(
            torch.from_numpy(v), torch.from_numpy(np.repeat(t, 1)).long(),
            torch.zeros(7, dtype=torch.long),
        )
    np.testing.assert_allclose(np.asarray(x0_ours[0]), x0_ref.numpy(),
                               rtol=1e-6)
    # same a_bar scaling: E[pert] = sqrt(a_bar) x0 — compare the
    # deterministic mean by subtracting the noise terms is not possible
    # across RNGs; instead check posterior coefficients match
    np.testing.assert_allclose(np.asarray(ours.coef_x0),
                               ref.coef_x0.numpy().ravel(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.coef_xt),
                               ref.coef_xt.numpy().ravel(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.std),
                               ref.std.numpy().ravel(), rtol=1e-5)
