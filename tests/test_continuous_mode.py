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
