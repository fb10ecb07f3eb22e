"""FSDP (ZeRO-3-style 'data'-axis param/moment sharding,
parallel/mesh.py:fsdp_param_sharding) must be numerically transparent:
the FSDP train/eval steps reproduce the single-device results for
identical inputs, while params + optimizer state live sharded at rest.
The reference is single-device (SURVEY.md section 2.3); FSDP is a
framework addition for scale-out.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from moldiff_tpu.ops import graph_ops
from moldiff_tpu.parallel.mesh import (
    DATA_AXIS,
    fsdp_param_sharding,
    make_mesh,
    make_mesh_3d,
)
from moldiff_tpu.train.trainer import Trainer
from moldiff_tpu.utils.config import Config
from tests.test_pipeline import tiny_model


TRAIN_CFG = Config({
    "pos_noise_std": 0.0,
    "max_grad_norm": 50.0,
    "ema_decay": 0.99,
    "optimizer": {"type": "adamw", "lr": 1e-3, "weight_decay": 1e-8,
                  "beta1": 0.99, "beta2": 0.999},
    "scheduler": {"type": "plateau", "factor": 0.8, "patience": 10,
                  "min_lr": 1e-5},
})


def _batch(rng, b=8, n=8):
    e = graph_ops.num_halfedges(n)
    return {
        "node_type": rng.integers(0, 7, (b, n)).astype(np.int32),
        "pos": rng.normal(size=(b, n, 3)).astype(np.float32),
        "halfedge_type": rng.integers(0, 5, (b, e)).astype(np.int32),
        "node_mask": np.ones((b, n), np.float32),
    }


class TestFSDPParamSharding:
    def test_largest_divisible_dim_sharded(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(8)
        tree = {
            "w": jnp.zeros((16, 64)),   # largest divisible dim -> 64
            "b": jnp.zeros((64,)),
            "odd": jnp.zeros((3, 5)),   # nothing divisible -> replicated
            "scalar": jnp.zeros(()),
        }
        spec = fsdp_param_sharding(mesh, tree)
        assert spec["w"].spec == P(None, DATA_AXIS)
        assert spec["b"].spec == P(DATA_AXIS)
        assert spec["odd"].spec == P()
        assert spec["scalar"].spec == P()

    def test_model_params_mostly_sharded(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(8)
        params = tiny_model().init_params(jax.random.key(0))
        spec = fsdp_param_sharding(mesh, params)
        leaves = jax.tree.leaves(spec)
        n_sharded = sum(1 for s in leaves if s.spec and DATA_AXIS in s.spec)
        # the weight matrices (the memory) must shard; small odd-shaped
        # leaves may stay replicated
        assert n_sharded >= len(leaves) // 2, (n_sharded, len(leaves))

    def test_fsdp_exclusive_with_tp(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        with pytest.raises(ValueError, match="exclusive"):
            Trainer(tiny_model(), TRAIN_CFG, mesh=make_mesh_3d(2, 2, 2),
                    fsdp=True)


class TestFSDPTrainStep:
    @pytest.mark.slow
    def test_fsdp_matches_single_device(self):
        """One full train step (grad+clip+adamw+EMA) under FSDP must match
        the single-device step: same loss, same updated params."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        model = tiny_model()
        rng = np.random.default_rng(0)
        batch = _batch(rng)

        t1 = Trainer(model, TRAIN_CFG, mesh=make_mesh(1))
        s1 = t1.init_state(jax.random.key(0))
        s1, aux1 = t1.train_step(s1, batch, jax.random.key(1))

        t8 = Trainer(model, TRAIN_CFG, mesh=make_mesh(8), fsdp=True)
        assert t8.fsdp
        s8 = t8.init_state(jax.random.key(0))
        # params + adam moments + EMA start 'data'-sharded (not replicated)
        for tree in (s8.params, s8.opt_state, s8.ema_params):
            shardings = [x.sharding for x in jax.tree.leaves(tree)
                         if hasattr(x, "sharding")]
            assert any(
                s.spec and DATA_AXIS in s.spec for s in shardings
                if hasattr(s, "spec")
            ), "no leaf is data-sharded at rest"
        s8, aux8 = t8.train_step(s8, batch, jax.random.key(1))

        np.testing.assert_allclose(
            float(aux1["loss"]), float(aux8["loss"]), rtol=2e-5
        )
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )
        for a, b in zip(
            jax.tree.leaves(s1.ema_params), jax.tree.leaves(s8.ema_params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )

    def test_fsdp_eval_matches_single_device(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        model = tiny_model()
        rng = np.random.default_rng(1)
        batch = _batch(rng)

        t1 = Trainer(model, TRAIN_CFG, mesh=make_mesh(1))
        s1 = t1.init_state(jax.random.key(0))
        aux1 = t1.eval_step(s1.params, batch, jax.random.key(2))

        t8 = Trainer(model, TRAIN_CFG, mesh=make_mesh(8), fsdp=True)
        s8 = t8.init_state(jax.random.key(0))
        aux8 = t8.eval_step(s8.params, batch, jax.random.key(2))
        np.testing.assert_allclose(
            float(aux1["loss"]), float(aux8["loss"]), rtol=2e-5
        )

    @pytest.mark.slow
    def test_fsdp_resume_roundtrip(self, tmp_path):
        """Checkpoint saved from an FSDP run loads back sharded."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        model = tiny_model()
        rng = np.random.default_rng(2)
        batch = _batch(rng)
        t8 = Trainer(model, TRAIN_CFG, mesh=make_mesh(8), fsdp=True)
        s8 = t8.init_state(jax.random.key(0))
        s8, _ = t8.train_step(s8, batch, jax.random.key(1))
        path = str(tmp_path / "fsdp.ckpt")
        t8.save_checkpoint(path, s8, model_config=None)
        s_loaded = t8.load_checkpoint(path)
        assert int(s_loaded.step) == int(s8.step)
        shardings = [x.sharding for x in jax.tree.leaves(s_loaded.params)]
        assert any(
            s.spec and DATA_AXIS in s.spec for s in shardings
            if hasattr(s, "spec")
        )
        s9, aux9 = t8.train_step(s_loaded, batch, jax.random.key(3))
        assert np.isfinite(float(aux9["loss"]))
