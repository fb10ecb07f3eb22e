"""Tensor parallelism ('model' mesh axis): Megatron column/row sharding of
MLP hidden dims (parallel/mesh.py:tp_param_sharding) must be numerically
transparent — the TP-sharded train/eval steps reproduce the single-device
results for identical inputs. The reference is single-device (SURVEY.md
section 2.3); TP is a framework addition for scale-out.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from moldiff_tpu.ops import graph_ops
from moldiff_tpu.parallel.mesh import (
    MODEL_AXIS,
    make_mesh,
    make_mesh_3d,
    make_mesh_from_config,
    tp_enabled,
    tp_param_sharding,
)
from moldiff_tpu.train.trainer import Trainer
from moldiff_tpu.utils.config import Config
from tests.test_pipeline import tiny_model


TRAIN_CFG = Config({
    "pos_noise_std": 0.0,
    "max_grad_norm": 50.0,
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


class TestTPParamSharding:
    def test_mlp_leaves_sharded_rest_replicated(self):
        mesh = make_mesh_3d(2, 2, 2)
        model = tiny_model()
        params = model.init_params(jax.random.key(0))
        spec = tp_param_sharding(mesh, params)

        found_col = found_row = 0

        def check(path, leaf_spec_and_param):
            nonlocal found_col, found_row
            sharding, param = leaf_spec_and_param
            names = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
            if "layers" in names:
                i = names[names.index("layers") + 1]
                if names[-2:] == ["lin", "w"]:
                    ps = sharding.spec
                    if i == 0 and MODEL_AXIS in ps:
                        assert ps[-1] == MODEL_AXIS, (names, ps)
                        found_col += 1
                    elif i > 0 and MODEL_AXIS in ps:
                        assert ps[-2] == MODEL_AXIS, (names, ps)
                        found_row += 1

        jax.tree_util.tree_map_with_path(
            lambda p, s, w: check(p, (s, w)), spec, params
        )
        assert found_col > 0 and found_row > 0

    def test_indivisible_hidden_replicated(self):
        mesh = make_mesh_3d(2, 2, 2)
        # hidden dim 3 does not divide model axis 2 -> whole MLP replicated
        from moldiff_tpu.models.nn import init_mlp

        p = {"mlp": init_mlp(jax.random.key(0), 4, 4, 3)}
        spec = tp_param_sharding(mesh, p)
        for s in jax.tree.leaves(spec):
            assert s.spec == P()


class TestMeshFromConfig:
    def test_axis_carving(self):
        m = make_mesh_from_config({"num_devices": 8, "graph": 2, "model": 2})
        assert dict(zip(m.axis_names, m.devices.shape)) == {
            "data": 2, "graph": 2, "model": 2}
        m = make_mesh_from_config({"num_devices": 8, "graph": 2})
        assert m.axis_names == ("data", "graph")
        m = make_mesh_from_config({"num_devices": 4})
        assert m.axis_names == ("data",) and m.devices.size == 4
        m = make_mesh_from_config(None)
        assert m.devices.size == len(jax.devices())
        with pytest.raises(ValueError):
            make_mesh_from_config({"num_devices": 8, "graph": 3})


class TestTPTrainStep:
    @pytest.mark.slow
    def test_tp_matches_single_device(self):
        """One full train step (grad+clip+adamw) on the 3-D dp x graph x
        model mesh must match the single-device step: same loss, same
        updated params."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        model = tiny_model()
        rng = np.random.default_rng(0)
        batch = _batch(rng)

        t1 = Trainer(model, TRAIN_CFG, mesh=make_mesh(1))
        s1 = t1.init_state(jax.random.key(0))
        s1, aux1 = t1.train_step(s1, batch, jax.random.key(1))

        mesh = make_mesh_3d(2, 2, 2)
        assert tp_enabled(mesh)
        t8 = Trainer(model, TRAIN_CFG, mesh=mesh)
        assert t8.tp
        s8 = t8.init_state(jax.random.key(0))
        # params start TP-sharded (not replicated)
        shardings = jax.tree.map(lambda x: x.sharding, s8.params)
        assert any(
            MODEL_AXIS in s.spec for s in jax.tree.leaves(shardings)
            if hasattr(s, "spec") and s.spec
        ), "no parameter leaf is model-sharded"
        s8, aux8 = t8.train_step(s8, batch, jax.random.key(1))

        np.testing.assert_allclose(
            float(aux1["loss"]), float(aux8["loss"]), rtol=2e-5
        )
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )

    def test_tp_eval_matches_single_device(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        model = tiny_model()
        rng = np.random.default_rng(1)
        batch = _batch(rng)

        t1 = Trainer(model, TRAIN_CFG, mesh=make_mesh(1))
        s1 = t1.init_state(jax.random.key(0))
        aux1 = t1.eval_step(s1.params, batch, jax.random.key(2))

        t8 = Trainer(model, TRAIN_CFG, mesh=make_mesh_3d(2, 2, 2))
        s8 = t8.init_state(jax.random.key(0))
        aux8 = t8.eval_step(s8.params, batch, jax.random.key(2))
        np.testing.assert_allclose(
            float(aux1["loss"]), float(aux8["loss"]), rtol=2e-5
        )

    @pytest.mark.slow
    def test_tp_resume_roundtrip(self, tmp_path):
        """Checkpoint saved from a TP run loads back onto the TP mesh."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        model = tiny_model()
        rng = np.random.default_rng(2)
        batch = _batch(rng)
        t8 = Trainer(model, TRAIN_CFG, mesh=make_mesh_3d(2, 2, 2))
        s8 = t8.init_state(jax.random.key(0))
        s8, _ = t8.train_step(s8, batch, jax.random.key(1))
        path = str(tmp_path / "tp.ckpt")
        t8.save_checkpoint(path, s8, model_config=None)
        s_loaded = t8.load_checkpoint(path)
        assert int(s_loaded.step) == int(s8.step)
        s9, aux9 = t8.train_step(s_loaded, batch, jax.random.key(3))
        assert np.isfinite(float(aux9["loss"]))
