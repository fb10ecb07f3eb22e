"""Pipeline parallelism ('pipe' mesh axis): the GPipe executor over the
denoiser's stacked blocks (parallel/pipeline.py) must be numerically
transparent — identical outputs/gradients to the sequential lax.scan, and
the full TP-free train step on a ('data','pipe') mesh must reproduce the
single-device step. The reference is single-device (SURVEY.md section 2.3);
PP is a framework addition for scale-out.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from moldiff_tpu.models.denoiser import init_node_edge_net, node_edge_net
from moldiff_tpu.models.moldiff import MolDiff
from moldiff_tpu.ops import graph_ops
from moldiff_tpu.parallel.mesh import make_mesh, make_mesh_from_config
from moldiff_tpu.parallel.pipeline import (
    PIPE_AXIS,
    make_mesh_pipe,
    pipe_enabled,
    pipe_param_sharding,
    pipeline_denoiser,
)
from moldiff_tpu.train.trainer import Trainer
from moldiff_tpu.utils.config import Config


def _denoiser_inputs(rng, b=8, n=6, node_dim=32, edge_dim=16):
    h_node = rng.normal(size=(b, n, node_dim)).astype(np.float32)
    pos = rng.normal(size=(b, n, 3)).astype(np.float32)
    h_edge = rng.normal(size=(b, n, n, edge_dim)).astype(np.float32)
    t = np.full((b, 1, 1), 0.3, np.float32)
    node_mask = (rng.random((b, n)) > 0.2).astype(np.float32)
    pm = (node_mask[:, :, None] * node_mask[:, None, :]
          * (1.0 - np.eye(n, dtype=np.float32)))
    return tuple(map(jnp.asarray, (h_node, pos, h_edge, t, t, pm)))


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")


class TestPipelineDenoiser:
    def test_forward_matches_sequential(self):
        _need_devices(8)
        params, static = init_node_edge_net(
            jax.random.key(0), 32, 16, num_blocks=4, cutoff=10.0, use_gate=True
        )
        inputs = _denoiser_inputs(np.random.default_rng(0))
        ref = node_edge_net(params, static, *inputs, remat=False)
        mesh = make_mesh_pipe(2, 4)
        for n_micro in (None, 1, 4):
            out = pipeline_denoiser(
                params, static, *inputs, mesh=mesh,
                num_microbatches=n_micro, remat=False,
            )
            for a, b in zip(ref, out):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
                )

    def test_forward_matches_update_pos_false(self):
        """Frozen-position encoder config (the bond predictor's setting)."""
        _need_devices(8)
        params, static = init_node_edge_net(
            jax.random.key(1), 32, 16, num_blocks=4, cutoff=10.0,
            use_gate=True, update_pos=False,
        )
        inputs = _denoiser_inputs(np.random.default_rng(1))
        ref = node_edge_net(params, static, *inputs, remat=False)
        out = pipeline_denoiser(
            params, static, *inputs, mesh=make_mesh_pipe(2, 4), remat=False
        )
        for a, b in zip(ref, out):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
            )

    def test_grads_match_and_are_pipe_sharded(self):
        _need_devices(8)
        params, static = init_node_edge_net(
            jax.random.key(2), 32, 16, num_blocks=4, cutoff=10.0, use_gate=True
        )
        inputs = _denoiser_inputs(np.random.default_rng(2))
        mesh = make_mesh_pipe(2, 4)

        def loss_seq(p):
            return sum(jnp.sum(x) for x in
                       node_edge_net(p, static, *inputs, remat=True))

        def loss_pp(p):
            return sum(jnp.sum(x) for x in pipeline_denoiser(
                p, static, *inputs, mesh=mesh, remat=True))

        g_seq = jax.grad(loss_seq)(params)
        g_pp = jax.jit(jax.grad(loss_pp))(params)
        for a, b in zip(jax.tree.leaves(g_seq), jax.tree.leaves(g_pp)):
            scale = max(1e-6, float(jnp.max(jnp.abs(a))))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=3e-5
            )
        # block-param grads come out sharded over 'pipe' (per-stage memory)
        specs = jax.tree.leaves(
            jax.tree.map(lambda x: x.sharding.spec, g_pp["blocks"])
        )
        assert all(PIPE_AXIS in s for s in specs), specs


class TestPipeParamSharding:
    def test_blocks_sharded_rest_replicated(self):
        _need_devices(8)
        mesh = make_mesh_pipe(2, 4)
        tree = {
            "denoiser": {"blocks": {"w": jnp.zeros((4, 3, 5))}},
            "decoder": {"w": jnp.zeros((3, 5))},
        }
        spec = pipe_param_sharding(mesh, tree)
        assert spec["denoiser"]["blocks"]["w"].spec == P(PIPE_AXIS)
        assert spec["decoder"]["w"].spec == P()

    def test_indivisible_blocks_replicated(self):
        _need_devices(8)
        mesh = make_mesh_pipe(2, 4)
        spec = pipe_param_sharding(mesh, {"blocks": {"w": jnp.zeros((3, 2))}})
        assert spec["blocks"]["w"].spec == P()


class TestMeshFromConfig:
    def test_pipe_carving(self):
        _need_devices(8)
        m = make_mesh_from_config({"num_devices": 8, "pipe": 4})
        assert dict(zip(m.axis_names, m.devices.shape)) == {"data": 2, "pipe": 4}
        assert pipe_enabled(m)
        with pytest.raises(ValueError):
            make_mesh_from_config({"num_devices": 8, "pipe": 2, "model": 2})


TRAIN_CFG = Config({
    "pos_noise_std": 0.0,
    "max_grad_norm": 50.0,
    "optimizer": {"type": "adamw", "lr": 1e-3, "weight_decay": 1e-8,
                  "beta1": 0.99, "beta2": 0.999},
    "scheduler": {"type": "plateau", "factor": 0.8, "patience": 10,
                  "min_lr": 1e-5},
})


def tiny_model_4blocks():
    cfg = Config({
        "node_dim": 16,
        "edge_dim": 8,
        "denoiser": {"num_blocks": 4, "cutoff": 10, "use_gate": True},
        "diff": {
            "num_timesteps": 8,
            "time_dim": 4,
            "categorical_space": "discrete",
            "diff_pos": {"beta_schedule": "advance", "scale_start": 0.9999,
                         "scale_end": 0.0001, "width": 3},
            "diff_atom": {"init_prob": "tomask", "beta_schedule": "advance",
                          "scale_start": 0.9999, "scale_end": 0.0001, "width": 3},
            "diff_bond": {"init_prob": "absorb", "beta_schedule": "advance",
                          "scale_start": 0.9999, "scale_end": 0.0001, "width": 3},
        },
    })
    return MolDiff(cfg, 8, 6)


def _batch(rng, b=8, n=8):
    e = graph_ops.num_halfedges(n)
    return {
        "node_type": rng.integers(0, 7, (b, n)).astype(np.int32),
        "pos": rng.normal(size=(b, n, 3)).astype(np.float32),
        "halfedge_type": rng.integers(0, 5, (b, e)).astype(np.int32),
        "node_mask": np.ones((b, n), np.float32),
    }


class TestPPTrainStep:
    @pytest.mark.slow
    def test_pp_matches_single_device(self):
        """Full train step (grad+clip+adamw) with the denoiser running as a
        GPipe pipeline over a ('data','pipe') mesh must match the
        single-device step: same loss, same updated params."""
        _need_devices(8)
        rng = np.random.default_rng(0)
        batch = _batch(rng)

        t1 = Trainer(tiny_model_4blocks(), TRAIN_CFG, mesh=make_mesh(1))
        s1 = t1.init_state(jax.random.key(0))
        s1, aux1 = t1.train_step(s1, batch, jax.random.key(1))

        mesh = make_mesh_pipe(2, 4)
        t8 = Trainer(tiny_model_4blocks(), TRAIN_CFG, mesh=mesh)
        assert t8.pp and t8.model.pipeline_cfg is not None
        s8 = t8.init_state(jax.random.key(0))
        # stacked block params start pipe-sharded (not replicated)
        specs = jax.tree.leaves(jax.tree.map(
            lambda x: x.sharding.spec, s8.params["denoiser"]["blocks"]))
        assert all(PIPE_AXIS in s for s in specs)
        s8, aux8 = t8.train_step(s8, batch, jax.random.key(1))

        np.testing.assert_allclose(
            float(aux1["loss"]), float(aux8["loss"]), rtol=2e-5
        )
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )

    @pytest.mark.slow
    def test_pp_resume_roundtrip(self, tmp_path):
        """Checkpoint saved from a PP run loads back onto the pipe mesh."""
        _need_devices(8)
        rng = np.random.default_rng(2)
        batch = _batch(rng)
        t8 = Trainer(tiny_model_4blocks(), TRAIN_CFG, mesh=make_mesh_pipe(2, 4))
        s8 = t8.init_state(jax.random.key(0))
        s8, _ = t8.train_step(s8, batch, jax.random.key(1))
        path = str(tmp_path / "pp.ckpt")
        t8.save_checkpoint(path, s8, model_config=None)
        s_loaded = t8.load_checkpoint(path)
        assert int(s_loaded.step) == int(s8.step)
        s9, aux9 = t8.train_step(s_loaded, batch, jax.random.key(3))
        assert np.isfinite(float(aux9["loss"]))
