"""Mixture-of-Experts node MLP (models/moe.py) + expert parallelism
('expert' mesh axis, parallel/mesh.py:ep_param_sharding).

The reference network is dense (no MoE in /root/reference); MoE/EP are
framework additions for scale-out, off by default. Contracts tested here:

  * routed output == manual per-token expert evaluation (top-1 and top-2);
  * padded atoms never consume expert capacity (padding invariance);
  * over-capacity tokens are dropped to zero (residual carries them);
  * Switch load-balance aux == 1.0 under a uniform router;
  * EP-sharded train step == single-device step numerically.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from moldiff_tpu.models.moe import init_moe_mlp, moe_mlp, normalize_moe_cfg
from moldiff_tpu.models.nn import mlp
from moldiff_tpu.models.moldiff import MolDiff
from moldiff_tpu.ops import graph_ops
from moldiff_tpu.parallel.mesh import (
    EXPERT_AXIS,
    ep_param_sharding,
    make_mesh,
    make_mesh_expert,
    make_mesh_from_config,
)
from moldiff_tpu.train.trainer import Trainer
from moldiff_tpu.utils.config import Config
from tests.test_pipeline import tiny_model


def _cfg(**kw):
    base = {"num_experts": 4, "top_k": 1, "capacity_factor": 8.0,
            "aux_weight": 0.01}
    base.update(kw)
    return normalize_moe_cfg(base)


def _moe_model(**moe_kw):
    model = tiny_model()
    cfg = dict(model._denoiser_cfg)
    cfg["moe"] = {"num_experts": 4, "top_k": 1, "capacity_factor": 4.0,
                  **moe_kw}
    from moldiff_tpu.utils.config import Config as C

    mcfg = {"name": "diffusion", "node_dim": model.node_dim,
            "edge_dim": model.edge_dim, "denoiser": cfg,
            "diff": model.config["diff"]}
    return MolDiff(C(mcfg), model.num_node_types, model.num_edge_types)


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


class TestMoEMLP:
    def test_top1_matches_manual_expert_eval(self):
        cfg = _cfg(top_k=1)
        p = init_moe_mlp(jax.random.key(0), 6, 5, 8, cfg["num_experts"])
        x = jax.random.normal(jax.random.key(1), (2, 7, 6))
        mask = jnp.ones((2, 7))
        y, aux = moe_mlp(p, x, mask, cfg)

        logits = x.reshape(-1, 6) @ p["router"]["w"]
        probs = jax.nn.softmax(logits, -1)
        idx = jnp.argmax(probs, -1)
        gate = jnp.max(probs, -1)
        expect = jnp.stack([
            gate[s] * mlp(jax.tree.map(lambda a: a[idx[s]], p["experts"]),
                          x.reshape(-1, 6)[s])
            for s in range(14)
        ]).reshape(2, 7, 5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(expect),
                                   rtol=1e-5, atol=1e-6)
        assert np.isfinite(float(aux))

    def test_top2_matches_manual_mix(self):
        cfg = _cfg(top_k=2)
        p = init_moe_mlp(jax.random.key(2), 6, 5, 8, cfg["num_experts"])
        x = jax.random.normal(jax.random.key(3), (1, 9, 6))
        y, _ = moe_mlp(p, x, jnp.ones((1, 9)), cfg)

        logits = x.reshape(-1, 6) @ p["router"]["w"]
        probs = jax.nn.softmax(logits, -1)
        order = jnp.argsort(probs, -1)[:, ::-1]
        rows = []
        for s in range(9):
            e1, e2 = int(order[s, 0]), int(order[s, 1])
            g1, g2 = float(probs[s, e1]), float(probs[s, e2])
            y1 = mlp(jax.tree.map(lambda a: a[e1], p["experts"]),
                     x.reshape(-1, 6)[s])
            y2 = mlp(jax.tree.map(lambda a: a[e2], p["experts"]),
                     x.reshape(-1, 6)[s])
            rows.append((g1 * y1 + g2 * y2) / (g1 + g2))
        expect = jnp.stack(rows).reshape(1, 9, 5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(expect),
                                   rtol=1e-4, atol=1e-5)

    def test_padding_invariance(self):
        """Extra masked atoms must not change real outputs: padded tokens
        get zero gate/dispatch and never consume expert capacity."""
        cfg = _cfg(top_k=2, capacity_factor=8.0)
        p = init_moe_mlp(jax.random.key(4), 6, 5, 8, cfg["num_experts"])
        x = jax.random.normal(jax.random.key(5), (3, 5, 6))
        y_small, _ = moe_mlp(p, x, jnp.ones((3, 5)), cfg)

        x_pad = jnp.concatenate(
            [x, jax.random.normal(jax.random.key(6), (3, 4, 6))], axis=1
        )
        mask_pad = jnp.concatenate(
            [jnp.ones((3, 5)), jnp.zeros((3, 4))], axis=1
        )
        y_pad, _ = moe_mlp(p, x_pad, mask_pad, cfg)
        np.testing.assert_allclose(
            np.asarray(y_pad[:, :5]), np.asarray(y_small),
            rtol=1e-5, atol=1e-6,
        )
        # padded rows produce exactly zero delta
        assert float(jnp.abs(y_pad[:, 5:]).max()) == 0.0

    def test_capacity_dropping(self):
        """capacity_factor small enough that an expert overflows: dropped
        tokens yield an exactly-zero delta, kept tokens match the
        ample-capacity result."""
        p = init_moe_mlp(jax.random.key(7), 6, 5, 8, 2)
        # zero router -> uniform probs -> argmax ties resolve to expert 0,
        # so every token routes there deterministically
        p["router"]["w"] = jnp.zeros_like(p["router"]["w"])
        x = jax.random.normal(jax.random.key(8), (1, 8, 6))
        mask = jnp.ones((1, 8))
        ample, _ = moe_mlp(p, x, mask, _cfg(num_experts=2, capacity_factor=8.0))
        # capacity = ceil(0.25 * 1 * 8 / 2) = 1 -> only the first token kept
        tight, _ = moe_mlp(p, x, mask, _cfg(num_experts=2, capacity_factor=0.25))
        np.testing.assert_allclose(
            np.asarray(tight[0, 0]), np.asarray(ample[0, 0]),
            rtol=1e-5, atol=1e-6,
        )
        assert float(jnp.abs(tight[0, 1:]).max()) == 0.0

    def test_uniform_router_aux_is_one(self):
        cfg = _cfg(num_experts=4)
        p = init_moe_mlp(jax.random.key(9), 6, 5, 8, 4)
        p["router"]["w"] = jnp.zeros_like(p["router"]["w"])
        x = jax.random.normal(jax.random.key(10), (2, 8, 6))
        _, aux = moe_mlp(p, x, jnp.ones((2, 8)), cfg)
        # uniform probs: P_e = 1/E, aux = E * sum_e f_e / E = sum_e f_e = 1
        np.testing.assert_allclose(float(aux), 1.0, rtol=1e-5)

    def test_cfg_validation(self):
        with pytest.raises(ValueError):
            normalize_moe_cfg({"num_experts": 4, "top_k": 3})
        with pytest.raises(ValueError):
            normalize_moe_cfg({"num_experts": 1})
        assert normalize_moe_cfg(None) is None
        assert normalize_moe_cfg({})  is None


class TestMoEModel:
    def test_loss_includes_aux_and_grads_flow(self):
        model = _moe_model(top_k=2)
        params = model.init_params(jax.random.key(0))
        rng = np.random.default_rng(0)
        b = _batch(rng, b=4)

        def loss_fn(p):
            return model.get_loss(
                p, b["node_type"], b["pos"], b["halfedge_type"],
                b["node_mask"], jax.random.key(1),
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        assert np.isfinite(float(loss))
        assert "loss_moe" in aux and float(aux["loss_moe"]) > 0
        nb = grads["denoiser"]["blocks"]["node_block"]["node_net"]
        assert bool(jnp.any(nb["router"]["w"] != 0))
        assert bool(jnp.any(
            nb["experts"]["layers"][0]["lin"]["w"] != 0
        ))

    def test_sampler_runs_with_moe(self):
        model = _moe_model()
        params = model.init_params(jax.random.key(0))
        res = model.sample(params, jnp.ones((2, 8), jnp.float32),
                           jax.random.key(1))
        assert np.isfinite(np.asarray(res.pred_pos)).all()

    def test_moe_exclusive_with_pipeline(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from moldiff_tpu.parallel.pipeline import make_mesh_pipe

        model = _moe_model()
        model.pipeline_cfg = (make_mesh_pipe(4, 2), None)
        params = model.init_params(jax.random.key(0))
        rng = np.random.default_rng(1)
        b = _batch(rng, b=4)
        with pytest.raises(ValueError, match="MoE"):
            model.get_loss(
                params, b["node_type"], b["pos"], b["halfedge_type"],
                b["node_mask"], jax.random.key(1),
            )


class TestExpertParallel:
    def test_ep_param_sharding_spec(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh_expert(4, 2)
        model = _moe_model()
        params = model.init_params(jax.random.key(0))
        spec = ep_param_sharding(mesh, params)
        nb = spec["denoiser"]["blocks"]["node_block"]["node_net"]
        # stacked expert leaves [num_blocks, E, ...] shard dim 1
        w = nb["experts"]["layers"][0]["lin"]["w"]
        assert w.spec == P(None, EXPERT_AXIS, None, None), w.spec
        assert nb["router"]["w"].spec == P()
        # dense (non-MoE) leaves replicated
        assert spec["node_decoder"]["layers"][0]["lin"]["w"].spec == P()

    def test_mesh_from_config_expert(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        m = make_mesh_from_config({"num_devices": 8, "expert": 2})
        assert dict(zip(m.axis_names, m.devices.shape)) == {
            "data": 4, "expert": 2}
        with pytest.raises(ValueError, match="exclusive"):
            make_mesh_from_config({"num_devices": 8, "expert": 2, "pipe": 2})

    @pytest.mark.slow
    def test_ep_matches_single_device(self):
        """One full MoE train step on the ('data','expert') mesh must match
        the single-device step: same loss, same updated params."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        rng = np.random.default_rng(0)
        batch = _batch(rng)

        m1 = _moe_model()
        t1 = Trainer(m1, TRAIN_CFG, mesh=make_mesh(1))
        s1 = t1.init_state(jax.random.key(0))
        s1, aux1 = t1.train_step(s1, batch, jax.random.key(1))

        m8 = _moe_model()
        mesh = make_mesh_expert(4, 2)
        t8 = Trainer(m8, TRAIN_CFG, mesh=mesh)
        assert t8.ep
        s8 = t8.init_state(jax.random.key(0))
        # expert banks start 'expert'-sharded at rest
        nb = s8.params["denoiser"]["blocks"]["node_block"]["node_net"]
        w = nb["experts"]["layers"][0]["lin"]["w"]
        assert EXPERT_AXIS in w.sharding.spec, w.sharding
        s8, aux8 = t8.train_step(s8, batch, jax.random.key(1))

        np.testing.assert_allclose(
            float(aux1["loss"]), float(aux8["loss"]), rtol=2e-5
        )
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )
