"""Train infra tests: optimizer/scheduler behavior, jitted DP train step on a
virtual 8-device mesh, checkpoint round-trip, loss decrease on a tiny fit."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moldiff_tpu.models.moldiff import MolDiff
from moldiff_tpu.ops import graph_ops
from moldiff_tpu.parallel.mesh import make_mesh
from moldiff_tpu.train.optim import (
    ExpMinScheduler,
    PlateauScheduler,
    get_lr,
    get_optimizer,
    set_lr,
)
from moldiff_tpu.train.trainer import Trainer, load_checkpoint
from moldiff_tpu.utils.config import Config


def tiny_model_config():
    return Config(
        {
            "node_dim": 16,
            "edge_dim": 8,
            "denoiser": {"num_blocks": 1, "cutoff": 10, "use_gate": True},
            "diff": {
                "num_timesteps": 20,
                "time_dim": 4,
                "categorical_space": "discrete",
                "diff_pos": {"beta_schedule": "advance", "scale_start": 0.9999,
                             "scale_end": 0.0001, "width": 3},
                "diff_atom": {"init_prob": "tomask", "beta_schedule": "advance",
                              "scale_start": 0.9999, "scale_end": 0.0001, "width": 3},
                "diff_bond": {"init_prob": "absorb", "beta_schedule": "advance",
                              "scale_start": 0.9999, "scale_end": 0.0001, "width": 3},
            },
        }
    )


def train_config():
    return Config(
        {
            "pos_noise_std": 0.0,
            "max_grad_norm": 50.0,
            "optimizer": {"type": "adamw", "lr": 1e-3, "weight_decay": 1e-8,
                          "beta1": 0.99, "beta2": 0.999},
            "scheduler": {"type": "plateau", "factor": 0.5, "patience": 2,
                          "min_lr": 1e-5},
        }
    )


def make_batch(rng, b=8, n=6, kn=8, ke=6):
    e = graph_ops.num_halfedges(n)
    n_nodes = rng.integers(3, n + 1, size=b)
    node_mask = (np.arange(n)[None] < n_nodes[:, None]).astype(np.float32)
    return {
        "node_type": rng.integers(0, kn - 1, (b, n)).astype(np.int32),
        "pos": rng.normal(size=(b, n, 3)).astype(np.float32),
        "halfedge_type": rng.integers(0, ke - 1, (b, e)).astype(np.int32),
        "node_mask": node_mask,
    }


class TestOptim:
    def test_lr_injection(self):
        opt = get_optimizer({"type": "adamw", "lr": 1e-3, "max_grad_norm": 1.0})
        params = {"w": jnp.ones((3,))}
        st = opt.init(params)
        assert get_lr(st) == pytest.approx(1e-3)
        set_lr(st, 5e-4)
        assert get_lr(st) == pytest.approx(5e-4)
        # updates still work after injection
        g = {"w": jnp.ones((3,))}
        upd, st2 = opt.update(g, st, params)
        assert jnp.all(jnp.isfinite(upd["w"]))

    def test_grad_clip(self):
        opt = get_optimizer({"type": "adam", "lr": 1.0, "max_grad_norm": 1.0})
        params = {"w": jnp.zeros((4,))}
        st = opt.init(params)
        g = {"w": 1e6 * jnp.ones((4,))}
        upd, _ = opt.update(g, st, params)
        # adam normalizes; just check finite + correct sign
        assert jnp.all(jnp.isfinite(upd["w"]))
        assert jnp.all(upd["w"] < 0)

    def test_plateau(self):
        s = PlateauScheduler(factor=0.5, patience=2, min_lr=0.1)
        lr = 1.0
        lr = s.step(1.0, lr)   # improves (best=inf -> 1.0)
        assert lr == 1.0
        for _ in range(2):
            lr = s.step(2.0, lr)  # bad x2 == patience, not yet > patience
        assert lr == 1.0
        lr = s.step(2.0, lr)      # 3rd bad > patience -> decay
        assert lr == 0.5
        for _ in range(20):
            lr = s.step(2.0, lr)
        assert lr == pytest.approx(0.1)  # floored

    def test_expmin(self):
        s = ExpMinScheduler(factor=0.5, min_lr=0.2, milestone=2)
        lr = 1.0
        lr = s.step(0, lr)  # epoch 1 < milestone
        assert lr == 1.0
        lr = s.step(0, lr)  # epoch 2 >= milestone
        assert lr == 0.5


class TestTrainer:
    @pytest.fixture(scope="class")
    def trainer(self):
        model = MolDiff(tiny_model_config(), 8, 6)
        mesh = make_mesh(len(jax.devices()))
        return Trainer(model, train_config(), mesh=mesh)

    def test_dp_step_and_loss_decreases(self, trainer, rng):
        state = trainer.init_state(jax.random.key(0))
        batch = make_batch(rng)
        # eval with a FIXED key so the sampled timesteps/noise are identical
        # before and after training (per-step losses vary hugely with t).
        eval_key = jax.random.key(123)
        loss_before = float(trainer.eval_step(state.params, batch, eval_key)["loss"])
        for i in range(30):
            state, aux = trainer.train_step(state, batch, jax.random.key(i))
            assert np.isfinite(float(aux["loss"]))
        loss_after = float(trainer.eval_step(state.params, batch, eval_key)["loss"])
        assert loss_after < loss_before, (loss_before, loss_after)

    def test_dp_matches_single_device(self, rng):
        """The 8-device sharded step must equal the 1-device step bitwise-ish."""
        model = MolDiff(tiny_model_config(), 8, 6)
        batch = make_batch(rng)
        results = []
        for nd in (1, len(jax.devices())):
            tr = Trainer(model, train_config(), mesh=make_mesh(nd))
            st = tr.init_state(jax.random.key(0))
            st, aux = tr.train_step(st, batch, jax.random.key(1))
            results.append((float(aux["loss"]), jax.device_get(st.params)))
        assert results[0][0] == pytest.approx(results[1][0], rel=1e-5)
        flat0 = jax.tree.leaves(results[0][1])
        flat1 = jax.tree.leaves(results[1][1])
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    @pytest.mark.slow
    def test_remat_policies_same_grads(self, rng):
        """remat_policy (none/dots/off) is a memory-speed knob only: one
        train step from the same init must produce identical params to
        float tolerance for every policy."""
        batch = make_batch(rng)
        results = []
        for policy in ("none", "dots", "off"):
            cfg = tiny_model_config()
            if policy == "off":
                cfg["denoiser"]["remat"] = False
            else:
                cfg["denoiser"]["remat_policy"] = policy
            model = MolDiff(cfg, 8, 6)
            tr = Trainer(model, train_config(), mesh=make_mesh(1))
            st = tr.init_state(jax.random.key(0))
            st, aux = tr.train_step(st, batch, jax.random.key(1))
            results.append((policy, float(aux["loss"]),
                            jax.device_get(st.params)))
        base = results[0]
        for policy, loss, params in results[1:]:
            assert loss == pytest.approx(base[1], rel=1e-5), policy
            for a, b in zip(jax.tree.leaves(base[2]), jax.tree.leaves(params)):
                np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6,
                                           err_msg=policy)

    def test_ema_tracks_params(self, rng):
        """train.ema_decay keeps an exponential average of params that (a)
        lags the live params, (b) moves toward them, (c) survives the
        checkpoint round-trip, (d) stays None when disabled."""
        cfg = train_config()
        cfg["ema_decay"] = 0.5
        model = MolDiff(tiny_model_config(), 8, 6)
        tr = Trainer(model, cfg, mesh=make_mesh(1))
        st = tr.init_state(jax.random.key(0))
        assert st.ema_params is not None
        batch = make_batch(rng)
        p0 = jax.device_get(st.params)
        for i in range(3):
            st, _ = tr.train_step(st, batch, jax.random.key(i))
        params, ema = jax.device_get(st.params), jax.device_get(st.ema_params)
        lp, le, l0 = (jax.tree.leaves(t) for t in (params, ema, p0))
        moved = sum(float(np.abs(a - b).sum()) for a, b in zip(le, l0))
        lag = sum(float(np.abs(a - b).sum()) for a, b in zip(le, lp))
        assert moved > 0 and lag > 0  # ema moved but lags live params
        # ema is between the init and live params elementwise on average
        d_live = sum(float(np.abs(a - b).sum()) for a, b in zip(lp, l0))
        assert moved < d_live

        import tempfile

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "e.ckpt")
            tr.save_checkpoint(path, st, model_config=tiny_model_config())
            blob = load_checkpoint(path)
            assert blob["ema_params"] is not None
            st2 = tr.load_checkpoint(path)
            for a, b in zip(jax.tree.leaves(jax.device_get(st2.ema_params)),
                            le):
                np.testing.assert_allclose(a, b, rtol=1e-6)
            # a non-EMA trainer drops it
            tr0 = Trainer(model, train_config(), mesh=make_mesh(1))
            assert tr0.load_checkpoint(path).ema_params is None

    def test_checkpoint_roundtrip(self, trainer, rng, tmp_path):
        state = trainer.init_state(jax.random.key(0))
        batch = make_batch(rng)
        state, _ = trainer.train_step(state, batch, jax.random.key(1))
        path = str(tmp_path / "ckpt.pkl")
        trainer.save_checkpoint(path, state, model_config=tiny_model_config(),
                                key=jax.random.key(2))
        restored = trainer.load_checkpoint(path)
        assert int(restored.step) == int(state.step)
        for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                        jax.tree.leaves(jax.device_get(restored.params))):
            np.testing.assert_array_equal(a, b)
        # training continues from the restored state
        restored, aux = trainer.train_step(restored, batch, jax.random.key(3))
        assert np.isfinite(float(aux["loss"]))
        blob = load_checkpoint(path)
        assert blob["config"]["node_dim"] == 16

    def test_strip_checkpoint_distribution_roundtrip(self, rng, tmp_path):
        """scripts/strip_checkpoint.py: the distribution subset keeps params/
        ema/config/step, drops resume state, --ema_only promotes EMA to
        'params', and --f16 storage upcasts back to float32 on load."""
        from scripts.strip_checkpoint import main as strip_main

        cfg = train_config()
        cfg["ema_decay"] = 0.5
        model = MolDiff(tiny_model_config(), 8, 6)
        tr = Trainer(model, cfg, mesh=make_mesh(1))
        st = tr.init_state(jax.random.key(0))
        batch = make_batch(rng)
        for i in range(2):
            st, _ = tr.train_step(st, batch, jax.random.key(i))
        src = str(tmp_path / "train.ckpt")
        tr.save_checkpoint(src, st, model_config=tiny_model_config(),
                           key=jax.random.key(9))

        dst = str(tmp_path / "dist.ckpt")
        strip_main([src, dst])
        blob = load_checkpoint(dst)
        assert blob["opt_state"] is None and blob["key"] is None
        assert os.path.getsize(dst) < os.path.getsize(src)
        for a, b in zip(jax.tree.leaves(jax.device_get(st.params)),
                        jax.tree.leaves(blob["params"])):
            np.testing.assert_array_equal(a, b)
        # sampling-path consumers only need params/config/step: a fresh
        # trainer can still seed EMA from it and keep training
        st2 = tr.load_checkpoint(dst)
        _, aux = tr.train_step(st2, batch, jax.random.key(3))
        assert np.isfinite(float(aux["loss"]))

        ema_dst = str(tmp_path / "ema.ckpt")
        strip_main([src, ema_dst, "--ema_only"])
        ema_blob = load_checkpoint(ema_dst)
        assert ema_blob["ema_params"] is None
        for a, b in zip(jax.tree.leaves(jax.device_get(st.ema_params)),
                        jax.tree.leaves(ema_blob["params"])):
            np.testing.assert_array_equal(a, b)

        f16_dst = str(tmp_path / "f16.ckpt")
        strip_main([src, f16_dst, "--f16"])
        f16_blob = load_checkpoint(f16_dst)
        for a, b in zip(jax.tree.leaves(jax.device_get(st.params)),
                        jax.tree.leaves(f16_blob["params"])):
            assert b.dtype == np.float32  # storage f16, loaded f32
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
        assert os.path.getsize(f16_dst) < os.path.getsize(dst)

    @pytest.mark.slow
    def test_grad_accum_matches_manual_average(self, rng):
        """K=2 accumulation must equal hand-computed per-microbatch grads
        (same split keys) averaged and fed through the same optimizer."""
        import optax

        model = MolDiff(tiny_model_config(), 8, 6)
        batch = make_batch(rng, b=8)
        cfg = train_config()
        cfg["grad_accum"] = 2
        tr = Trainer(model, cfg, mesh=make_mesh(1))
        assert tr.grad_accum == 2
        state0 = tr.init_state(jax.random.key(0))
        params0 = jax.device_get(state0.params)
        opt0 = jax.device_get(state0.opt_state)
        key = jax.random.key(7)
        state1, aux = tr.train_step(state0, batch, key)

        # manual: split the batch the way the step does, one grad per half
        keys = jax.random.split(key, 2)
        halves = [
            {k: v[:4] for k, v in batch.items()},
            {k: v[4:] for k, v in batch.items()},
        ]
        g_avg, losses = None, []
        for mb, k in zip(halves, keys):
            (_, a), g = jax.value_and_grad(tr.loss_fn, has_aux=True)(
                params0, mb, k
            )
            losses.append(float(a["loss"]))
            g_avg = g if g_avg is None else jax.tree.map(
                lambda x, y: x + y, g_avg, g
            )
        g_avg = jax.tree.map(lambda x: x / 2, g_avg)
        updates, _ = tr.optimizer.update(g_avg, opt0, params0)
        want = optax.apply_updates(params0, updates)
        assert float(aux["loss"]) == pytest.approx(np.mean(losses), rel=1e-5)
        for a, b in zip(jax.tree.leaves(want),
                        jax.tree.leaves(jax.device_get(state1.params))):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    def test_grad_accum_pads_batch(self, rng):
        """Odd batch + grad_accum pads with fully-masked graphs (no NaNs,
        finite loss) and still trains."""
        model = MolDiff(tiny_model_config(), 8, 6)
        cfg = train_config()
        cfg["grad_accum"] = 4
        tr = Trainer(model, cfg, mesh=make_mesh(1))
        state = tr.init_state(jax.random.key(0))
        batch = make_batch(rng, b=5)  # pads to 8 -> one microbatch near-empty
        state, aux = tr.train_step(state, batch, jax.random.key(1))
        assert np.isfinite(float(aux["loss"]))

    def test_prune_checkpoints(self, tmp_path):
        from moldiff_tpu.train.trainer import prune_checkpoints

        d = tmp_path / "checkpoints"
        d.mkdir()
        for it in (1000, 2000, 10000, 3000):
            (d / f"{it}.ckpt").write_bytes(b"x")
        (d / "best.ckpt").write_bytes(b"x")       # non-numeric: never pruned
        (d / "500.ckpt").mkdir()                  # sharded dir counts too
        removed = prune_checkpoints(str(d), keep=2)
        left = sorted(os.listdir(d))
        assert left == ["10000.ckpt", "3000.ckpt", "best.ckpt"]
        assert len(removed) == 3
        # keep=0 keeps everything (reference behavior)
        assert prune_checkpoints(str(d), keep=0) == []
        assert sorted(os.listdir(d)) == left

    def test_scheduler_step_updates_lr(self, trainer):
        state = trainer.init_state(jax.random.key(0))
        lr0 = get_lr(state.opt_state)
        for _ in range(5):
            state = trainer.scheduler_step(state, 10.0)  # never improves after 1st
        assert get_lr(state.opt_state) < lr0


class Test2DMesh:
    def test_graph_axis_sharding_matches_dp(self, rng):
        """('data','graph') 2-D mesh must produce the same step as pure DP
        (the pair-tensor sharding is numerically transparent)."""
        from moldiff_tpu.parallel.mesh import make_mesh_2d

        batch = make_batch(rng)
        results = []
        for mesh in (make_mesh(len(jax.devices())),
                     make_mesh_2d(len(jax.devices()) // 2, 2)):
            model = MolDiff(tiny_model_config(), 8, 6)
            tr = Trainer(model, train_config(), mesh=mesh)
            st = tr.init_state(jax.random.key(0))
            st, aux = tr.train_step(st, batch, jax.random.key(1))
            results.append(float(aux["loss"]))
        assert results[0] == pytest.approx(results[1], rel=1e-5)


class TestProfiling:
    def test_step_timer(self):
        import time as _time

        from moldiff_tpu.utils.profiling import StepTimer

        t = StepTimer(window=10)
        assert t.tick() is None  # first tick has no interval
        for _ in range(5):
            _time.sleep(0.002)
            dt = t.tick()
            assert dt > 0
        s = t.summary()
        assert s["steps_per_sec"] > 0
        assert s["p95_ms"] >= s["p50_ms"]

    def test_device_memory_stats_no_crash(self):
        from moldiff_tpu.utils.profiling import device_memory_stats

        device_memory_stats()  # must not raise on any backend


class TestEdgeLossScale:
    """edge_loss_scale (extension knob; reference fixes 100x at
    model.py:174-185) multiplies exactly the edge KL term."""

    def test_scales_edge_term_only(self):
        cfg = tiny_model_config()
        base = MolDiff(cfg, 8, 6)
        cfg3 = tiny_model_config()
        cfg3["edge_loss_scale"] = 3.0
        scaled = MolDiff(cfg3, 8, 6)

        rng = np.random.default_rng(0)
        batch = make_batch(rng)
        key = jax.random.PRNGKey(0)
        params = base.init_params(jax.random.PRNGKey(1))

        _, l_base = base.get_loss(
            params, batch["node_type"], batch["pos"], batch["halfedge_type"],
            batch["node_mask"], key,
        )
        _, l_scaled = scaled.get_loss(
            params, batch["node_type"], batch["pos"], batch["halfedge_type"],
            batch["node_mask"], key,
        )
        assert float(l_scaled["loss_edge"]) == pytest.approx(
            3.0 * float(l_base["loss_edge"]), rel=1e-6
        )
        assert float(l_scaled["loss_pos"]) == pytest.approx(
            float(l_base["loss_pos"]), rel=1e-6
        )
        assert float(l_scaled["loss_node"]) == pytest.approx(
            float(l_base["loss_node"]), rel=1e-6
        )
        assert float(l_scaled["loss"]) == pytest.approx(
            float(l_base["loss"]) + 2.0 * float(l_base["loss_edge"]), rel=1e-5
        )
