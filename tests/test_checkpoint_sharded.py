"""Sharded + async checkpointing (train/checkpoint_sharded.py):

  * sharded save writes per-shard files (no full-gather files for sharded
    leaves) and round-trips exactly;
  * loading under the SAME sharding hits the aligned fast path and places
    leaves sharded; loading under a DIFFERENT sharding (or none) reshards
    at load time;
  * AsyncCheckpointer produces byte-identical checkpoints to the sync
    path, atomically, without blocking on IO.
"""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moldiff_tpu.parallel.mesh import (
    DATA_AXIS,
    fsdp_param_sharding,
    make_mesh,
    make_mesh_3d,
    tp_param_sharding,
)
from moldiff_tpu.train.checkpoint_sharded import (
    AsyncCheckpointer,
    load_checkpoint_sharded,
    save_checkpoint_sharded,
)
from moldiff_tpu.train.trainer import (
    Trainer,
    TrainState,
    load_checkpoint,
)
from moldiff_tpu.utils.config import Config
from tests.test_fsdp import TRAIN_CFG, _batch
from tests.test_pipeline import tiny_model


def _equal_trees(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestShardedRoundtrip:
    @pytest.mark.slow
    def test_fsdp_state_roundtrip_same_sharding(self, tmp_path):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        model = tiny_model()
        t8 = Trainer(model, TRAIN_CFG, mesh=make_mesh(8), fsdp=True)
        s8 = t8.init_state(jax.random.key(0))
        s8, _ = t8.train_step(s8, _batch(np.random.default_rng(0)),
                              jax.random.key(1))
        path = str(tmp_path / "ckpt_dir")
        save_checkpoint_sharded(path, s8, model_config=None,
                                scheduler=t8.scheduler)

        loaded = load_checkpoint_sharded(
            path, shardings=t8._state_sharding(s8)
        )
        _equal_trees(s8, loaded["state"])
        # leaves come back SHARDED (not replicated / not host numpy)
        w = loaded["state"].params["denoiser"]["blocks"]["node_block"][
            "node_net"]["layers"][0]["lin"]["w"]
        assert isinstance(w, jax.Array)
        assert DATA_AXIS in w.sharding.spec

    def test_shard_files_are_partial(self, tmp_path):
        """Sharded leaves are written as per-shard files, each smaller than
        the full leaf — the no-gather property."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(8)
        full = jnp.arange(64 * 4, dtype=jnp.float32).reshape(64, 4)
        sharded = jax.device_put(
            full, jax.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
        )
        state = {"w": sharded}
        path = str(tmp_path / "dir")
        save_checkpoint_sharded(path, state)
        shard_files = [f for f in os.listdir(path) if f.startswith("leaf0")]
        assert len(shard_files) == 8
        for f in shard_files:
            part = np.load(os.path.join(path, f))
            assert part.shape == (8, 4)
        loaded = load_checkpoint_sharded(path)
        np.testing.assert_array_equal(loaded["state"]["w"], np.asarray(full))

    @pytest.mark.slow
    def test_reshard_on_load_tp_to_fsdp(self, tmp_path):
        """A checkpoint saved from a TP mesh loads onto an FSDP layout —
        resharding is a load-time property."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        model = tiny_model()
        t_tp = Trainer(model, TRAIN_CFG, mesh=make_mesh_3d(2, 2, 2))
        s_tp = t_tp.init_state(jax.random.key(0))
        path = str(tmp_path / "tp_dir")
        save_checkpoint_sharded(path, s_tp)

        mesh8 = make_mesh(8)
        fsdp_spec = TrainState(
            fsdp_param_sharding(mesh8, s_tp.params),
            fsdp_param_sharding(mesh8, s_tp.opt_state),
            jax.NamedSharding(mesh8, jax.sharding.PartitionSpec()),
            (fsdp_param_sharding(mesh8, s_tp.ema_params)
             if s_tp.ema_params is not None else None),
        )
        loaded = load_checkpoint_sharded(path, shardings=fsdp_spec)
        _equal_trees(s_tp, loaded["state"])

    @pytest.mark.slow
    def test_load_without_shardings_gives_numpy(self, tmp_path):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        model = tiny_model()
        t8 = Trainer(model, TRAIN_CFG, mesh=make_mesh(8), fsdp=True)
        s8 = t8.init_state(jax.random.key(0))
        path = str(tmp_path / "np_dir")
        save_checkpoint_sharded(path, s8, extra={"note": 1})
        loaded = load_checkpoint_sharded(path)
        assert isinstance(
            jax.tree.leaves(loaded["state"].params)[0], np.ndarray
        )
        _equal_trees(s8, loaded["state"])
        assert loaded["extra"] == {"note": 1}

    def test_scheduler_and_key_roundtrip(self, tmp_path):
        model = tiny_model()
        t1 = Trainer(model, TRAIN_CFG, mesh=make_mesh(1))
        s1 = t1.init_state(jax.random.key(0))
        key = jax.random.key(42)
        path = str(tmp_path / "meta_dir")
        save_checkpoint_sharded(
            path, s1, model_config=Config({"a": 1}),
            scheduler=t1.scheduler, key=key,
        )
        loaded = load_checkpoint_sharded(path)
        assert loaded["config"] == {"a": 1}
        assert loaded["scheduler"] is not None
        np.testing.assert_array_equal(
            loaded["key"], np.asarray(jax.random.key_data(key))
        )


class TestTrainerIntegration:
    @pytest.mark.slow
    def test_trainer_resume_from_sharded_dir(self, tmp_path):
        """Trainer.load_checkpoint on a directory does a direct sharded
        load (each device reads its own shards) and restores the scheduler."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        model = tiny_model()
        t8 = Trainer(model, TRAIN_CFG, mesh=make_mesh(8), fsdp=True)
        s8 = t8.init_state(jax.random.key(0))
        s8, _ = t8.train_step(s8, _batch(np.random.default_rng(0)),
                              jax.random.key(1))
        t8.scheduler.step(1.0, 1e-4)
        path = str(tmp_path / "resume_dir")
        save_checkpoint_sharded(path, s8, scheduler=t8.scheduler)

        t_new = Trainer(tiny_model(), TRAIN_CFG, mesh=make_mesh(8), fsdp=True)
        loaded = t_new.load_checkpoint(path)
        _equal_trees(s8.params, loaded.params)
        _equal_trees(s8.opt_state, loaded.opt_state)
        assert int(loaded.step) == int(s8.step)
        w = loaded.params["denoiser"]["blocks"]["node_block"]["node_net"][
            "layers"][0]["lin"]["w"]
        assert DATA_AXIS in w.sharding.spec
        assert t_new.scheduler.state_dict() == t8.scheduler.state_dict()
        # and it can keep training
        s2, aux = t_new.train_step(loaded, _batch(np.random.default_rng(2)),
                                   jax.random.key(3))
        assert np.isfinite(float(aux["loss"]))

    def test_module_load_checkpoint_handles_dir(self, tmp_path):
        """The pickle loader's dict contract also serves sharded dirs, so
        the sample CLI / converters read both formats."""
        model = tiny_model()
        t1 = Trainer(model, TRAIN_CFG, mesh=make_mesh(1))
        s1 = t1.init_state(jax.random.key(0))
        path = str(tmp_path / "dict_dir")
        save_checkpoint_sharded(path, s1, model_config=Config({"m": 3}),
                                scheduler=t1.scheduler,
                                key=jax.random.key(7), extra={"e": 1})
        ckpt = load_checkpoint(path)
        assert ckpt["config"] == {"m": 3} and ckpt["step"] == 0
        assert ckpt["extra"] == {"e": 1}
        _equal_trees(s1.params, ckpt["params"])
        _equal_trees(s1.opt_state, ckpt["opt_state"])


_MP_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2])
coord = sys.argv[3]; outdir = sys.argv[4]
jax.distributed.initialize(coordinator_address=coord,
                           num_processes=nproc, process_id=pid)
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from moldiff_tpu.train.checkpoint_sharded import (
    load_checkpoint_sharded, save_checkpoint_sharded,
)

mesh = Mesh(np.array(jax.devices()).reshape(nproc), ("data",))
data_sh = NamedSharding(mesh, P("data"))
rep_sh = NamedSharding(mesh, P())
full = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
w = jax.make_array_from_callback(full.shape, data_sh, lambda idx: full[idx])
bias = jax.make_array_from_callback((4,), rep_sh,
                                    lambda idx: np.ones(4, np.float32))
state = {"w": w, "b": bias}
path = os.path.join(outdir, "ckpt_dir")
save_checkpoint_sharded(path, state, extra={"nproc": nproc})

# every process sees the complete directory after the barrier+rename
loaded = load_checkpoint_sharded(path, shardings={"w": data_sh, "b": rep_sh})
lw = loaded["state"]["w"]
for shard in lw.addressable_shards:
    np.testing.assert_array_equal(np.asarray(shard.data), full[shard.index])
np.testing.assert_array_equal(
    np.asarray(loaded["state"]["b"].addressable_shards[0].data),
    np.ones(4, np.float32),
)
assert loaded["extra"] == {"nproc": nproc}
print("WORKER_OK", pid)
"""


@pytest.mark.slow
def test_two_process_sharded_checkpoint(tmp_path):
    """REAL 2-process jax.distributed run: each process writes only its own
    shards (no gather), replicated leaves are written exactly once, and both
    processes reload their slices from the finished directory.

    The coordinator port is bound-then-released before the workers start,
    so another process can steal it under load — retry once with a fresh
    port (same discipline as the infra, not the checkpoint code, failing).
    """
    import socket
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(_MP_WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    env.pop("XLA_FLAGS", None)

    outs = None
    for attempt in range(2):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        coord = f"127.0.0.1:{port}"
        workdir = tmp_path / f"run{attempt}"
        workdir.mkdir()
        procs = [
            subprocess.Popen(
                [_sys.executable, str(worker_py), str(p), "2", coord,
                 str(workdir)],
                cwd=repo, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for p in range(2)
        ]
        outs = [p.communicate(timeout=240)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "WORKER_OK" in out, out
    tmp_path = workdir
    # per-shard files: 2 for the data-sharded leaf, 1 for the replicated one
    files = sorted(os.listdir(tmp_path / "ckpt_dir"))
    leaf_b = [f for f in files if f.startswith("leaf0")]  # 'b' sorts first
    leaf_w = [f for f in files if f.startswith("leaf1")]
    assert len(leaf_w) == 2 and len(leaf_b) == 1, files
    for f in leaf_w:
        assert np.load(tmp_path / "ckpt_dir" / f).shape == (4, 3)
    # parent (no distributed context) can read it too
    loaded = load_checkpoint_sharded(str(tmp_path / "ckpt_dir"))
    np.testing.assert_array_equal(
        loaded["state"]["w"],
        np.arange(24, dtype=np.float32).reshape(8, 3),
    )


class TestAsyncCheckpointer:
    def test_matches_sync_checkpoint(self, tmp_path):
        model = tiny_model()
        t1 = Trainer(model, TRAIN_CFG, mesh=make_mesh(1))
        s1 = t1.init_state(jax.random.key(0))
        s1, _ = t1.train_step(s1, _batch(np.random.default_rng(1)),
                              jax.random.key(2))

        sync_path = str(tmp_path / "sync.ckpt")
        t1.save_checkpoint(sync_path, s1, model_config=Config({"x": 2}),
                           key=jax.random.key(3))
        async_path = str(tmp_path / "async.ckpt")
        ac = AsyncCheckpointer()
        ac.save(async_path, s1, model_config=Config({"x": 2}),
                scheduler=t1.scheduler, key=jax.random.key(3))
        ac.wait()

        a = load_checkpoint(sync_path)
        b = load_checkpoint(async_path)
        assert a["step"] == b["step"] and a["config"] == b["config"]
        _equal_trees(a["params"], b["params"])
        _equal_trees(a["opt_state"], b["opt_state"])
        np.testing.assert_array_equal(a["key"], b["key"])
        # trainer can resume from the async checkpoint
        s_loaded = t1.load_checkpoint(async_path)
        assert int(s_loaded.step) == int(s1.step)

    def test_snapshot_survives_donation(self, tmp_path):
        """The state captured by save() must be the values AT CALL TIME,
        even though the next train_step donates/overwrites the buffers."""
        model = tiny_model()
        t1 = Trainer(model, TRAIN_CFG, mesh=make_mesh(1))
        s1 = t1.init_state(jax.random.key(0))
        want = np.asarray(jax.tree.leaves(s1.params)[0]).copy()

        ac = AsyncCheckpointer()
        path = str(tmp_path / "snap.ckpt")
        ac.save(path, s1, scheduler=t1.scheduler)
        # mutate: take several steps (donation reuses the param buffers)
        s = s1
        for i in range(3):
            s, _ = t1.train_step(s, _batch(np.random.default_rng(i)),
                                 jax.random.key(i))
        ac.wait()
        got = np.asarray(jax.tree.leaves(load_checkpoint(path)["params"])[0])
        np.testing.assert_array_equal(got, want)

    def test_atomic_no_partial_file(self, tmp_path):
        model = tiny_model()
        t1 = Trainer(model, TRAIN_CFG, mesh=make_mesh(1))
        s1 = t1.init_state(jax.random.key(0))
        ac = AsyncCheckpointer()
        path = str(tmp_path / "atomic.ckpt")
        ac.save(path, s1)
        ac.wait()
        assert os.path.exists(path) and not os.path.exists(path + ".tmp")
        with open(path, "rb") as f:
            pickle.load(f)  # complete, parseable

    def test_back_to_back_saves_ordered(self, tmp_path):
        model = tiny_model()
        t1 = Trainer(model, TRAIN_CFG, mesh=make_mesh(1))
        s = t1.init_state(jax.random.key(0))
        ac = AsyncCheckpointer()
        path = str(tmp_path / "ordered.ckpt")
        for i in range(3):
            s, _ = t1.train_step(s, _batch(np.random.default_rng(i)),
                                 jax.random.key(i))
            ac.save(path, s)
        ac.wait()
        assert load_checkpoint(path)["step"] == 3
