"""Sharded + async checkpointing for multi-device/multi-host training.

The pickle checkpoint (train/trainer.py:save_checkpoint) device_gets the
FULL state onto one host — correct, but at scale it all-gathers every
sharded leaf (TP/FSDP/EP park params+moments sharded across devices) and
blocks the train loop on serialization. This module adds the TPU-native
alternative (orbax-style, first-party):

  * **Sharded save**: every process writes ONLY its addressable shards —
    one ``.npy`` per (leaf, shard) keyed by the shard's offset coordinates,
    plus a single ``meta.pkl`` (treedef, shapes, dtypes, step, config,
    scheduler, PRNG key) written by process 0. No gather anywhere.
  * **Sharded load**: ``jax.make_array_from_callback`` pulls exactly the
    shards each device needs; when the requested slice matches a saved
    shard it is one file read (the aligned fast path). Loading under a
    DIFFERENT sharding (e.g. TP ckpt -> replicated, or onto a resized
    mesh) assembles leaves from shards and re-slices — resharding is a
    load-time property, never a save-time one.
  * **Async save**: the device->host copy happens synchronously (donated
    buffers are consumed by the next step, so the snapshot must be taken
    now), then serialization + fsync + atomic rename run on a background
    thread — the train loop only ever blocks on the copy, not the IO.

Directory layout::

    <path>/                    (atomic: written as <path>.tmp, renamed)
      meta.pkl                 treedef, leaf specs, step, config, ...
      leaf<i>_o<o0>_<o1>....npy   one per addressable shard
"""
from __future__ import annotations

import os
import pickle
import shutil
import threading
from typing import Any, Optional

import jax
import numpy as np

META_NAME = "meta.pkl"


def is_sharded_checkpoint(path: str) -> bool:
    """True iff ``path`` is a sharded checkpoint directory."""
    return os.path.isdir(path) and os.path.exists(os.path.join(path, META_NAME))


def read_meta(path: str) -> tuple:
    """(treedef, specs) of a sharded checkpoint — enough to build a
    placement pytree (via ``jax.ShapeDtypeStruct`` leaves) without reading
    any shard data."""
    with open(os.path.join(path, META_NAME), "rb") as f:
        meta = pickle.load(f)
    return meta["treedef"], meta["specs"]


def _shard_filename(leaf_i: int, index) -> str:
    """Key a shard by its offset coordinates inside the global array
    (slice starts; () for replicated/scalar leaves)."""
    offs = [0 if s.start is None else int(s.start) for s in index]
    tag = "_".join(str(o) for o in offs) if offs else "r"
    return f"leaf{leaf_i}_o{tag}.npy"


def save_checkpoint_sharded(
    path: str,
    state: Any,
    model_config=None,
    scheduler=None,
    key=None,
    extra=None,
) -> None:
    """Write ``state`` (any pytree of jax/np arrays) as a sharded
    checkpoint directory. Each process writes only its addressable shards;
    process 0 writes the metadata. Safe on a single host too (it simply
    writes every shard)."""
    leaves, treedef = jax.tree.flatten(state)
    tmp = path + ".tmp"
    if jax.process_index() == 0:
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
    # multi-host: everyone waits for the directory. Single-process: no-op.
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ckpt_dir_ready")

    specs = []
    for i, leaf in enumerate(leaves):
        if leaf is None:
            specs.append(None)
            continue
        if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
            specs.append({
                "shape": tuple(leaf.shape),
                "dtype": str(leaf.dtype),
                "sharded": True,
            })
            seen = set()
            for shard in leaf.addressable_shards:
                # replica 0 owns each distinct shard — prevents two PROCESSES
                # (or two local devices) concurrently writing the same file
                # for leaves replicated across the mesh
                if getattr(shard, "replica_id", 0) != 0:
                    continue
                fname = _shard_filename(i, shard.index)
                if fname in seen:
                    continue
                seen.add(fname)
                np.save(os.path.join(tmp, fname), np.asarray(shard.data))
        else:
            arr = np.asarray(leaf)
            specs.append({
                "shape": tuple(arr.shape),
                "dtype": str(arr.dtype),
                "sharded": False,
            })
            if jax.process_index() == 0:
                np.save(os.path.join(tmp, _shard_filename(i, ())), arr)

    if jax.process_index() == 0:
        meta = {
            "treedef": treedef,
            "specs": specs,
            "config": (model_config.to_dict()
                       if hasattr(model_config, "to_dict") else model_config),
            "scheduler": scheduler.state_dict() if scheduler is not None else None,
            "key": (np.asarray(jax.random.key_data(key))
                    if key is not None else None),
            "extra": extra,
        }
        with open(os.path.join(tmp, META_NAME), "wb") as f:
            pickle.dump(meta, f, protocol=pickle.HIGHEST_PROTOCOL)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ckpt_files_written")
    if jax.process_index() == 0:
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)


class _LeafReader:
    """Reads one leaf's shards; aligned slices hit single files, anything
    else assembles the full leaf once and serves slices from it."""

    def __init__(self, dirpath: str, leaf_i: int, spec: dict):
        self.dir = dirpath
        self.i = leaf_i
        self.spec = spec
        self._full: Optional[np.ndarray] = None
        self._lock = threading.Lock()

    def _file_for(self, index) -> str:
        return os.path.join(self.dir, _shard_filename(self.i, index))

    def full(self) -> np.ndarray:
        with self._lock:
            if self._full is None:
                shape = tuple(self.spec["shape"])
                dtype = np.dtype(self.spec["dtype"])
                prefix = f"leaf{self.i}_o"
                files = [f for f in os.listdir(self.dir)
                         if f.startswith(prefix) and f.endswith(".npy")]
                if len(files) == 1:
                    arr = np.load(os.path.join(self.dir, files[0]))
                    if tuple(arr.shape) != shape:
                        raise ValueError(
                            f"leaf {self.i}: single shard {arr.shape} does "
                            f"not cover {shape} — checkpoint written on a "
                            "filesystem not shared by all processes?"
                        )
                    self._full = arr
                else:
                    out = np.empty(shape, dtype)
                    covered = np.zeros(shape, bool)
                    for f in files:
                        part = np.load(os.path.join(self.dir, f))
                        offs = [int(o) for o in
                                f[len(prefix):-len(".npy")].split("_")]
                        sl = tuple(slice(o, o + s)
                                   for o, s in zip(offs, part.shape))
                        out[sl] = part
                        covered[sl] = True
                    if not covered.all():
                        raise ValueError(
                            f"leaf {self.i}: shards cover only "
                            f"{covered.mean():.0%} of {shape} — missing "
                            "files (non-shared filesystem?)"
                        )
                    self._full = out
            return self._full

    def read(self, index) -> np.ndarray:
        fname = self._file_for(index)
        if os.path.exists(fname):
            part = np.load(fname)
            # aligned only if the saved shard covers exactly the request
            want = tuple(
                (0 if s.start is None else s.start,
                 self.spec["shape"][d] if s.stop is None else s.stop)
                for d, s in enumerate(index)
            )
            if all(hi - lo == ps for (lo, hi), ps in zip(want, part.shape)):
                return part
        return self.full()[index]


def load_checkpoint_sharded(path: str, shardings=None) -> dict:
    """Load a sharded checkpoint directory.

    ``shardings``: optional pytree of ``jax.sharding.Sharding`` matching the
    saved state's structure (e.g. from ``Trainer._state_sharding``); leaves
    are materialized directly into that placement, each device reading only
    its own shards (aligned fast path when the layout matches the save).
    Without it, leaves come back as host numpy arrays (same contract as
    trainer.load_checkpoint's pickle blob).

    Returns {"state", "config", "scheduler", "key", "extra"}.
    """
    with open(os.path.join(path, META_NAME), "rb") as f:
        meta = pickle.load(f)
    treedef = meta["treedef"]
    specs = meta["specs"]

    # None leaves are empty subtrees to jax.tree.flatten, so specs and a
    # FULL shardings tree flatten to the same length; anything else (e.g. a
    # single replicated NamedSharding) falls back to host-numpy loading
    shard_leaves = None
    if shardings is not None:
        cand = jax.tree.flatten(
            shardings, is_leaf=lambda x: hasattr(x, "addressable_devices")
        )[0]
        if len(cand) == len(specs):
            shard_leaves = cand

    leaves = []
    for i, spec in enumerate(specs):
        reader = _LeafReader(path, i, spec)
        shape = spec["shape"]
        dtype = np.dtype(spec["dtype"])
        sh = None
        if shard_leaves is not None and hasattr(
            shard_leaves[i], "addressable_devices"
        ):
            sh = shard_leaves[i]
        if sh is not None:
            arr = jax.make_array_from_callback(
                shape, sh, lambda idx, r=reader: r.read(idx).astype(dtype)
            )
            leaves.append(arr)
        else:
            leaves.append(reader.full().astype(dtype))
    state = jax.tree.unflatten(treedef, leaves)
    return {
        "state": state,
        "config": meta["config"],
        "scheduler": meta["scheduler"],
        "key": meta["key"],
        "extra": meta["extra"],
    }


class AsyncCheckpointer:
    """Non-blocking pickle checkpoints: snapshot on the caller's thread
    (device->host copy — required before the next step donates the
    buffers), serialize + atomic-rename on a background thread.

    One in-flight save at a time; a new save waits for the previous one
    (checkpoints are ordered). ``wait()`` joins the last save; call it
    before reading the file or exiting."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def save(self, path: str, state, model_config=None, scheduler=None,
             key=None, extra=None) -> None:
        from .trainer import TrainState

        self.wait()
        # synchronous snapshot: after this, the train loop may donate/mutate
        host_state = jax.tree.map(
            np.asarray, jax.device_get(state),
        )
        sched_state = scheduler.state_dict() if scheduler is not None else None
        key_data = (np.asarray(jax.random.key_data(key))
                    if key is not None else None)
        cfg = (model_config.to_dict()
               if hasattr(model_config, "to_dict") else model_config)

        def _write():
            try:
                blob = {
                    "config": cfg,
                    "params": host_state.params,
                    "opt_state": host_state.opt_state,
                    "step": int(host_state.step),
                    "scheduler": sched_state,
                    "key": key_data,
                    "extra": extra,
                    "ema_params": host_state.ema_params,
                }
                os.makedirs(os.path.dirname(os.path.abspath(path)),
                            exist_ok=True)
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, path)
            except BaseException as e:  # surfaced on next save()/wait()
                self._error = e

        assert isinstance(host_state, TrainState)
        self._thread = threading.Thread(target=_write, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err
