"""Jitted, mesh-sharded train/eval steps + checkpointing.

The whole training step — perturb, denoise, loss, grad, clip, adamw update —
is ONE jit-compiled pure function over a device mesh (batch sharded on the
'data' axis, params replicated; XLA inserts the grad all-reduce over ICI).
This replaces the reference's imperative loop body
(`/root/reference/scripts/train_drug3d.py:88-119`): autocast/GradScaler are
unnecessary on TPU (bf16 matmuls, fp32 master params).

Checkpoints embed the config (load-bearing for sampling in the reference,
`scripts/sample_drug3d.py:49-50`) and add a true resume path (params +
opt state + scheduler + step + PRNG key), which the reference lacks
(SURVEY.md section 5).
"""
from __future__ import annotations

import os
import pickle
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from ..parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    ep_enabled,
    ep_param_sharding,
    fsdp_param_sharding,
    make_mesh,
    pad_batch_to_multiple,
    replicated,
    tp_enabled,
    tp_param_sharding,
)
from ..parallel.pipeline import pipe_enabled, pipe_param_sharding
from .optim import get_lr, get_optimizer, get_scheduler, set_lr


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32
    # exponential moving average of params (None when ema_decay == 0).
    # Framework addition over the reference: diffusion sampling quality
    # typically improves from EMA weights; enable via train.ema_decay and
    # sample with --use_ema.
    ema_params: Any = None


def make_loss_fn(model, pos_noise_std: float = 0.0) -> Callable:
    """Returns loss_fn(params, batch, key) -> (loss, aux_dict).

    ``pos_noise_std`` is the reference's position-jitter augmentation
    (scripts/train_drug3d.py:92), applied inside the jitted step.
    """

    def loss_fn(params, batch, key):
        pos = batch["pos"]
        if pos_noise_std > 0:
            key, k_jit = jax.random.split(key)
            pos = pos + pos_noise_std * jax.random.normal(k_jit, pos.shape, pos.dtype)
        return model.get_loss(
            params,
            batch["node_type"],
            pos,
            batch["halfedge_type"],
            batch["node_mask"],
            key,
        )

    return loss_fn


class Trainer:
    """Owns optimizer/scheduler/mesh and the compiled step functions.

    model must expose ``init_params(key)`` and ``get_loss(params, node_type,
    pos, halfedge_type, node_mask, key) -> (loss, aux)`` (MolDiff and
    BondPredictor both do).
    """

    def __init__(
        self,
        model,
        train_config,
        mesh: Optional[Mesh] = None,
        fsdp: bool = False,
    ):
        self.model = model
        self.config = train_config
        opt_cfg = dict(train_config["optimizer"])
        opt_cfg.setdefault("max_grad_norm", train_config.get("max_grad_norm", 0.0))
        self.optimizer = get_optimizer(opt_cfg)
        self.scheduler = get_scheduler(
            train_config["scheduler"], base_lr=float(opt_cfg["lr"])
        )
        self.mesh = mesh if mesh is not None else make_mesh()
        # 2-D ('data', 'graph') mesh: hint the dense pair tensors' sharding
        from ..parallel.mesh import pair_sharding as _pair_sharding

        ps = _pair_sharding(self.mesh)
        if ps is not None and hasattr(model, "pair_sharding"):
            model.pair_sharding = ps
        self.loss_fn = make_loss_fn(
            model, pos_noise_std=float(train_config.get("pos_noise_std", 0.0))
        )

        rep = replicated(self.mesh)
        data = batch_sharding(self.mesh)

        # tensor parallelism (3-D mesh with a 'model' axis): params, grads,
        # and optimizer moments live SHARDED over MLP hidden dims
        # (Megatron column/row pattern — parallel/mesh.py:tp_param_sharding);
        # jit then follows the committed input shardings instead of the
        # replicated in_shardings of the pure-DP path, and explicit
        # constraints inside the step pin grads/params to the TP layout so
        # GSPMD keeps the all-reduce per row-parallel matmul rather than
        # falling back to replication.
        self.tp = tp_enabled(self.mesh)
        # pipeline parallelism ('pipe' mesh axis): the denoiser's stacked
        # block params (+ their grads/moments) live sharded over 'pipe' and
        # the model's forward runs the GPipe executor (parallel/pipeline.py)
        self.pp = pipe_enabled(self.mesh) and hasattr(model, "pipeline_cfg")
        if self.pp:
            model.pipeline_cfg = (
                self.mesh, train_config.get("num_microbatches"))
        # FSDP (ZeRO-3): params + grads + adam moments + EMA sharded over
        # 'data' at rest (parallel/mesh.py:fsdp_param_sharding); GSPMD
        # all-gathers leaves for compute and reduce-scatters the grads.
        self.fsdp = (
            bool(fsdp)
            and DATA_AXIS in self.mesh.axis_names
            and self.mesh.shape[DATA_AXIS] > 1
        )
        if self.fsdp and (self.tp or self.pp):
            raise ValueError(
                "fsdp is exclusive with the 'model'/'pipe' axes: both shard "
                "the same param leaves with conflicting layouts"
            )
        # expert parallelism ('expert' mesh axis): MoE expert banks (+ their
        # grads/moments) live sharded over 'expert'
        # (parallel/mesh.py:ep_param_sharding); the dispatch/combine einsums
        # pick the sharding up through GSPMD propagation.
        self.ep = ep_enabled(self.mesh)
        if self.ep and self.fsdp:
            raise ValueError(
                "fsdp is exclusive with the 'expert' axis: conflicting "
                "layouts on expert leaves"
            )
        mesh_ = self.mesh
        tp_on, pp_on, fsdp_on, ep_on = self.tp, self.pp, self.fsdp, self.ep

        def constrain_tp(tree):
            if tp_on:
                tree = jax.lax.with_sharding_constraint(
                    tree, tp_param_sharding(mesh_, tree)
                )
            if pp_on:
                tree = jax.lax.with_sharding_constraint(
                    tree, pipe_param_sharding(mesh_, tree)
                )
            if fsdp_on:
                tree = jax.lax.with_sharding_constraint(
                    tree, fsdp_param_sharding(mesh_, tree)
                )
            if ep_on:
                tree = jax.lax.with_sharding_constraint(
                    tree, ep_param_sharding(mesh_, tree)
                )
            return tree

        self.ema_decay = float(train_config.get("ema_decay", 0.0) or 0.0)
        ema_decay = self.ema_decay
        # gradient accumulation: split the batch into K microbatches inside
        # the jitted step (lax.scan over value_and_grad, f32 grad sum) — K x
        # the effective batch at ~1/K the activation memory. Per-microbatch
        # masked means are averaged, so with ragged real-element counts the
        # loss weighting differs from the one-shot batch by the usual
        # accumulation approximation (each microbatch weighted equally).
        self.grad_accum = int(train_config.get("grad_accum", 1) or 1)
        accum = self.grad_accum

        jit_shardings = (
            {} if (self.tp or self.pp or self.fsdp or self.ep)
            else {"in_shardings": (rep, data, rep), "out_shardings": rep}
        )

        @partial(jax.jit, donate_argnums=(0,), **jit_shardings)
        def _train_step(state: TrainState, batch, key):
            if accum > 1:
                from jax.sharding import NamedSharding, PartitionSpec

                micro = jax.tree.map(
                    lambda x: x.reshape(
                        (accum, x.shape[0] // accum) + x.shape[1:]
                    ),
                    batch,
                )
                if DATA_AXIS in mesh_.axis_names and mesh_.shape[DATA_AXIS] > 1:
                    micro = jax.lax.with_sharding_constraint(
                        micro,
                        NamedSharding(mesh_, PartitionSpec(None, DATA_AXIS)),
                    )
                keys = jax.random.split(key, accum)

                def acc_body(g_sum, xs):
                    mb, k = xs
                    (_, a), g = jax.value_and_grad(
                        self.loss_fn, has_aux=True
                    )(state.params, mb, k)
                    return jax.tree.map(jnp.add, g_sum, g), a

                zero_g = jax.tree.map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), state.params
                )
                g_sum, auxs = jax.lax.scan(acc_body, zero_g, (micro, keys))
                grads = jax.tree.map(lambda g: g / accum, g_sum)
                aux = jax.tree.map(lambda x: jnp.mean(x, axis=0), auxs)
            else:
                (_, aux), grads = jax.value_and_grad(
                    self.loss_fn, has_aux=True
                )(state.params, batch, key)
            grads = constrain_tp(grads)
            aux["grad_norm"] = optax.global_norm(grads)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = constrain_tp(optax.apply_updates(state.params, updates))
            ema = state.ema_params
            if ema_decay > 0:
                ema = jax.tree.map(
                    lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                    ema, params,
                )
            return TrainState(params, opt_state, state.step + 1, ema), aux

        @partial(jax.jit, **jit_shardings)
        def _eval_step(params, batch, key):
            _, aux = self.loss_fn(params, batch, key)
            return aux

        self._train_step = _train_step
        self._eval_step = _eval_step

    # -- lifecycle -----------------------------------------------------------

    def _state_sharding(self, state: TrainState):
        """Placement pytree for a TrainState: replicated on DP meshes;
        TP-sharded params/moments/EMA on meshes with a 'model' axis;
        stacked-block leaves 'pipe'-sharded on pipeline meshes;
        largest-dim 'data'-sharded under FSDP; expert banks
        'expert'-sharded on expert meshes."""
        if not (self.tp or self.pp or self.fsdp or self.ep):
            return replicated(self.mesh)
        shard = (
            tp_param_sharding if self.tp
            else pipe_param_sharding if self.pp
            else ep_param_sharding if self.ep
            else fsdp_param_sharding
        )
        sh = lambda t: shard(self.mesh, t)
        return TrainState(
            sh(state.params),
            sh(state.opt_state),
            replicated(self.mesh),
            sh(state.ema_params) if state.ema_params is not None else None,
        )

    def init_state(self, key: jax.Array) -> TrainState:
        params = self.model.init_params(key)
        opt_state = self.optimizer.init(params)
        # real copies: jnp.asarray would ALIAS the param buffers and the
        # train step's donation would then donate each buffer twice
        ema = (jax.tree.map(lambda x: jnp.array(x, copy=True), params)
               if self.ema_decay > 0 else None)
        state = TrainState(params, opt_state, jnp.asarray(0, jnp.int32), ema)
        return jax.device_put(state, self._state_sharding(state))

    def _put(self, batch: dict) -> dict:
        """Pad the leading dim to a mesh-size (x grad_accum) multiple
        (padded rows fully masked -> contribute nothing) and shard over the
        data axis."""
        batch = {k: np.asarray(v) for k, v in batch.items()}
        batch = pad_batch_to_multiple(
            batch,
            self.mesh.shape[self.mesh.axis_names[0]] * self.grad_accum,
        )
        s = batch_sharding(self.mesh)
        return {k: jax.device_put(v, s) for k, v in batch.items()}

    def train_step(self, state: TrainState, batch: dict, key: jax.Array):
        return self._train_step(state, self._put(batch), key)

    def eval_step(self, params, batch: dict, key: jax.Array):
        return self._eval_step(params, self._put(batch), key)

    def scheduler_step(self, state: TrainState, val_metric: float) -> TrainState:
        """Host-side reactive LR update between jitted steps."""
        lr = get_lr(state.opt_state)
        new_lr = self.scheduler.step(val_metric, lr)
        if new_lr != lr:
            set_lr(state.opt_state, new_lr)
        return state

    # -- checkpointing -------------------------------------------------------

    def save_checkpoint(
        self, path: str, state: TrainState, model_config=None, key=None, extra=None
    ) -> None:
        save_checkpoint(path, state, model_config=model_config,
                        scheduler=self.scheduler, key=key, extra=extra)

    def load_checkpoint(self, path: str) -> TrainState:
        from .checkpoint_sharded import is_sharded_checkpoint

        if is_sharded_checkpoint(path) and (
            self.tp or self.pp or self.fsdp or self.ep
        ):
            return self._load_sharded_dir(path)
        ckpt = load_checkpoint(path)
        ema = ckpt.get("ema_params")
        if self.ema_decay > 0 and ema is None:
            # enabling EMA on an older checkpoint: seed from a COPY of the
            # params (aliased buffers would break the step's donation)
            ema = jax.tree.map(lambda x: np.array(x, copy=True), ckpt["params"])
        if self.ema_decay == 0:
            ema = None
        opt_state = ckpt["opt_state"]
        if opt_state is None:
            # distribution checkpoint (scripts/strip_checkpoint.py): params
            # only — fine-tuning re-initializes the optimizer fresh.
            opt_state = self.optimizer.init(ckpt["params"])
        state = TrainState(
            ckpt["params"], opt_state,
            jnp.asarray(ckpt["step"], jnp.int32), ema,
        )
        if ckpt.get("scheduler") is not None:
            self.scheduler.load_state_dict(ckpt["scheduler"])
        return jax.device_put(state, self._state_sharding(state))

    def _load_sharded_dir(self, path: str) -> TrainState:
        """Direct sharded load: each device reads only its own shards
        (aligned fast path when the saving layout matches this trainer's),
        never materializing the full state on one host."""
        from .checkpoint_sharded import load_checkpoint_sharded, read_meta

        treedef, specs = read_meta(path)
        structs = [jax.ShapeDtypeStruct(tuple(s["shape"]), np.dtype(s["dtype"]))
                   for s in specs if s is not None]
        struct_state = jax.tree.unflatten(treedef, structs)
        ckpt = load_checkpoint_sharded(
            path, shardings=self._state_sharding(struct_state)
        )
        st = ckpt["state"]
        ema = st.ema_params
        if self.ema_decay > 0 and ema is None:
            ema = jax.tree.map(lambda x: jnp.array(x, copy=True), st.params)
        if self.ema_decay == 0:
            ema = None
        state = TrainState(st.params, st.opt_state,
                           jnp.asarray(st.step, jnp.int32), ema)
        if ckpt.get("scheduler") is not None:
            self.scheduler.load_state_dict(ckpt["scheduler"])
        return jax.device_put(state, self._state_sharding(state))


def save_checkpoint(path, state: TrainState, model_config=None, scheduler=None,
                    key=None, extra=None) -> None:
    """Pickle checkpoint: host numpy pytrees + config + scheduler + step.

    Mirrors the reference dict {'config','model','optimizer','scheduler',
    'iteration'} (scripts/train_drug3d.py:176-183) with a real resume path.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    to_host = lambda tree: jax.tree.map(np.asarray, jax.device_get(tree))
    blob = {
        "config": model_config.to_dict() if hasattr(model_config, "to_dict") else model_config,
        "params": to_host(state.params),
        "opt_state": to_host(state.opt_state),
        "step": int(state.step),
        "scheduler": scheduler.state_dict() if scheduler is not None else None,
        "key": np.asarray(jax.random.key_data(key)) if key is not None else None,
        "extra": extra,
        "ema_params": (to_host(state.ema_params)
                       if getattr(state, "ema_params", None) is not None else None),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def prune_checkpoints(ckpt_dir: str, keep: int) -> list:
    """Keep only the ``keep`` newest numeric checkpoints (<it>.ckpt files or
    sharded directories) under ``ckpt_dir``; non-numeric names (best.ckpt,
    final.ckpt) are never touched. keep <= 0 keeps everything (the reference
    behavior — it never prunes). Returns the removed paths."""
    import glob
    import shutil

    if keep <= 0:
        return []
    numeric = []
    for p in glob.glob(os.path.join(ckpt_dir, "*.ckpt")):
        stem = os.path.splitext(os.path.basename(p))[0]
        if stem.isdigit():
            numeric.append((int(stem), p))
    numeric.sort()
    removed = []
    for _, p in numeric[:-keep]:
        if os.path.isdir(p):
            shutil.rmtree(p)
        else:
            os.remove(p)
        removed.append(p)
    return removed


def load_checkpoint(path: str) -> dict:
    """Load a pickle checkpoint, or a sharded checkpoint directory
    (train/checkpoint_sharded.py) flattened to the same dict contract —
    so every consumer (sample CLI, converters, soak) reads both formats."""
    from .checkpoint_sharded import is_sharded_checkpoint

    if is_sharded_checkpoint(path):
        from .checkpoint_sharded import load_checkpoint_sharded

        out = load_checkpoint_sharded(path)
        st = out["state"]
        return {
            "config": out["config"],
            "params": st.params,
            "opt_state": st.opt_state,
            "step": int(st.step),
            "scheduler": out["scheduler"],
            "key": out["key"],
            "extra": out["extra"],
            "ema_params": st.ema_params,
        }
    with open(path, "rb") as f:
        blob = pickle.load(f)
    # float16 is a STORAGE format (scripts/strip_checkpoint.py --f16): the
    # compute dtype is config-driven (denoiser.dtype), so distribution
    # checkpoints upcast back to float32 here and every consumer sees the
    # dtype training produced.
    def _upcast(tree):
        if tree is None:
            return None
        return jax.tree.map(
            lambda x: x.astype(np.float32)
            if isinstance(x, np.ndarray) and x.dtype == np.float16 else x,
            tree,
        )

    blob["params"] = _upcast(blob.get("params"))
    if blob.get("ema_params") is not None:
        blob["ema_params"] = _upcast(blob["ema_params"])
    return blob
