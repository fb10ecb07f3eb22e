"""Train the MolDiff denoiser (TPU-native analogue of
`/root/reference/scripts/train_drug3d.py`).

Usage:
  python scripts/train_drug3d.py --config configs/train/train_MolDiff.yml \
      --logdir ./logs [--max_iters N] [--resume ckpt.pkl]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from moldiff_tpu.data.dataset import get_dataset
from moldiff_tpu.data.featurize import MolFeaturizer
from moldiff_tpu.data.loader import BucketedLoader
from moldiff_tpu.models.moldiff import MolDiff
from moldiff_tpu.parallel.mesh import make_mesh_from_config
from moldiff_tpu.train.optim import get_lr
from moldiff_tpu.train.trainer import Trainer
from moldiff_tpu.utils.config import load_config
from moldiff_tpu.utils.misc import MetricsWriter, get_logger, get_new_log_dir, seed_all


def build_model(config) -> tuple:
    featurizer = MolFeaturizer(
        atomic_numbers=tuple(config.chem.atomic_numbers),
        mol_bond_types=tuple(config.chem.mol_bond_types),
        use_mask_node=config.transform.use_mask_node,
        use_mask_edge=config.transform.use_mask_edge,
    )
    model = MolDiff(
        config.model,
        num_node_types=featurizer.num_node_types,
        num_edge_types=featurizer.num_edge_types,
    )
    return model, featurizer


def main(argv=None):
    from moldiff_tpu.utils.misc import force_platform_from_env
    force_platform_from_env()  # honor JAX_PLATFORMS despite sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--logdir", default="./logs")
    ap.add_argument("--name", default=None)
    ap.add_argument("--max_iters", type=int, default=None)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--override_lr", type=float, default=None,
                    help="after --resume, replace the restored LR (e.g. for "
                         "fine-tuning on new data)")
    ap.add_argument("--reset_ema", action="store_true",
                    help="after --resume, re-seed EMA from the restored "
                         "params. An EMA that accumulated across a corpus "
                         "switch mid-ladder averages weights from different "
                         "optima and samples WORSE than raw (measured "
                         "round 4: 0.445 vs 0.523, soak_v2x2_1k_ema.json); "
                         "fine-tunes on new data should reset it")
    ap.add_argument("--reset_optim", action="store_true",
                    help="after --resume, discard the restored optimizer + "
                         "scheduler state (fresh adamw at the config LR) — "
                         "the clean way to start a lever fine-tune instead "
                         "of inheriting a plateau-decayed LR ladder")
    ap.add_argument("--num_devices", type=int, default=None)
    ap.add_argument("--profile_at", type=int, default=0,
                    help="capture a jax.profiler trace for 5 steps at this iter")
    args = ap.parse_args(argv)

    config = load_config(args.config)
    seed_all(config.train.seed)
    name = args.name or os.path.splitext(os.path.basename(args.config))[0]
    log_dir = get_new_log_dir(args.logdir, prefix=name)
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    shutil.copyfile(args.config, os.path.join(log_dir, os.path.basename(args.config)))
    logger = get_logger("train", log_dir)
    writer = MetricsWriter(log_dir)
    logger.info(f"config: {args.config} | devices: {jax.devices()}")

    model, featurizer = build_model(config)
    par = dict(config.get("parallel", {}) or {})
    if args.num_devices:
        par["num_devices"] = args.num_devices
    # parallel: {num_devices, graph, model} -> 1-D/2-D/3-D mesh
    mesh = make_mesh_from_config(par)
    trainer = Trainer(model, config.train, mesh=mesh,
                      fsdp=bool(par.get("fsdp", False)))

    key = jax.random.key(config.train.seed)
    key, k_init = jax.random.split(key)
    if args.resume:
        state = trainer.load_checkpoint(args.resume)
        logger.info(f"resumed from {args.resume} at step {int(state.step)}")
        if args.reset_ema and state.ema_params is not None:
            state = state._replace(ema_params=jax.tree.map(
                lambda x: np.array(x, copy=True), state.params))
            logger.info("EMA re-seeded from restored params (--reset_ema)")
        if args.reset_optim:
            state = state._replace(
                opt_state=trainer.optimizer.init(state.params))
            trainer.scheduler.reset()
            logger.info("optimizer + scheduler state reset (--reset_optim)")
        if args.override_lr:
            from moldiff_tpu.train.optim import set_lr

            set_lr(state.opt_state, args.override_lr)
            logger.info(f"override LR -> {args.override_lr} (resume restores "
                        "the decayed LR; fine-tunes on new data may want a "
                        "fresh one)")
    else:
        state = trainer.init_state(k_init)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    logger.info(f"trainable params: {n_params / 1e6:.2f}M | mesh: {mesh.shape}")

    _, subsets = get_dataset(config.dataset)
    buckets = tuple(config.train.get("buckets", (24, 32, 48)))
    train_loader = iter(BucketedLoader(
        subsets["train"], featurizer, config.train.batch_size, buckets,
        shuffle=True, seed=config.train.seed, infinite=True,
    ))
    val_subset = subsets.get("val") or subsets.get("train")

    max_iters = args.max_iters or config.train.max_iters
    val_freq = config.train.val_freq
    ckpt_freq = config.train.get("ckpt_freq", val_freq)
    val_batches = config.train.get("val_batches", 16)
    # train.ckpt_sharded: per-shard directory checkpoints (no gather — the
    # scale path for TP/PP/FSDP/EP meshes); train.ckpt_async: serialize +
    # fsync off-thread so the loop only blocks on the device->host copy.
    ckpt_sharded = bool(config.train.get("ckpt_sharded", False))
    async_ckpt = None
    if config.train.get("ckpt_async", False) and not ckpt_sharded:
        from moldiff_tpu.train.checkpoint_sharded import AsyncCheckpointer

        async_ckpt = AsyncCheckpointer()

    from moldiff_tpu.utils.profiling import StepTimer, trace

    timer = StepTimer()
    n_errors = 0
    t0 = time.time()
    for it in range(int(state.step) + 1, max_iters + 1):
        if args.profile_at and it == args.profile_at:
            with trace(os.path.join(log_dir, "profile")):
                for _ in range(5):
                    batch = next(train_loader)
                    key, k = jax.random.split(key)
                    state, aux = trainer.train_step(state, batch, k)
                jax.block_until_ready(aux["loss"])
            logger.info(f"profiler trace written to {log_dir}/profile")
            continue
        batch = next(train_loader)
        key, k = jax.random.split(key)
        try:
            state, aux = trainer.train_step(state, batch, k)
        except Exception as e:  # skip-and-continue (reference
            # scripts/train_drug3d.py:169-173 skips RuntimeError iters)
            n_errors += 1
            logger.warning(f"[it {it}] step error ({type(e).__name__}: {e}); "
                           f"skipping ({n_errors} total)")
            if n_errors > 50:
                raise
            continue
        timer.tick()

        if it % 100 == 0 or it == 1:
            dt = time.time() - t0
            sps = 100 / dt if it > 1 else 1 / dt
            t0 = time.time()
            logger.info(
                f"[it {it}] loss {float(aux['loss']):.4f} "
                f"(pos {float(aux['loss_pos']):.4f} node {float(aux['loss_node']):.4f} "
                f"edge {float(aux['loss_edge']):.4f}) "
                f"| grad {float(aux['grad_norm']):.2f} "
                f"| lr {get_lr(state.opt_state):.2e} | {sps:.2f} it/s"
            )
            for tag in ("loss", "loss_pos", "loss_node", "loss_edge", "grad_norm"):
                writer.add_scalar(f"train/{tag}", float(aux[tag]), it)
            # optional loss terms (bond_len_loss, v0_ce_scale, MoE aux)
            for tag in ("loss_len", "loss_v0ce", "loss_moe"):
                if tag in aux:
                    writer.add_scalar(f"train/{tag}", float(aux[tag]), it)
            writer.add_scalar("train/lr", get_lr(state.opt_state), it)
            writer.add_scalar("train/steps_per_sec", sps, it)

        if it % val_freq == 0:
            val_loader = BucketedLoader(
                val_subset, featurizer, config.train.batch_size, buckets,
                shuffle=False, infinite=False, drop_last=False, prefetch=0,
            )
            losses = []
            for vb, vbatch in enumerate(val_loader):
                if vb >= val_batches:
                    break
                key, k = jax.random.split(key)
                vaux = trainer.eval_step(state.params, vbatch, k)
                losses.append(float(vaux["loss"]))
            val_loss = float(np.mean(losses)) if losses else float("nan")
            state = trainer.scheduler_step(state, val_loss)
            logger.info(f"[val {it}] loss {val_loss:.4f}")
            writer.add_scalar("val/loss", val_loss, it)

        if it % ckpt_freq == 0 or it == max_iters:
            path = os.path.join(ckpt_dir, f"{it}.ckpt")
            if ckpt_sharded:
                from moldiff_tpu.train.checkpoint_sharded import (
                    save_checkpoint_sharded,
                )

                save_checkpoint_sharded(path, state, model_config=config,
                                        scheduler=trainer.scheduler, key=key)
            elif async_ckpt is not None:
                async_ckpt.save(path, state, model_config=config,
                                scheduler=trainer.scheduler, key=key)
            else:
                trainer.save_checkpoint(path, state, model_config=config, key=key)
            logger.info(f"saved {path}")
            # train.keep_ckpts: retain only the K newest numeric checkpoints
            # (0/absent = keep all, the reference behavior)
            from moldiff_tpu.train.trainer import prune_checkpoints

            prune_checkpoints(ckpt_dir, int(config.train.get("keep_ckpts", 0) or 0))

    if async_ckpt is not None:
        async_ckpt.wait()
    logger.info("done")
    return log_dir


if __name__ == "__main__":
    main()
