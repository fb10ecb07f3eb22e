"""Strip a training checkpoint down to a distribution checkpoint.

Training checkpoints carry optimizer state (2x params for adam), the
scheduler, and the PRNG key so runs can resume exactly
(train/trainer.py:save_checkpoint). None of that is needed for sampling,
serving, or evaluation — the sample CLI reads only {config, params,
ema_params, step} (scripts/sample_drug3d.py:127-148). This tool drops the
resume-only fields (~3x size cut), optionally keeps only the EMA weights,
and optionally casts to float16 for distribution.

Mirrors the "publish a checkpoint" step users of the reference perform by
hand on its {'config','model','optimizer','scheduler','iteration'} dicts
(/root/reference/scripts/train_drug3d.py:176-183).

Usage:
  python scripts/strip_checkpoint.py in.ckpt out.ckpt [--ema_only] [--f16]
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def strip_checkpoint(ckpt: dict, ema_only: bool = False, f16: bool = False) -> dict:
    """Return the distribution subset of a training checkpoint dict."""
    params = ckpt["params"]
    ema = ckpt.get("ema_params")
    if ema_only:
        if ema is None:
            raise SystemExit("--ema_only: checkpoint has no ema_params")
        params, ema = ema, None

    def cast(tree):
        if tree is None or not f16:
            return tree
        import jax

        return jax.tree.map(
            lambda x: x.astype(np.float16)
            if isinstance(x, np.ndarray) and x.dtype == np.float32 else x,
            tree,
        )

    return {
        "config": ckpt["config"],
        "params": cast(params),
        "ema_params": cast(ema),
        "step": int(ckpt["step"]),
        "opt_state": None,
        "scheduler": None,
        "key": None,
        "extra": ckpt.get("extra"),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--ema_only", action="store_true",
                    help="keep only the EMA weights (as 'params')")
    ap.add_argument("--f16", action="store_true",
                    help="store float32 weights as float16 (halves size; "
                         "loaders upcast on device_put)")
    args = ap.parse_args(argv)

    from moldiff_tpu.train.trainer import load_checkpoint

    blob = strip_checkpoint(load_checkpoint(args.src),
                            ema_only=args.ema_only, f16=args.f16)
    tmp = args.dst + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, args.dst)
    print(f"{args.src} -> {args.dst}: "
          f"{os.path.getsize(args.src)/1e6:.1f} MB -> "
          f"{os.path.getsize(args.dst)/1e6:.1f} MB (step {blob['step']})")


if __name__ == "__main__":
    main()
