"""Convert a reference (PyTorch) MolDiff/BondPredictor checkpoint to this
framework's checkpoint format.

Usage:
  python scripts/convert_reference_ckpt.py --input ckpt/MolDiff.pt \
      --output ckpt/MolDiff.ckpt [--kind moldiff|bondpred]
  python scripts/convert_reference_ckpt.py --reverse \
      --input logs/<run>/checkpoints/110000.ckpt --output MolDiff_export.pt

The converted checkpoint drops optimizer state (sampling/eval only — resume
training from it with a fresh optimizer if needed). --reverse exports one
of OUR checkpoints back to the reference torch format ({'config','model',
'iteration'}): a reference models/model.py MolDiff built from the same
config loads it with load_state_dict(..., strict=False) (schedule/smearing
constants are rebuilt from the config; every trainable tensor is carried).
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    from moldiff_tpu.utils.misc import force_platform_from_env
    force_platform_from_env()  # honor JAX_PLATFORMS despite sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="reference .pt checkpoint")
    ap.add_argument("--output", required=True)
    ap.add_argument("--kind", choices=["moldiff", "bondpred"], default="moldiff")
    ap.add_argument("--reverse", action="store_true",
                    help="export OUR .ckpt to the reference torch .pt format")
    ap.add_argument("--use_ema", action="store_true",
                    help="with --reverse: export the EMA weights")
    args = ap.parse_args(argv)
    if args.reverse:
        return export_to_reference(args)

    import jax

    from moldiff_tpu.utils.convert import (
        convert_bond_predictor_state_dict,
        convert_moldiff_state_dict,
        load_reference_checkpoint,
    )

    sd, config = load_reference_checkpoint(args.input)
    model_cfg = config.model if "model" in config else config
    if args.kind == "moldiff":
        params = convert_moldiff_state_dict(sd, model_cfg)
    else:
        params = convert_bond_predictor_state_dict(sd, model_cfg)

    blob = {
        "config": config.to_dict(),
        "params": jax.tree.map(np.asarray, jax.device_get(params)),
        "opt_state": None,
        "step": int(sd.get("iteration", 0)) if not hasattr(
            sd.get("iteration", 0), "shape") else 0,
        "scheduler": None,
        "key": None,
        "extra": {"converted_from": os.path.abspath(args.input)},
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"converted {args.input} -> {args.output} ({n_params/1e6:.2f}M params)")
    return args.output


def export_to_reference(args):
    import torch

    from moldiff_tpu.train.trainer import load_checkpoint
    from moldiff_tpu.utils.convert import (
        export_bond_predictor_state_dict,
        export_moldiff_state_dict,
    )

    blob = load_checkpoint(args.input)
    if args.use_ema:
        if blob.get("ema_params") is None:
            raise SystemExit("--use_ema: checkpoint has no ema_params")
        params = blob["ema_params"]
    else:
        params = blob["params"]
    if args.kind == "moldiff":
        sd = export_moldiff_state_dict(params)
    else:
        sd = export_bond_predictor_state_dict(params)
    out = {
        "config": blob["config"],
        "model": {k: torch.from_numpy(v) for k, v in sd.items()},
        "iteration": int(blob.get("step", 0) or 0),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    torch.save(out, args.output)
    n = sum(v.size for v in sd.values())
    print(f"exported {args.input} -> {args.output} ({n/1e6:.2f}M params, "
          f"{'EMA' if args.use_ema else 'raw'} weights)")
    return args.output


if __name__ == "__main__":
    main()
