"""Convert a reference (PyTorch) MolDiff/BondPredictor checkpoint to this
framework's checkpoint format.

Usage:
  python scripts/convert_reference_ckpt.py --input ckpt/MolDiff.pt \
      --output ckpt/MolDiff.ckpt [--kind moldiff|bondpred]

The converted checkpoint drops optimizer state (sampling/eval only — resume
training from it with a fresh optimizer if needed).
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
    args = ap.parse_args(argv)

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


if __name__ == "__main__":
    main()
