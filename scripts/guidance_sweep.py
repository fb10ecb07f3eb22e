"""Guidance-scale sweep: one denoiser/bond-predictor checkpoint pair, many
guidance scales, success rates with Wilson CIs and failure-mode histograms.

The guidance scale is a runtime argument of the compiled chain
(moldiff_tpu/sample/pipeline.py set_guidance_scale), so the whole sweep pays
ONE guided compile. Reference guidance: /root/reference/models/model.py:309-362,
configs/sample/sample_MolDiff.yml (uncertainty, 1e-4).

Usage:
  python scripts/guidance_sweep.py --ckpt logs/.../20000.ckpt \
      --bp_ckpt logs/.../80000.ckpt --scales 1e-5,3e-5,1e-4,3e-4 \
      [--mode uncertainty] [--num_mols 1000] [--out sweep.json]
"""
from __future__ import annotations

import argparse
import collections
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def wilson_ci(k: int, n: int, z: float = 1.96):
    """95% Wilson score interval for a binomial proportion."""
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return (max(0.0, center - half), min(1.0, center + half))


def run_pool(sampler, params, num_mols, seed, logger=None, geom_ref=None):
    import jax

    from moldiff_tpu.eval.failure_analysis import analyze_pool

    pool = sampler.generate(
        params, num_mols, jax.random.key(seed),
        rng=np.random.default_rng(seed), logger=logger,
    )
    out = analyze_pool(pool)
    lo, hi = wilson_ci(out["finished"], out["finished"] + out["failed"])
    out["ci95"] = [round(lo, 4), round(hi, 4)]
    if geom_ref is not None:
        out["geometry_jsd"] = geometry_jsd(
            [e["mol"] for e in pool["finished"]], geom_ref
        )
    return out


def geometry_reference(dataset_root: str, limit: int = 500):
    """Bond-length distributions of the dataset test split (Local3D
    predefined bond patterns, reference analyze_generated.ipynb cell 12)."""
    from moldiff_tpu.chem.mol import Mol, MolError
    from moldiff_tpu.chem.sanitize import sanitize
    from moldiff_tpu.data.dataset import get_dataset
    from moldiff_tpu.eval.local3d import Local3D
    from moldiff_tpu.utils.config import Config

    cfg = Config({
        "root": dataset_root,
        "path_dict": {"sdf": "sdf", "summary": "mol_summary.csv",
                      "processed": "processed.mdb"},
        "split": "split_by_molid.pkl",
    })
    _, subsets = get_dataset(cfg)
    subset = subsets.get("test") or subsets["train"]
    mols = []
    for i in range(min(limit, len(subset))):
        rec = subset[i]
        try:
            m = Mol.from_arrays(rec["element"], rec["pos"][0],
                                rec["bond_index"], rec["bond_type"])
            sanitize(m)
            mols.append(m)
        except MolError:
            continue
    l3d = Local3D()
    l3d.get_predefined()
    return l3d, l3d.calc_frequent(mols, "length")


def geometry_jsd(mols, geom_ref) -> dict:
    """Mean bond-length JSD vs the test split over the predefined bond
    patterns (0.02 A bins, the reference notebook's protocol)."""
    from moldiff_tpu.eval.jsd import hist_jsd

    l3d, ref_lengths = geom_ref
    gen_lengths = l3d.calc_frequent(mols, "length")
    per_pattern = {}
    for pat, ref_vals in ref_lengths.items():
        gv = gen_lengths.get(pat)
        if gv is None or len(gv) < 10 or len(ref_vals) < 10:
            continue
        per_pattern[pat] = round(hist_jsd(gv, ref_vals, bin_width=0.02), 4)
    mean = (sum(per_pattern.values()) / len(per_pattern)) if per_pattern else None
    return {"mean_bond_length_jsd": round(mean, 4) if mean is not None else None,
            "n_patterns": len(per_pattern), "per_pattern": per_pattern}


def main(argv=None):
    from moldiff_tpu.utils.misc import force_platform_from_env
    force_platform_from_env()  # honor JAX_PLATFORMS despite sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--bp_ckpt", required=True)
    ap.add_argument("--mode", default="uncertainty")
    ap.add_argument("--scales", default="1e-5,3e-5,1e-4")
    ap.add_argument("--num_mols", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=2023)
    ap.add_argument("--size_mean", type=float, default=18.0)
    ap.add_argument("--size_std", type=float, default=5.0)
    ap.add_argument("--skip_unguided", action="store_true")
    ap.add_argument("--use_ema", action="store_true",
                    help="use the checkpoint's EMA weights")
    ap.add_argument("--num_steps", type=int, default=None,
                    help="respaced reverse chain on S evenly-spaced steps")
    ap.add_argument("--add_edge", choices=["distance"], default=None,
                    help="perceive bonds from distances (reference 'edm' "
                         "path) — makes success purely geometric, the regime "
                         "where position-space guidance can win")
    ap.add_argument("--dataset_root", default=None,
                    help="when set, also report bond-length JSD vs the test "
                         "split per run (0.02 A bins)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    from moldiff_tpu.models.bond_predictor import BondPredictor
    from moldiff_tpu.models.moldiff import MolDiff
    from moldiff_tpu.sample.pipeline import MolSampler
    from moldiff_tpu.train.trainer import load_checkpoint
    from moldiff_tpu.utils.config import Config
    from moldiff_tpu.utils.misc import get_logger
    from sample_drug3d import featurizer_from_config

    logger = get_logger("sweep")
    ckpt = load_checkpoint(args.ckpt)
    if args.use_ema:
        assert ckpt.get("ema_params") is not None, "checkpoint has no EMA"
        ckpt["params"] = ckpt["ema_params"]
    train_config = Config(ckpt["config"])
    train_config.model.denoiser["remat"] = False
    featurizer = featurizer_from_config(train_config)
    model = MolDiff(train_config.model,
                    num_node_types=featurizer.num_node_types,
                    num_edge_types=featurizer.num_edge_types)
    params = jax.device_put(ckpt["params"])

    bp_ckpt = load_checkpoint(args.bp_ckpt)
    bp_config = Config(bp_ckpt["config"])
    bp_config.model.encoder["remat"] = True
    bp = BondPredictor(bp_config.model,
                       num_node_types=featurizer.num_node_types,
                       num_edge_types=featurizer.num_bond_types + 1)
    bond_predictor = (bp, jax.device_put(bp_ckpt["params"]))

    T = args.num_steps or model.num_timesteps
    chunk = next(c for c in (100, 50, 25, 20, 10, 5, 1) if T % c == 0)
    common = dict(batch_size=args.batch_size, size_mean=args.size_mean,
                  size_std=args.size_std, add_edge=args.add_edge,
                  num_steps=args.num_steps)
    results = {"ckpt": args.ckpt, "bp_ckpt": args.bp_ckpt,
               "ckpt_step": ckpt["step"], "mode": args.mode,
               "num_mols": args.num_mols, "seed": args.seed,
               "num_steps": args.num_steps, "runs": {}}
    geom_ref = None
    if args.dataset_root:
        geom_ref = geometry_reference(args.dataset_root)
        logger.info("geometry reference ready (test-split bond lengths)")

    if not args.skip_unguided:
        t0 = time.time()
        sampler = MolSampler(model, featurizer, **common)
        r = run_pool(sampler, params, args.num_mols, args.seed, logger,
                     geom_ref=geom_ref)
        r["wall_s"] = round(time.time() - t0, 1)
        results["runs"]["unguided"] = r
        logger.info(f"unguided: {r}")

    scales = [float(s) for s in args.scales.split(",") if s]
    sampler = MolSampler(
        model, featurizer, bond_predictor=bond_predictor,
        guidance=(args.mode, scales[0]), chunk_steps=chunk, **common,
    )
    for s in scales:
        sampler.set_guidance_scale(s)
        t0 = time.time()
        r = run_pool(sampler, params, args.num_mols, args.seed, logger,
                     geom_ref=geom_ref)
        r["wall_s"] = round(time.time() - t0, 1)
        results["runs"][f"{args.mode}@{s:g}"] = r
        logger.info(f"{args.mode}@{s:g}: {r}")

    out = args.out or f"sweep_{os.path.basename(args.ckpt)}.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    logger.info(f"wrote {out}")
    # markdown summary
    print("\n| setting | success | 95% CI | failures |")
    print("|---|---|---|---|")
    for name, r in results["runs"].items():
        print(f"| {name} | {r['success']:.3f} | [{r['ci95'][0]:.3f}, "
              f"{r['ci95'][1]:.3f}] | {r['failure_modes']} |")
    return results


if __name__ == "__main__":
    main()
