"""End-to-end quality soak: newest trained checkpoints -> sample (unguided
and guided) -> evaluate -> one-line summaries.

Automates the manual chain used for the round quality numbers:
  train_drug3d / train_bond (done beforehand)
  -> sample_drug3d (configs written on the fly pointing at newest ckpts)
  -> evaluate_all on each output dir and on the dataset test split
  -> print validity/success/uniqueness/novelty/diversity summary.

Usage:
  python scripts/quality_soak.py --logdir ./logs_demo \
      --dataset_root ./data/synthetic_full [--num_mols 1000] [--no_guided]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def newest_ckpt(logdir: str, prefix: str) -> str:
    # a direct checkpoint path (the committed distribution ckpts, e.g.
    # ckpts/flagship_v2.ckpt) bypasses the run-dir glob — training run dirs
    # (logs*/) are gitignored and do not survive session resets
    direct = prefix if os.path.isabs(prefix) else os.path.join(logdir, prefix)
    if prefix.endswith(".ckpt") and os.path.exists(direct):
        return direct

    def key(p):
        # mtime first; iteration number breaks ties. Non-numeric names
        # (best.ckpt, final.ckpt) fall back to mtime-only ordering.
        stem = os.path.splitext(os.path.basename(p))[0]
        it = int(stem) if stem.isdigit() else -1
        return (os.path.getmtime(p), it)

    pats = sorted(
        glob.glob(os.path.join(logdir, f"{prefix}*", "checkpoints", "*.ckpt")),
        key=key,
    )
    if not pats:
        raise FileNotFoundError(f"no checkpoints under {logdir}/{prefix}*")
    return pats[-1]


def write_sample_config(path, ckpt, bp_ckpt=None, guidance=None,
                        num_mols=1000, batch_size=128, seed=2023,
                        size_mean=18.0, size_std=5.0, use_ema=False,
                        num_steps=None, pos_sampler=None, eta=None,
                        num_steps_gamma=None, recon_workers=None,
                        sanitize_mode=None, add_edge=None, commit=None,
                        edge_guidance=None, edge_guidance_tmax=None):
    import yaml

    cfg = {
        "model": {"checkpoint": ckpt},
        "sample": {
            "seed": seed, "batch_size": batch_size, "num_mols": num_mols,
            "save_traj_prob": 0.0,
            "size_mean": size_mean, "size_std": size_std,
            "use_ema": use_ema,
            **({"num_steps": int(num_steps)} if num_steps else {}),
            **({"pos_sampler": pos_sampler} if pos_sampler else {}),
            **({"eta": float(eta)} if eta is not None else {}),
            **({"num_steps_gamma": float(num_steps_gamma)}
               if num_steps_gamma else {}),
            **({"recon_workers": int(recon_workers)}
               if recon_workers else {}),
            **({"sanitize_mode": sanitize_mode} if sanitize_mode else {}),
            **({"add_edge": add_edge} if add_edge else {}),
            **({"commit": commit} if commit else {}),
            **({"edge_guidance": float(edge_guidance)}
               if edge_guidance else {}),
            **({"edge_guidance_tmax": int(edge_guidance_tmax)}
               if edge_guidance_tmax else {}),
            # two buckets only: every bucket a drawn size lands in costs a
            # cold ~8-10 min chain compile (unguided AND guided variants) on
            # the axon tunnel; [32, 40] covers the full GEOM size range
            # (sizes clip at 40) at 2 compiles instead of 4-5, trading a
            # little padding throughput on small molecules
            "buckets": [32, 40],
        },
    }
    if bp_ckpt:
        cfg["bond_predictor"] = bp_ckpt
        if guidance:
            cfg["sample"]["guidance"] = list(guidance)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def main(argv=None):
    from moldiff_tpu.utils.misc import force_platform_from_env
    force_platform_from_env()  # honor JAX_PLATFORMS despite sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="./logs_demo")
    ap.add_argument("--denoiser_prefix", default="full_")
    ap.add_argument("--bp_prefix", default="bp_")
    ap.add_argument("--dataset_root", default="./data/synthetic_full")
    ap.add_argument("--outdir", default="./outputs_demo")
    ap.add_argument("--num_mols", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--no_guided", action="store_true")
    ap.add_argument("--no_unguided", action="store_true")
    ap.add_argument("--guidance_scale", type=float, default=1e-4)
    ap.add_argument("--use_ema", action="store_true",
                    help="sample from the checkpoint's EMA weights")
    ap.add_argument("--num_steps", type=int, default=None,
                    help="respaced reverse chain on S evenly-spaced steps")
    ap.add_argument("--pos_sampler", choices=["ddpm", "ddim"], default=None)
    ap.add_argument("--eta", type=float, default=None)
    ap.add_argument("--num_steps_gamma", type=float, default=None,
                    help="respacing warp: >1 densifies late denoising steps")
    ap.add_argument("--recon_workers", type=int, default=None,
                    help="parallel host-side reconstruction workers")
    ap.add_argument("--sanitize_mode", choices=["reference", "repo"],
                    default="reference",
                    help="acceptance semantics of the sanitize cascade")
    ap.add_argument("--commit", choices=["none", "nodes", "edges", "both"],
                    default=None,
                    help="carry-over unmasking mode for the categorical "
                         "chains (models/moldiff.py sample ``commit``)")
    ap.add_argument("--add_edge", choices=["distance", "connect"], default=None,
                    help="re-perceive bonds from distances (reference EDM "
                         "path) instead of the predicted bond types")
    ap.add_argument("--edge_guidance", type=float, default=None,
                    help="class-space bond guidance scale: mix the bond "
                         "predictor's log-probs into the edge v0 inside the "
                         "chain (works on the unguided leg too)")
    ap.add_argument("--edge_guidance_tmax", type=int, default=None,
                    help="apply edge guidance only at original timesteps "
                         "t < tmax (late chain); default every step")
    ap.add_argument("--size_mean", type=float, default=24.923,
                    help="sampled-size mean (GEOM-Drug stats, reference "
                         "utils/transforms.py:128)")
    ap.add_argument("--size_std", type=float, default=5.516)
    ap.add_argument("--evidence", default=None,
                    help="write ONE combined evidence JSON (success + stage "
                         "taxonomy + aromatic fraction + uniq/novelty/"
                         "diversity + JSD families) to this path")
    args = ap.parse_args(argv)

    from scripts.evaluate_all import main as evaluate_main
    from scripts.sample_drug3d import main as sample_main

    ckpt = newest_ckpt(args.logdir, args.denoiser_prefix)
    print(f"[soak] denoiser ckpt: {ckpt}")
    bp_ckpt = None
    if not args.no_guided or args.edge_guidance:
        try:
            bp_ckpt = newest_ckpt(args.logdir, args.bp_prefix)
            print(f"[soak] bond-predictor ckpt: {bp_ckpt}")
        except FileNotFoundError:
            print("[soak] no bond-predictor checkpoint; skipping guided run")

    os.makedirs(args.outdir, exist_ok=True)
    runs = []
    if not args.no_unguided:
        runs.append(("unguided", None))
    if bp_ckpt:
        runs.append(("guided", ("uncertainty", args.guidance_scale)))

    results = {}
    for name, guidance in runs:
        tag = f"{name}_ema" if args.use_ema else name
        if args.num_steps:
            tag += f"_s{args.num_steps}"
        if args.pos_sampler:
            tag += f"_{args.pos_sampler}"
        if args.num_steps_gamma:
            tag += f"_g{args.num_steps_gamma:g}"
        if args.add_edge:
            tag += "_edm"
        if args.commit:
            tag += f"_commit_{args.commit}"
        if args.edge_guidance:
            tag += f"_eg{args.edge_guidance:g}"
            if args.edge_guidance_tmax:
                tag += f"t{args.edge_guidance_tmax}"
        cfg_path = os.path.join(args.outdir, f"sample_{tag}.yml")
        write_sample_config(
            cfg_path, ckpt,
            bp_ckpt=bp_ckpt if (guidance or args.edge_guidance) else None,
            guidance=guidance, edge_guidance=args.edge_guidance,
            edge_guidance_tmax=args.edge_guidance_tmax,
            num_mols=args.num_mols, batch_size=args.batch_size,
            use_ema=args.use_ema, num_steps=args.num_steps,
            pos_sampler=args.pos_sampler, eta=args.eta,
            num_steps_gamma=args.num_steps_gamma,
            recon_workers=args.recon_workers,
            sanitize_mode=args.sanitize_mode, add_edge=args.add_edge,
            commit=args.commit,
            size_mean=args.size_mean, size_std=args.size_std,
        )
        t0 = time.time()
        out_dir = sample_main([
            "--config", cfg_path, "--outdir", args.outdir,
            "--run_name", f"soak_{tag}_{time.strftime('%Y%m%d_%H%M%S')}",
        ])
        dt = time.time() - t0
        print(f"[soak] {name}: sampled -> {out_dir} in {dt:.0f}s")
        evaluate_main([
            "--from_where", "generated", "--root", out_dir, "--parallel",
            # dataset root enables the similarity family (uniqueness/novelty/
            # sim_with_train/val/diversity) against cached split fingerprints
            "--dataset_root", args.dataset_root,
        ])
        results[name] = out_dir

    # dataset reference metrics (cached)
    evaluate_main([
        "--from_where", "dataset", "--dataset_root", args.dataset_root,
        "--split", "test", "--parallel",
    ])

    # ONE combined evidence JSON per soak (VERDICT r3 items 1/8): success +
    # sanitize-stage taxonomy + aromatic fraction (sample summary.json),
    # validity/uniqueness/novelty/diversity (evaluate_all), and the full JSD
    # family panel vs the dataset test split (analyze_generated.compare).
    from scripts.analyze_generated import compare, load_metrics_dir

    ref_metrics_dir = os.path.join(args.dataset_root, "metrics", "test")
    ref_metrics = (load_metrics_dir(ref_metrics_dir)
                   if os.path.isdir(ref_metrics_dir) else {})
    evidence = {
        "num_mols": args.num_mols,
        "sanitize_mode": args.sanitize_mode,
        "commit": args.commit,
        "size_mean": args.size_mean,
        "size_std": args.size_std,
        "dataset_root": args.dataset_root,
        "runs": {},
    }
    def _wilson(k, n, z=1.96):
        if n == 0:
            return (0.0, 0.0)
        p = k / n
        d = 1 + z * z / n
        c = p + z * z / (2 * n)
        h = z * ((p * (1 - p) + z * z / (4 * n)) / n) ** 0.5
        return ((c - h) / d, (c + h) / d)

    for name, out_dir in results.items():
        rec = {"out_dir": out_dir}
        for fname in ("summary.json",):
            path = os.path.join(out_dir, fname)
            if os.path.exists(path):
                with open(path) as f:
                    rec.update(json.load(f))
        for fname in ("validity.json", "similarity.json"):
            path = os.path.join(out_dir, "metrics", fname)
            if os.path.exists(path):
                with open(path) as f:
                    rec.update(json.load(f))
        if "num_finished" in rec and "num_failed" in rec:
            k, n = rec["num_finished"], rec["num_finished"] + rec["num_failed"]
            rec["success_wilson95"] = [round(x, 5) for x in _wilson(k, n)]
        if ref_metrics:
            rec["jsd_vs_test"] = compare(
                ref_metrics, load_metrics_dir(os.path.join(out_dir, "metrics"))
            )
        evidence["runs"][name] = rec
        print(f"[soak] {name}: {json.dumps(rec)}")
    if args.evidence:
        os.makedirs(os.path.dirname(os.path.abspath(args.evidence)),
                    exist_ok=True)
        with open(args.evidence, "w") as f:
            json.dump(evidence, f, indent=2)
        print(f"[soak] evidence -> {args.evidence}")
    print("[soak] done")


if __name__ == "__main__":
    main()
