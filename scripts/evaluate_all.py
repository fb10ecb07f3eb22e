"""Evaluate generated molecules (or a dataset split) across all metric
families (TPU-framework analogue of `/root/reference/scripts/evaluate_all.py`).

Usage:
  # generated samples dir (output of sample_drug3d.py)
  python scripts/evaluate_all.py --from_where generated --root <out_dir>

  # dataset split (reference-style root with sdf/ + split)
  python scripts/evaluate_all.py --from_where dataset \
      --dataset_root <root> --split test

  # bare SMILES list (one per line; 2D families only — no conformers)
  python scripts/evaluate_all.py --from_where smiles --root SMILES.txt

Writes mols.csv (per-mol metrics), validity.json, similarity.json (when a
dataset is given for reference sets), local3d.pkl, freq_ring_type.pkl.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from moldiff_tpu.chem.mol import Mol, MolError
from moldiff_tpu.chem.sanitize import sanitize
from moldiff_tpu.chem.sdf import read_sdf
from moldiff_tpu.data.dataset import get_dataset
from moldiff_tpu.eval.local3d import Local3D
from moldiff_tpu.eval.metrics import RingAnalyzer, calculate_validity, get_metric
from moldiff_tpu.eval.similarity import SimilarityAnalysis
from moldiff_tpu.utils.config import Config
from moldiff_tpu.utils.misc import get_logger


def load_generated(root: str):
    """Load mols from a sample_drug3d output dir (SDF/*.sdf +
    samples_all.pkl for the validity pools)."""
    mols = []
    for fn in sorted(glob.glob(os.path.join(root, "SDF", "*.sdf"))):
        for m in read_sdf(fn):
            if m is None:
                continue
            try:
                sanitize(m)
                mols.append(m)
            except MolError:
                pass
    decoded = []
    pkl = os.path.join(root, "samples_all.pkl")
    if os.path.exists(pkl):
        with open(pkl, "rb") as f:
            blob = pickle.load(f)
        decoded = [e["decoded"] for e in blob.get("finished", [])] + [
            e["decoded"] for e in blob.get("failed", [])
        ]
    return mols, decoded


def load_smiles_file(path: str, limit=None):
    """One SMILES per line (optionally followed by a name) -> sanitized
    Mols; unparseable lines are skipped with a count."""
    from moldiff_tpu.chem.smiles import SmilesError, mol_from_smiles

    mols, skipped = [], 0
    with open(path) as f:
        for line in f:
            token = line.split()[0] if line.split() else ""
            if not token:
                continue
            try:
                mols.append(mol_from_smiles(token))
            except (SmilesError, MolError):
                skipped += 1
            if limit and len(mols) >= limit:
                break
    return mols, skipped


def load_dataset_mols(dataset_root: str, split: str, limit=None):
    cfg = Config({
        "root": dataset_root,
        "path_dict": {"sdf": "sdf", "summary": "mol_summary.csv",
                      "processed": "processed.mdb"},
        "split": "split_by_molid.pkl",
    })
    _, subsets = get_dataset(cfg)
    subset = subsets.get(split) or subsets["train"]
    mols = []
    n = len(subset) if limit is None else min(limit, len(subset))
    for i in range(n):
        rec = subset[i]
        mol = Mol.from_arrays(
            rec["element"], rec["pos"][0], rec["bond_index"], rec["bond_type"]
        )
        try:
            sanitize(mol)
            mols.append(mol)
        except MolError:
            pass
    return mols


def main(argv=None):
    from moldiff_tpu.utils.misc import force_platform_from_env
    force_platform_from_env()  # honor JAX_PLATFORMS despite sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--from_where", choices=["generated", "dataset", "smiles"],
                    default="generated")
    ap.add_argument("--root", default=None, help="generated samples dir")
    ap.add_argument("--dataset_root", default=None)
    ap.add_argument("--split", default="test")
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--parallel", action="store_true")
    ap.add_argument("--global3d", action="store_true",
                    help="also compute the (slow) re-embedding RMSD family")
    ap.add_argument("--force", action="store_true",
                    help="recompute even if mols.csv already exists "
                         "(the reference caches dataset-split metrics)")
    args = ap.parse_args(argv)

    if args.from_where == "generated":
        assert args.root, "--root required for generated"
        out_dir = args.outdir or os.path.join(args.root, "metrics")
        mols, decoded = load_generated(args.root)
    elif args.from_where == "smiles":
        assert args.root, "--root (SMILES file) required for smiles"
        out_dir = args.outdir or os.path.join(
            os.path.dirname(os.path.abspath(args.root)), "metrics_smiles"
        )
        mols, n_skipped = load_smiles_file(args.root, args.limit)
        decoded = []
    else:
        assert args.dataset_root, "--dataset_root required for dataset"
        out_dir = args.outdir or os.path.join(
            args.dataset_root, "metrics", args.split
        )
        mols = load_dataset_mols(args.dataset_root, args.split, args.limit)
        decoded = []
    os.makedirs(out_dir, exist_ok=True)
    logger = get_logger("evaluate", out_dir)
    if (not args.force and args.from_where == "dataset"
            and os.path.exists(os.path.join(out_dir, "mols.csv"))):
        logger.info(f"cached metrics exist at {out_dir} (use --force to redo)")
        return out_dir
    logger.info(f"evaluating {len(mols)} molecules -> {out_dir}")

    # per-mol dataframe metrics
    rows = [dict() for _ in mols]
    families = ["drug_chem", "count_prop", "frags_counts", "groups_counts",
                "ring_topo"]
    if args.global3d and args.from_where != "smiles":
        families.append("global_3d")
    for family in families:
        for r, d in zip(rows, get_metric(mols, family, parallel=args.parallel)):
            r.update(d)
    df = pd.DataFrame(rows).fillna(0)
    df.to_csv(os.path.join(out_dir, "mols.csv"), index=False)
    logger.info(f"mols.csv: {df.shape}")

    # local 3d distributions (needs conformers; SMILES input has none)
    if args.from_where == "smiles":
        with open(os.path.join(out_dir, "local3d.pkl"), "wb") as f:
            pickle.dump(None, f)
        rings, counts = RingAnalyzer().get_freq_rings(mols, topk=10)
        with open(os.path.join(out_dir, "freq_ring_type.pkl"), "wb") as f:
            pickle.dump({"rings": rings, "counts": counts}, f)
        logger.info(f"top rings: {list(zip(rings, counts))[:5]}")
        return out_dir
    l3d = Local3D()
    l3d.get_predefined()
    local3d = {
        "length": l3d.calc_frequent(mols, "length"),
        "angle": l3d.calc_frequent(mols, "angle"),
        "dihedral": l3d.calc_frequent(mols, "dihedral"),
    }
    with open(os.path.join(out_dir, "local3d.pkl"), "wb") as f:
        pickle.dump(local3d, f)

    # validity (generated only: needs raw decoded outputs incl. failures).
    # Acceptance semantics must match the run that produced the pool
    # (summary.json carries its sanitize_mode) or validity.json silently
    # disagrees with summary.json in the same evidence file.
    if decoded:
        sanitize_mode = "reference"
        summary_path = os.path.join(args.root, "summary.json")
        if os.path.exists(summary_path):
            with open(summary_path) as f:
                sanitize_mode = json.load(f).get(
                    "sanitize_mode", sanitize_mode) or sanitize_mode
        validity = calculate_validity(decoded, sanitize_mode=sanitize_mode)
        with open(os.path.join(out_dir, "validity.json"), "w") as f:
            json.dump(validity, f, indent=2)
        logger.info(f"validity: {validity}")

    # similarity vs train/val (needs dataset root)
    if args.dataset_root and args.from_where == "generated":
        train = load_dataset_mols(args.dataset_root, "train", args.limit)
        val = load_dataset_mols(args.dataset_root, "val", args.limit)
        sim = SimilarityAnalysis(train_mols=train, val_mols=val)
        simm = sim.all_metrics(mols)
        with open(os.path.join(out_dir, "similarity.json"), "w") as f:
            json.dump(simm, f, indent=2)
        logger.info(f"similarity: {simm}")

    # frequent ring types
    rings, counts = RingAnalyzer().get_freq_rings(mols, topk=10)
    with open(os.path.join(out_dir, "freq_ring_type.pkl"), "wb") as f:
        pickle.dump({"rings": rings, "counts": counts}, f)
    logger.info(f"top rings: {list(zip(rings, counts))[:5]}")
    return out_dir


if __name__ == "__main__":
    main()
