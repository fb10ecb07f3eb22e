"""Fit the SA-score fragment-commonality table from a dataset.

The reference ships RDKit's precomputed fpscores table
(`/root/reference/utils/fpscores.pkl.gz`); this framework's SA scorer
(eval/sa_score.py) instead fits its table from any molecule corpus — run
this once per dataset and pass the output to evaluation.

Usage:
  python scripts/build_fragment_scores.py --dataset_root ./data/geom_drug \
      [--split train] [--limit 50000] --output fragment_scores.pkl
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moldiff_tpu.chem.mol import Mol, MolError
from moldiff_tpu.chem.sanitize import sanitize
from moldiff_tpu.data.dataset import get_dataset
from moldiff_tpu.eval.sa_score import FragmentScorer
from moldiff_tpu.utils.config import Config


def main(argv=None):
    from moldiff_tpu.utils.misc import force_platform_from_env
    force_platform_from_env()  # honor JAX_PLATFORMS despite sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--output", default="fragment_scores.pkl")
    args = ap.parse_args(argv)

    cfg = Config({
        "root": args.dataset_root,
        "path_dict": {"sdf": "sdf", "summary": "mol_summary.csv",
                      "processed": "processed.mdb"},
        "split": "split_by_molid.pkl",
    })
    _, subsets = get_dataset(cfg)
    subset = subsets.get(args.split) or subsets["train"]
    n = len(subset) if args.limit is None else min(args.limit, len(subset))

    def mols():
        for i in range(n):
            rec = subset[i]
            try:
                m = Mol.from_arrays(rec["element"], rec["pos"][0],
                                    rec["bond_index"], rec["bond_type"])
                sanitize(m)
                yield m
            except MolError:
                continue

    scorer = FragmentScorer.fit(mols())
    scorer.save(args.output)
    print(f"fit {len(scorer.scores)} fragment scores from {n} molecules "
          f"-> {args.output}")
    return args.output


if __name__ == "__main__":
    main()
