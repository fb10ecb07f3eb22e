"""Render sampled molecules to a PNG grid (+ per-molecule text summaries).

User-facing analogue of the reference's notebook visualization helpers
(`/root/reference/utils/visualize.py`, py3Dmol/RDKit-draw).

Usage:
  python scripts/visualize_samples.py --root <sample_out_dir> [--n 16]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moldiff_tpu.chem.mol import MolError
from moldiff_tpu.chem.sanitize import sanitize
from moldiff_tpu.chem.sdf import read_sdf
from moldiff_tpu.eval.visualize import HAS_MPL, mol_summary_text, show_mols_grid


def main(argv=None):
    from moldiff_tpu.utils.misc import force_platform_from_env
    force_platform_from_env()  # honor JAX_PLATFORMS despite sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="sample_drug3d output dir")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    mols = []
    for fn in sorted(glob.glob(os.path.join(args.root, "SDF", "*.sdf"))):
        for m in read_sdf(fn):
            if m is None:
                continue
            try:
                sanitize(m)
                mols.append(m)
            except MolError:
                pass
        if len(mols) >= args.n:
            break
    if not mols:
        print("no valid molecules found", file=sys.stderr)
        return 1

    out = args.out or os.path.join(args.root, "samples_grid.png")
    if HAS_MPL and show_mols_grid(mols[: args.n], out):
        print(f"wrote {out} ({min(len(mols), args.n)} molecules)")
    else:
        print("matplotlib unavailable; text summaries:")
        for m in mols[: args.n]:
            print(mol_summary_text(m).splitlines()[0])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
