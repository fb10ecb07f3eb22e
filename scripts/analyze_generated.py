"""Aggregate per-method metrics into a JSD-vs-test comparison table.

Script replacement for the reference's analysis notebook
(`/root/reference/scripts/analyze_generated.ipynb`): loads the metric
outputs of `evaluate_all.py` for a reference split ('test') and one or more
generated-method dirs, computes JSDs (bond lengths @0.02 A, angles/dihedrals
@5 deg, count distributions, bond types, ring sizes, top-10 ring
intersection) and writes `metrics_all_methods.csv`.

Usage:
  python scripts/analyze_generated.py --ref <metrics_dir_of_test_split> \
      --methods name1=<metrics_dir> [name2=<dir> ...] --out metrics_all.csv
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from moldiff_tpu.eval.jsd import counter_jsd, hist_jsd, local3d_jsd


def load_metrics_dir(d: str) -> dict:
    out = {}
    csv = os.path.join(d, "mols.csv")
    if os.path.exists(csv):
        out["df"] = pd.read_csv(csv)
    l3d = os.path.join(d, "local3d.pkl")
    if os.path.exists(l3d):
        with open(l3d, "rb") as f:
            out["local3d"] = pickle.load(f)
    rings = os.path.join(d, "freq_ring_type.pkl")
    if os.path.exists(rings):
        with open(rings, "rb") as f:
            out["rings"] = pickle.load(f)
    val = os.path.join(d, "validity.json")
    if os.path.exists(val):
        import json

        with open(val) as f:
            out["validity"] = json.load(f)
    return out


def _col_counts(df: pd.DataFrame, prefix: str) -> dict:
    cols = [c for c in df.columns if c.startswith(prefix)]
    return {c[len(prefix):]: float(df[c].sum()) for c in cols}


def compare(ref: dict, gen: dict) -> dict:
    row = {}
    rdf, gdf = ref.get("df"), gen.get("df")
    if rdf is not None and gdf is not None:
        # discrete count-property JSDs (notebook cells 43-61)
        for col in ("n_atoms", "n_bonds", "n_rings", "n_rotatable",
                    "n_hacc", "n_hdon"):
            if col in rdf and col in gdf:
                row[f"jsd_{col}"] = hist_jsd(gdf[col].values, rdf[col].values,
                                             discrete=True)
        # element / bond-type distribution JSDs (cell 31)
        row["jsd_elem"] = counter_jsd(
            _col_counts(gdf, "elem_"), _col_counts(rdf, "elem_")
        )
        row["jsd_bond_type"] = counter_jsd(
            _col_counts(gdf, "bond_"), _col_counts(rdf, "bond_")
        )
        # ring-size distribution JSD (cell 73)
        row["jsd_ring_size"] = counter_jsd(
            _col_counts(gdf, "ring_size_"), _col_counts(rdf, "ring_size_")
        )
        # drug-chem means
        for col in ("qed", "sa", "logp", "lipinski"):
            if col in gdf:
                row[f"mean_{col}"] = float(gdf[col].mean())
    # local 3D JSDs (cells 12-13)
    if "local3d" in ref and "local3d" in gen:
        for type_ in ("length", "angle", "dihedral"):
            jsds = local3d_jsd(gen["local3d"][type_], ref["local3d"][type_], type_)
            row[f"jsd_{type_}_mean"] = jsds["_mean"]
    # top-10 ring intersection (cell 81)
    if "rings" in ref and "rings" in gen:
        r = set(ref["rings"]["rings"][:10])
        g = set(gen["rings"]["rings"][:10])
        row["ring_top10_intersection"] = len(r & g)
    if "validity" in gen:
        row.update({f"v_{k}": v for k, v in gen["validity"].items()
                    if isinstance(v, (int, float))})
    return row


def main(argv=None):
    from moldiff_tpu.utils.misc import force_platform_from_env
    force_platform_from_env()  # honor JAX_PLATFORMS despite sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True, help="metrics dir of the test split")
    ap.add_argument("--methods", nargs="+", required=True,
                    help="name=metrics_dir pairs")
    ap.add_argument("--out", default="metrics_all_methods.csv")
    args = ap.parse_args(argv)

    ref = load_metrics_dir(args.ref)
    rows = {}
    for spec in args.methods:
        name, d = spec.split("=", 1)
        rows[name] = compare(ref, load_metrics_dir(d))
    df = pd.DataFrame(rows).T
    df.to_csv(args.out)
    print(df.to_string())
    return args.out


if __name__ == "__main__":
    main()
