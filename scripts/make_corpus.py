"""Generate the canonical synthetic training corpora with PINNED seeds.

The image ships no GEOM-Drug data (reference downloads it via
`/root/reference/README.md` data section), so all quality numbers in
BASELINE.md / results/ are measured on first-party synthetic corpora
(moldiff_tpu/data/synthetic.py). This script is the committed, reproducible
recipe: running it on a fresh clone recreates byte-identical corpora
(generation is a single seeded np.random.Generator stream), so every
committed checkpoint + results JSON can be traced back to its exact data.

    python scripts/make_corpus.py full   # ./data/synthetic_full  24k mols, seed 2023
    python scripts/make_corpus.py xl     # ./data/synthetic_xl    96k mols, seed 2024
    python scripts/make_corpus.py demo   # ./data/synthetic        8k mols, seed 7
    python scripts/make_corpus.py full2  # ./data/synthetic_full2 24k v2 mols, seed 3023
    python scripts/make_corpus.py xl2    # ./data/synthetic_xl2   96k v2 mols, seed 3024

The *2 corpora use the v2 chemistry (data/synthetic_v2.py): aromatic ring
systems emitted as bond type 4, triple bonds, physical per-pattern bond
lengths and GEOM-Drug size statistics N(24.9, 5.5) — the round-4 quality
program (flagship v2 ladder + soaks) runs on these so kekulize/fix_aromatic
are exercised end-to-end.

Each corpus dir gets sdf/<molid>.sdf + mol_summary.csv + split_by_molid.pkl
(80/10/10, reference layout: /root/reference/utils/dataset.py:63-96) and the
processed record store is built eagerly so training starts without a
processing pause.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moldiff_tpu.data.dataset import Drug3DDataset
from moldiff_tpu.data.synthetic import make_synthetic_dataset

CORPORA = {
    # name: (root, n_mols, seed, chemistry)
    "demo": ("./data/synthetic", 8_000, 7, "v1"),
    "full": ("./data/synthetic_full", 24_000, 2023, "v1"),
    "xl": ("./data/synthetic_xl", 96_000, 2024, "v1"),
    "full2": ("./data/synthetic_full2", 24_000, 3023, "v2"),
    "xl2": ("./data/synthetic_xl2", 96_000, 3024, "v2"),
}


def build(name: str) -> None:
    root, n_mols, seed, chemistry = CORPORA[name]
    t0 = time.time()
    if os.path.exists(os.path.join(root, "mol_summary.csv")):
        print(f"[{name}] {root} exists, skipping generation")
    else:
        print(f"[{name}] generating {n_mols} molecules (seed {seed}, {chemistry}) -> {root}")
        make_synthetic_dataset(root, n_mols=n_mols, seed=seed, chemistry=chemistry)
        print(f"[{name}] generated in {time.time() - t0:.0f}s")
    t1 = time.time()
    path_dict = {"sdf": "sdf", "summary": "mol_summary.csv",
                 "processed": "processed.mdb"}
    ds = Drug3DDataset(root, path_dict)
    n = len(ds.reader)
    print(f"[{name}] record store ready: {n} records ({time.time() - t1:.0f}s)")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("corpus", nargs="+", choices=sorted(CORPORA) + ["all"])
    args = ap.parse_args()
    names = sorted(CORPORA) if "all" in args.corpus else args.corpus
    for name in names:
        build(name)


if __name__ == "__main__":
    main()
