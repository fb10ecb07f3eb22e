"""Migrate a reference-processed dataset (LMDB of pickled Drug3DData,
`/root/reference/utils/dataset.py:81-134`) into this framework's native
record store, so existing users keep their processed GEOM-Drug corpus.

Usage:
  python scripts/convert_reference_data.py \
      --lmdb /path/to/processed.lmdb \
      --out ./data/geom_drug/processed \
      [--split /path/to/split_by_molid.pt]

Requires the `lmdb` python binding (present in reference environments; the
converter errors with instructions otherwise). The split file (.pt or .pkl)
is rewritten next to the store as split_by_molid.pkl.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moldiff_tpu.data.convert_lmdb import convert_lmdb, load_reference_split
from moldiff_tpu.utils.misc import get_logger


def main(argv=None):
    from moldiff_tpu.utils.misc import force_platform_from_env
    force_platform_from_env()  # honor JAX_PLATFORMS despite sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--lmdb", required=True, help="reference processed.lmdb")
    ap.add_argument("--out", required=True,
                    help="record-store path prefix (writes <out>.bin/.idx)")
    ap.add_argument("--split", default=None,
                    help="reference split_by_molid.pt/.pkl to convert")
    args = ap.parse_args(argv)

    logger = get_logger("convert", None)
    n_ok, n_bad = convert_lmdb(args.lmdb, args.out, logger=logger)
    logger.info(f"done: {n_ok} records written, {n_bad} skipped -> {args.out}.bin")

    if args.split:
        split = load_reference_split(args.split)
        out_split = os.path.join(os.path.dirname(os.path.abspath(args.out)),
                                 "split_by_molid.pkl")
        with open(out_split, "wb") as f:
            pickle.dump({k: list(v) for k, v in split.items()}, f)
        logger.info(f"split file -> {out_split}")


if __name__ == "__main__":
    main()
