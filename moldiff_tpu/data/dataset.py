"""GEOM-Drug / QM9-style dataset: SDF directory -> packed record store.

First-party analogue of the reference LMDB pipeline
(`/root/reference/utils/dataset.py` + `utils/parser.py`): scans a
`mol_summary.csv`, parses each molecule's (multi-conformer) SDF with
cross-conformer consistency checks, and packs raw arrays into the native
record store. Featurization happens at load time (cheap numpy ops) so the
store stays model-agnostic.

Record schema (pickled dict per molecule):
  molid: str | int
  element:    [n] int16 atomic numbers
  pos:        [n_conf, n, 3] float32
  bond_index: [2, n_bonds] int16 (each bond once, i < j)
  bond_type:  [n_bonds] int8 (1/2/3/4)
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, Optional, Sequence

import numpy as np

from ..chem.mol import Mol
from ..chem.sdf import read_sdf
from .record_store import RecordReader, RecordWriter


def mol_to_arrays(mol: Mol) -> dict:
    """Mol -> canonical arrays; bonds sorted by flat (i*n + j) index with
    i < j (reference utils/parser.py:103-105 ordering)."""
    n = mol.num_atoms
    element = np.array([a.z for a in mol.atoms], dtype=np.int16)
    pos = np.stack([a.pos for a in mol.atoms]).astype(np.float32)
    bonds = sorted(
        ((min(b.i, b.j), max(b.i, b.j), b.order) for b in mol.bonds),
        key=lambda t: t[0] * n + t[1],
    )
    if bonds:
        bi = np.array([[b[0] for b in bonds], [b[1] for b in bonds]], dtype=np.int16)
        bt = np.array([b[2] for b in bonds], dtype=np.int8)
    else:
        bi = np.zeros((2, 0), dtype=np.int16)
        bt = np.zeros((0,), dtype=np.int8)
    return {"element": element, "pos": pos, "bond_index": bi, "bond_type": bt}


def parse_conf_list(mols: Sequence[Optional[Mol]], molid=None) -> Optional[dict]:
    """Multi-conformer SDF -> one record; requires identical atoms/bonds
    across conformers (reference utils/parser.py:26-57). Returns None if
    inconsistent or empty."""
    mols = [m for m in mols if m is not None]
    if not mols:
        return None
    base = mol_to_arrays(mols[0])
    poses = [base["pos"]]
    for m in mols[1:]:
        arr = mol_to_arrays(m)
        if (
            not np.array_equal(arr["element"], base["element"])
            or not np.array_equal(arr["bond_index"], base["bond_index"])
            or not np.array_equal(arr["bond_type"], base["bond_type"])
        ):
            return None
        poses.append(arr["pos"])
    return {
        "molid": molid,
        "element": base["element"],
        "pos": np.stack(poses),
        "bond_index": base["bond_index"],
        "bond_type": base["bond_type"],
    }


def parse_conf_arrays(recs, molid=None) -> Optional[dict]:
    """Array-record variant of :func:`parse_conf_list` — same cross-conformer
    consistency contract, consumed by the native ingestion fast path
    (chem/sdf_native.py:read_sdf_arrays, no Mol objects built)."""
    recs = [r for r in recs if r is not None]
    if not recs:
        return None
    base = recs[0]
    poses = [base["pos"]]
    for r in recs[1:]:
        if (
            not np.array_equal(r["element"], base["element"])
            or not np.array_equal(r["bond_index"], base["bond_index"])
            or not np.array_equal(r["bond_type"], base["bond_type"])
        ):
            return None
        poses.append(r["pos"])
    return {
        "molid": molid,
        "element": base["element"],
        "pos": np.stack(poses),
        "bond_index": base["bond_index"],
        "bond_type": base["bond_type"],
    }


def _parse_one(molid, sdf_dir) -> Optional[dict]:
    sdf_path = os.path.join(sdf_dir, f"{molid}.sdf")
    if not os.path.exists(sdf_path):
        return None
    try:
        # native C++ parser when built: text -> record arrays directly
        # (no Mol objects on the ingestion path); Python parser fallback
        from ..chem.sdf_native import native_available, read_sdf_arrays

        if native_available():
            return parse_conf_arrays(read_sdf_arrays(sdf_path), molid=molid)
        mols = list(read_sdf(sdf_path))
        return parse_conf_list(mols, molid=molid)
    except Exception:
        return None


def _parse_one_pickled(args) -> Optional[bytes]:
    """Worker: parse one molecule and pickle it (bytes cross the process
    boundary once, the writer appends them directly)."""
    rec = _parse_one(*args)
    if rec is None:
        return None
    return pickle.dumps(rec, protocol=pickle.HIGHEST_PROTOCOL)


class Drug3DDataset:
    """Record-store-backed molecule dataset with auto-processing.

    config keys (reference-compatible, configs/train/*.yml `dataset`):
      root, path_dict.{sdf, summary, processed}, split
    """

    def __init__(self, root: str, path_dict: dict, transform=None):
        self.root = root
        self.sdf_dir = os.path.join(root, path_dict.get("sdf", "sdf"))
        self.summary_path = os.path.join(root, path_dict.get("summary", "mol_summary.csv"))
        processed = path_dict.get("processed", "processed.mdb")
        self.store_path = os.path.join(root, os.path.splitext(processed)[0])
        self.transform = transform
        self._reader: Optional[RecordReader] = None
        self._molid2idx: Optional[Dict] = None
        if not os.path.exists(self.store_path + ".bin"):
            self._process()

    # -- processing ----------------------------------------------------------

    def _iter_summary(self):
        """Yield molids passing the reference filters
        (utils/dataset.py:94-95: pass_size & pass_element & ~broken &
        ~error_mol). Falls back to all SDF files if no summary csv."""
        if os.path.exists(self.summary_path):
            import pandas as pd

            df = pd.read_csv(self.summary_path)
            mask = np.ones(len(df), dtype=bool)
            for col, want in (("pass_size", True), ("pass_element", True),
                              ("broken", False), ("error_mol", False)):
                if col in df.columns:
                    mask &= df[col].astype(bool).values == want
            id_col = "molid" if "molid" in df.columns else df.columns[0]
            for molid in df.loc[mask, id_col]:
                yield molid
        else:
            for fn in sorted(os.listdir(self.sdf_dir)):
                if fn.endswith(".sdf"):
                    yield os.path.splitext(fn)[0]

    def _process(self, n_workers: Optional[int] = None) -> None:
        """Parse + pack all molecules. Parsing is fanned out over a process
        pool (the reference's analogue is DataLoader(num_workers=64)); the
        append-only store write stays in this process."""
        from multiprocessing import Pool, cpu_count

        os.makedirs(os.path.dirname(self.store_path), exist_ok=True)
        molids = list(self._iter_summary())
        n_workers = n_workers or min(max(cpu_count() - 1, 1), 32)
        n_ok = n_bad = 0
        with RecordWriter(self.store_path) as w:
            if n_workers > 1 and len(molids) > 64:
                args = [(m, self.sdf_dir) for m in molids]
                with Pool(n_workers) as pool:
                    for blob in pool.imap(_parse_one_pickled, args,
                                          chunksize=32):
                        if blob is None:
                            n_bad += 1
                        else:
                            w.append_bytes(blob)
                            n_ok += 1
            else:
                for molid in molids:
                    rec = _parse_one(molid, self.sdf_dir)
                    if rec is None:
                        n_bad += 1
                    else:
                        w.append(rec)
                        n_ok += 1
        if n_bad:
            print(f"[dataset] processed {n_ok} molecules, skipped {n_bad}")

    # -- access --------------------------------------------------------------

    @property
    def reader(self) -> RecordReader:
        if self._reader is None:
            self._reader = RecordReader(self.store_path)
        return self._reader

    def __len__(self) -> int:
        return len(self.reader)

    def __getitem__(self, i: int) -> dict:
        rec = self.reader[i]
        if self.transform is not None:
            rec = self.transform(rec)
        return rec

    @property
    def molid2idx(self) -> Dict:
        if self._molid2idx is None:
            self._molid2idx = {
                self.reader[i]["molid"]: i for i in range(len(self.reader))
            }
        return self._molid2idx


class Subset:
    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


def get_dataset(config, transform=None):
    """(dataset, {split: Subset}) from a reference-style dataset config node
    (utils/dataset.py:16-34). The split file is a pickle {split: [molid...]}."""
    dataset = Drug3DDataset(config["root"], dict(config["path_dict"]),
                            transform=transform)
    subsets = {}
    split_path = os.path.join(config["root"], config.get("split", ""))
    if config.get("split") and os.path.exists(split_path):
        # pickle {split: [molid]} or the reference's torch.save'd
        # split_by_molid.pt (both accepted for 1:1 data migration)
        from .convert_lmdb import load_reference_split

        split = load_reference_split(split_path)
        m2i = dataset.molid2idx
        for name, molids in split.items():
            subsets[name] = Subset(
                dataset, [m2i[m] for m in molids if m in m2i]
            )
    else:
        subsets["train"] = Subset(dataset, range(len(dataset)))
    return dataset, subsets
