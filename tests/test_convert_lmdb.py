"""Reference-LMDB dataset migration (data/convert_lmdb.py).

The lmdb binding is absent in this image, so these tests drive everything
below it: stub unpickling of the reference's Drug3DData class paths (both
PyG 1.x direct-__dict__ and PyG 2.x _store._mapping layouts), record
conversion (directed duplicated bonds -> undirected i<j, reference
utils/parser.py:88-105), store writing, and split-file loading (.pkl and
the reference's torch.save'd .pt)."""
import os
import pickle
import sys

import numpy as np
import pytest
import torch

from moldiff_tpu.data import convert_lmdb as cv
from moldiff_tpu.data.dataset import get_dataset
from moldiff_tpu.data.record_store import RecordReader


def _directed_bonds(n, bonds):
    """bonds [(i, j, type)] -> reference layout: both directions, sorted by
    flat index (utils/parser.py:88-105)."""
    row, col, types_ = [], [], []
    for i, j, t in bonds:
        row += [i, j]
        col += [j, i]
        types_ += [t, t]
    bi = np.array([row, col], dtype=np.int64)
    bt = np.array(types_, dtype=np.int64)
    perm = (bi[0] * n + bi[1]).argsort()
    return bi[:, perm], bt[perm]


def _fake_record(layout: str):
    """A pickled bytes blob shaped like a reference LMDB value."""
    cv.install_unpickle_stubs()
    import utils.data as ref_data  # stub module installed above

    n = 4
    bi, bt = _directed_bonds(n, [(0, 1, 1), (1, 2, 2), (2, 3, 1)])
    payload = {
        "element": torch.tensor([6, 6, 7, 8]),
        "pos_all_confs": torch.randn(2, n, 3),
        "bond_index": torch.from_numpy(bi),
        "bond_type": torch.from_numpy(bt),
        "num_atoms": n,
        "num_confs": 2,
    }
    obj = ref_data.Drug3DData.__new__(ref_data.Drug3DData)
    if layout == "pyg1":
        obj.__dict__.update(payload)
    else:  # pyg2: nested storage with _mapping
        store = cv._StubStorage()
        store.__dict__["_mapping"] = payload
        obj.__dict__["_store"] = store
    return pickle.dumps(obj)


@pytest.mark.parametrize("layout", ["pyg1", "pyg2"])
def test_convert_items_roundtrip(tmp_path, layout):
    items = [(f"mol{k}".encode(), _fake_record(layout)) for k in range(3)]
    store = str(tmp_path / "processed")
    n_ok, n_bad = cv.convert_items(items, store)
    assert (n_ok, n_bad) == (3, 0)

    r = RecordReader(store)
    assert len(r) == 3
    rec = r[0]
    assert rec["molid"] == "mol0"
    assert rec["element"].dtype == np.int16
    assert rec["pos"].shape == (2, 4, 3)
    # undirected i<j, sorted by flat index
    np.testing.assert_array_equal(rec["bond_index"], [[0, 1, 2], [1, 2, 3]])
    np.testing.assert_array_equal(rec["bond_type"], [1, 2, 1])
    r.close()


def test_convert_items_skips_garbage(tmp_path):
    items = [(b"good", _fake_record("pyg1")), (b"bad", b"not a pickle")]
    n_ok, n_bad = cv.convert_items(items, str(tmp_path / "p"))
    assert (n_ok, n_bad) == (1, 1)


def test_convert_lmdb_gated_error(tmp_path):
    if "lmdb" in sys.modules or __import__("importlib.util", fromlist=["util"]).find_spec("lmdb"):
        pytest.skip("lmdb installed; gate not reachable")
    with pytest.raises(ImportError, match="lmdb"):
        cv.convert_lmdb("/nonexistent.lmdb", str(tmp_path / "p"))


def test_load_reference_split_pt_and_pkl(tmp_path):
    split = {"train": ["a", "b"], "val": ["c"], "test": ["d"]}
    pt = tmp_path / "split_by_molid.pt"
    torch.save(split, str(pt))
    assert cv.load_reference_split(str(pt)) == split
    pk = tmp_path / "split.pkl"
    with open(pk, "wb") as f:
        pickle.dump(split, f)
    assert cv.load_reference_split(str(pk)) == split


def test_converted_store_plugs_into_get_dataset(tmp_path):
    """A converted store + reference .pt split is directly usable by
    get_dataset (no SDF re-processing)."""
    items = [(f"m{k}".encode(), _fake_record("pyg2")) for k in range(5)]
    cv.convert_items(items, str(tmp_path / "processed"))
    torch.save({"train": ["m0", "m1", "m2"], "val": ["m3"], "test": ["m4"]},
               str(tmp_path / "split_by_molid.pt"))
    ds, subsets = get_dataset({
        "root": str(tmp_path),
        "path_dict": {"processed": "processed.mdb"},
        "split": "split_by_molid.pt",
    })
    assert len(ds) == 5
    assert {k: len(v) for k, v in subsets.items()} == {
        "train": 3, "val": 1, "test": 1,
    }
    assert subsets["val"][0]["molid"] == "m3"
