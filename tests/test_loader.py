"""BucketedLoader tests: fixed shapes, partial-batch padding, bucket
assignment, skip counting, prefetch thread."""
import numpy as np
import pytest

from moldiff_tpu.data.featurize import MolFeaturizer
from moldiff_tpu.data.loader import BucketedLoader, featurize_record


def make_records(rng, n=40, max_atoms=20):
    recs = []
    for _ in range(n):
        na = int(rng.integers(4, max_atoms + 1))
        elements = rng.choice([6, 7, 8], size=na).astype(np.int16)
        pos = rng.normal(size=(2, na, 3)).astype(np.float32)  # 2 conformers
        bi = np.array([[i for i in range(na - 1)], [i + 1 for i in range(na - 1)]],
                      dtype=np.int16)
        bt = np.ones(na - 1, dtype=np.int8)
        recs.append({"molid": f"m{len(recs)}", "element": elements, "pos": pos,
                     "bond_index": bi, "bond_type": bt})
    return recs


class TestLoader:
    def test_fixed_shapes_and_padding(self, rng):
        recs = make_records(rng)
        loader = BucketedLoader(recs, MolFeaturizer(), batch_size=8,
                                buckets=(12, 24), shuffle=False, infinite=False,
                                drop_last=False, prefetch=0)
        shapes = set()
        total = 0
        for batch in loader:
            shapes.add((batch["node_type"].shape, batch["pos"].shape))
            assert batch["node_type"].shape[0] == 8  # always padded to full
            total += int(batch["node_mask"].any(axis=1).sum())
        assert total == len(recs)
        assert len(shapes) <= 2  # one shape per bucket

    def test_oversize_skipped(self, rng):
        recs = make_records(rng, n=10, max_atoms=30)
        loader = BucketedLoader(recs, MolFeaturizer(), batch_size=4,
                                buckets=(16,), shuffle=False, infinite=False,
                                drop_last=False, prefetch=0)
        list(loader)
        big = sum(1 for r in recs if len(r["element"]) > 16)
        assert loader.num_skipped == big

    def test_prefetch_thread_equivalence(self, rng):
        recs = make_records(rng)
        kw = dict(batch_size=4, buckets=(24,), shuffle=False, infinite=False,
                  drop_last=False)
        direct = list(BucketedLoader(recs, MolFeaturizer(), prefetch=0, **kw))
        threaded = list(BucketedLoader(recs, MolFeaturizer(), prefetch=2, **kw))
        assert len(direct) == len(threaded)
        for a, b in zip(direct, threaded):
            np.testing.assert_array_equal(a["node_type"], b["node_type"])

    def test_random_conformer_selection(self, rng):
        rec = make_records(rng, n=1)[0]
        feats = [featurize_record(rec, MolFeaturizer(), np.random.default_rng(s))
                 for s in range(8)]
        # both conformers appear across seeds
        unique_pos = {f["pos"].tobytes() for f in feats}
        assert len(unique_pos) == 2

    def test_infinite_cycles(self, rng):
        recs = make_records(rng, n=8, max_atoms=10)
        loader = iter(BucketedLoader(recs, MolFeaturizer(), batch_size=4,
                                     buckets=(12,), shuffle=True, infinite=True,
                                     prefetch=0))
        for _ in range(10):  # > one epoch
            batch = next(loader)
            assert batch["node_type"].shape == (4, 12)
