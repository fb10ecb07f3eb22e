"""Bucketed batch loader: records -> fixed-shape padded MolBatches.

TPU replacement for the reference's PyG DataLoader with 64 workers
(`/root/reference/scripts/train_drug3d.py:59-69`): molecules are featurized
on the host, grouped by size bucket, and emitted as fixed (bucket_n,
batch_size) padded batches so every train step hits one of ~len(buckets)
compiled programs. A background thread keeps a prefetch queue full so the
device never waits on the host.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Sequence

import numpy as np

from .batching import pad_mols, pick_bucket
from .featurize import MolFeaturizer


def featurize_record(rec: dict, featurizer: MolFeaturizer,
                     rng: np.random.Generator, center: bool = True) -> dict:
    """Record -> featurized dict; picks a random conformer (reference
    utils/transforms.py:43-48)."""
    pos = rec["pos"]
    if pos.ndim == 3:
        pos = pos[rng.integers(0, pos.shape[0])]
    bi = rec["bond_index"].astype(np.int64)
    # featurize wants both directions
    bond_index = np.concatenate([bi, bi[::-1]], axis=1)
    bond_type = np.concatenate([rec["bond_type"], rec["bond_type"]]).astype(np.int64)
    return featurizer.featurize(
        rec["element"].astype(np.int64), pos, bond_index, bond_type, center=center
    )


class BucketedLoader:
    """Infinite (or epoch) iterator of MolBatch dicts.

    Yields dict(node_type, pos, halfedge_type, node_mask) numpy arrays of
    fixed shape per bucket. Molecules larger than the biggest bucket are
    skipped (counted).
    """

    def __init__(
        self,
        subset,                      # indexable of records
        featurizer: MolFeaturizer,
        batch_size: int,
        buckets: Sequence[int] = (24, 32, 48),
        shuffle: bool = True,
        seed: int = 0,
        infinite: bool = True,
        drop_last: bool = True,
        prefetch: int = 4,
    ):
        self.subset = subset
        self.featurizer = featurizer
        self.batch_size = batch_size
        self.buckets = tuple(sorted(buckets))
        self.shuffle = shuffle
        self.infinite = infinite
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.num_skipped = 0

    def _epoch_indices(self, rng: np.random.Generator) -> np.ndarray:
        idx = np.arange(len(self.subset))
        if self.shuffle:
            rng.shuffle(idx)
        return idx

    def _iter_batches(self) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed)
        epoch = 0
        while True:
            pending: Dict[int, List[dict]] = {b: [] for b in self.buckets}
            for i in self._epoch_indices(rng):
                rec = self.subset[int(i)]
                feats = featurize_record(rec, self.featurizer, rng)
                n = len(feats["node_type"])
                if n > self.buckets[-1]:
                    self.num_skipped += 1
                    continue
                b = pick_bucket(n, self.buckets)
                pending[b].append(feats)
                if len(pending[b]) == self.batch_size:
                    yield self._emit(pending[b], b)
                    pending[b] = []
            if not self.drop_last:
                for b, mols in pending.items():
                    if mols:
                        yield self._emit(mols, b)
            epoch += 1
            if not self.infinite:
                return

    def _emit(self, mols: List[dict], n_bucket: int) -> dict:
        mb = pad_mols(mols, n_max=n_bucket)
        out = {
            "node_type": mb.node_type,
            "pos": mb.pos,
            "halfedge_type": mb.halfedge_type,
            "node_mask": mb.node_mask,
        }
        # pad partial batches to the fixed batch size with fully-masked rows
        # so every emitted shape is one of len(buckets) compiled programs
        # (a fresh shape means a multi-minute XLA compile on TPU)
        short = self.batch_size - len(mols)
        if short > 0:
            for k, v in out.items():
                pad_width = [(0, short)] + [(0, 0)] * (v.ndim - 1)
                out[k] = np.pad(v, pad_width)
        return out

    def __iter__(self) -> Iterator[dict]:
        if self.prefetch <= 0:
            yield from self._iter_batches()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        DONE = object()

        def worker():
            try:
                for b in self._iter_batches():
                    q.put(b)
            finally:
                q.put(DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is DONE:
                return
            yield item
