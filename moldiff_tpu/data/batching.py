"""Padded dense batching: the TPU replacement for PyG ragged batching.

The reference concatenates molecules into one big disjoint graph via index
offsets (`/root/reference/utils/data.py:25-33`). Here each batch is a fixed
shape ``[B, N]`` / ``[B, E]`` with per-graph node counts and masks; N is a
*bucket size* so the number of distinct XLA compilations stays small.

Default buckets cover GEOM-Drug (sizes ~ N(24.9, 5.5), max ~52).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from ..ops.graph_ops import num_halfedges

DEFAULT_BUCKETS = (16, 24, 32, 40, 48, 64)


@dataclass
class MolBatch:
    """Fixed-shape padded molecule batch (a pytree of host numpy or device
    jnp arrays; all model functions take its fields).

      node_type     [B, N] int32   (padded entries arbitrary, masked)
      pos           [B, N, 3] float32
      halfedge_type [B, E] int32   (E = N(N-1)/2)
      node_mask     [B, N] float32 (1 = real atom)
      n_nodes       [B] int32
    """

    node_type: np.ndarray
    pos: np.ndarray
    halfedge_type: np.ndarray
    node_mask: np.ndarray
    n_nodes: np.ndarray

    @property
    def batch_size(self) -> int:
        return self.node_type.shape[0]

    @property
    def n_max(self) -> int:
        return self.node_type.shape[1]


def node_mask_from_counts(n_nodes: np.ndarray, n_max: int) -> np.ndarray:
    """[B] counts -> [B, N] float mask."""
    return (np.arange(n_max)[None, :] < np.asarray(n_nodes)[:, None]).astype(np.float32)


def pick_bucket(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"molecule with {n} atoms exceeds largest bucket {buckets[-1]}")


def pad_mols(mols: List[dict], n_max: Optional[int] = None) -> MolBatch:
    """Pack featurized molecules (dicts from ``MolFeaturizer.featurize``)
    into one padded MolBatch. All mols must fit in ``n_max``."""
    sizes = np.array([len(m["node_type"]) for m in mols], dtype=np.int32)
    if n_max is None:
        n_max = pick_bucket(int(sizes.max()))
    assert sizes.max() <= n_max
    b = len(mols)
    e_max = num_halfedges(n_max)

    node_type = np.zeros((b, n_max), dtype=np.int32)
    pos = np.zeros((b, n_max, 3), dtype=np.float32)
    halfedge_type = np.zeros((b, e_max), dtype=np.int32)
    for i, m in enumerate(mols):
        n = sizes[i]
        node_type[i, :n] = m["node_type"]
        pos[i, :n] = m["pos"]
        # half-edges of an n-atom mol occupy a *prefix pattern* of the n_max
        # triu order only if n == n_max; place them by (i, j) coordinates.
        e_n = num_halfedges(int(n))
        if e_n:
            iu_s, ju_s = np.triu_indices(int(n), k=1)
            flat = iu_s * n_max - (iu_s * (iu_s + 1)) // 2 + (ju_s - iu_s - 1)
            halfedge_type[i, flat] = m["halfedge_type"]
    return MolBatch(
        node_type=node_type,
        pos=pos,
        halfedge_type=halfedge_type,
        node_mask=node_mask_from_counts(sizes, n_max),
        n_nodes=sizes,
    )


def unpad_arrays(batch_arrays, n_nodes: np.ndarray):
    """Split padded per-node/per-halfedge arrays back into per-molecule
    unpadded numpy arrays.

    batch_arrays: dict with 'pred_node' [B,N,Kn], 'pred_pos' [B,N,3],
    'pred_halfedge' [B,E,Ke]. Returns a list of per-mol dicts. The inverse of
    the reference's ``seperate_outputs`` (/root/reference/utils/sample.py:4-30).
    """
    pred_node = np.asarray(batch_arrays["pred_node"])
    pred_pos = np.asarray(batch_arrays["pred_pos"])
    pred_halfedge = np.asarray(batch_arrays["pred_halfedge"])
    n_max = pred_node.shape[1]
    out = []
    for i, n in enumerate(np.asarray(n_nodes)):
        n = int(n)
        iu_s, ju_s = np.triu_indices(n, k=1)
        flat = iu_s * n_max - (iu_s * (iu_s + 1)) // 2 + (ju_s - iu_s - 1)
        out.append(
            {
                "pred_node": pred_node[i, :n],
                "pred_pos": pred_pos[i, :n],
                "pred_halfedge": pred_halfedge[i, flat],
            }
        )
    return out


def split_trajectories(traj, n_nodes: np.ndarray):
    """Per-molecule unpadded trajectories.

    traj: (node [T+1,B,N,Kn], pos [T+1,B,N,3], halfedge [T+1,B,E,Ke]) from
    ``MolDiff.sample(save_traj=True)``. Returns a list of per-mol dicts with
    'node'/'pos'/'halfedge' arrays (the trajectory analogue of the
    reference's seperate_outputs, /root/reference/utils/sample.py:4-30).
    """
    node_t, pos_t, he_t = (np.asarray(t) for t in traj)
    n_max = node_t.shape[2]
    out = []
    for i, n in enumerate(np.asarray(n_nodes)):
        n = int(n)
        iu_s, ju_s = np.triu_indices(n, k=1)
        flat = iu_s * n_max - (iu_s * (iu_s + 1)) // 2 + (ju_s - iu_s - 1)
        out.append({
            "node": node_t[:, i, :n],
            "pos": pos_t[:, i, :n],
            "halfedge": he_t[:, i, flat],
        })
    return out


def sample_size_placeholder(
    n_graphs: int,
    rng: np.random.Generator,
    mean: float = 24.923464980477522,
    std: float = 5.516291901819105,
    max_size: Optional[int] = None,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
):
    """Draw molecule sizes from the GEOM-Drug size distribution and group
    them by bucket (reference utils/transforms.py:125-156 make_data_placeholder).

    Returns list of (n_bucket, sizes_array).
    """
    if max_size is not None:
        sizes = np.full(n_graphs, max_size, dtype=np.int64)
    else:
        sizes = rng.normal(mean, std, size=n_graphs).astype(np.int64)
    sizes = np.clip(sizes, 3, buckets[-1])
    groups = {}
    for s in sizes:
        b = pick_bucket(int(s), buckets)
        groups.setdefault(b, []).append(int(s))
    return [(b, np.array(v, dtype=np.int32)) for b, v in sorted(groups.items())]
