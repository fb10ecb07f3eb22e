"""Static complete-graph index tables and half-edge <-> dense conversions.

Molecules are complete graphs: the canonical edge set of an N-atom molecule
is the N(N-1)/2 unordered "half-edges" (i, j) with i < j in row-major
upper-triangular order (same convention as the reference featurizer,
/root/reference/utils/transforms.py:55). All tables here are *static* per
bucket size N, so they trace into jit as constants.

Diffusion state lives on half-edges ``[B, E, K]`` (noise must be identical
for (i,j) and (j,i)); the denoiser consumes the dense directed layout
``[B, N, N, H]``. Conversions are static gathers.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def triu_indices(n: int):
    """(iu, ju) int32 arrays of the E = n(n-1)/2 half-edges, i < j."""
    iu, ju = np.triu_indices(n, k=1)
    return iu.astype(np.int32), ju.astype(np.int32)


def num_halfedges(n: int) -> int:
    return n * (n - 1) // 2


@functools.lru_cache(maxsize=None)
def halfedge_id_map(n: int) -> np.ndarray:
    """[N, N] int32 mapping (i, j) -> half-edge id; diagonal maps to 0
    (contents there are always masked by the pair mask)."""
    iu, ju = triu_indices(n)
    m = np.zeros((n, n), dtype=np.int32)
    e = np.arange(len(iu), dtype=np.int32)
    m[iu, ju] = e
    m[ju, iu] = e
    return m


def halfedge_to_dense(h_half: jnp.ndarray, n: int) -> jnp.ndarray:
    """[B, E, ...] -> [B, N, N, ...] placing each half-edge value at both
    (i,j) and (j,i). Diagonal entries carry half-edge 0's value and must be
    masked by the consumer's pair mask."""
    m = halfedge_id_map(n).reshape(-1)  # [N*N]
    dense = h_half[:, m]
    return dense.reshape(h_half.shape[:1] + (n, n) + h_half.shape[2:])


def dense_to_halfedge(h_dense: jnp.ndarray) -> jnp.ndarray:
    """[B, N, N, ...] -> [B, E, ...] reading the upper triangle."""
    n = h_dense.shape[1]
    iu, ju = triu_indices(n)
    return h_dense[:, iu, ju]


def symmetrize_dense(h_dense: jnp.ndarray) -> jnp.ndarray:
    """h[i,j] + h[j,i] — the dense analogue of the reference's
    ``h_edge[:E/2] + h_edge[E/2:]`` directed-edge symmetrization
    (/root/reference/models/model.py:227)."""
    return h_dense + jnp.swapaxes(h_dense, 1, 2)


def pair_mask_from_node_mask(node_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, N] float/bool -> [B, N, N] float: 1 where both endpoints are real
    and i != j."""
    m = node_mask.astype(jnp.float32)
    pm = m[:, :, None] * m[:, None, :]
    n = node_mask.shape[1]
    return pm * (1.0 - jnp.eye(n, dtype=jnp.float32))


def halfedge_mask_from_node_mask(node_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, N] -> [B, E] float: 1 where both half-edge endpoints are real."""
    n = node_mask.shape[1]
    iu, ju = triu_indices(n)
    m = node_mask.astype(jnp.float32)
    return m[:, iu] * m[:, ju]
