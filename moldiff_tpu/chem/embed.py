"""Distance-geometry conformer generation (ETKDG-style).

First-party analogue of RDKit's ETKDG + UFF pipeline that the reference's
``get_rdkit_rmsd`` metric depends on
(`/root/reference/utils/scoring_func.py:56-74`): build a distance-bounds
matrix from the molecular graph (bond-length tables, idealized angles,
torsion ranges), smooth with the triangle inequality, embed random distance
draws by classical MDS (metric matrix + top-3 eigenvectors), then refine
coordinates against the bounds with gradient descent (the same error
function RDKit's DG refinement minimizes). No torsion-knowledge terms or
chirality constraints (documented divergence from ETKDG's 'K' and 'T').
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from .bond_perception import expected_length
from .mol import AROMATIC, Mol
from .periodic import COVALENT_RADIUS

# idealized bond angle (radians) by center-atom environment
_SP3 = np.deg2rad(109.47)
_SP2 = np.deg2rad(120.0)
_SP1 = np.deg2rad(180.0)

_VDW = {1: 1.1, 6: 1.7, 7: 1.55, 8: 1.52, 9: 1.47, 15: 1.8, 16: 1.8,
        17: 1.75, 35: 1.85, 53: 1.98}


def _center_angle(mol: Mol, j: int) -> float:
    """Idealized angle at atom j from its bond orders."""
    orders = [mol.bonds[b].order for b in mol._adj[j].values()]
    if mol.atoms[j].aromatic or AROMATIC in orders:
        return _SP2
    if 3 in orders or orders.count(2) >= 2:
        return _SP1
    if 2 in orders:
        return _SP2
    return _SP3


def _bond_length(mol: Mol, i: int, j: int) -> float:
    b = mol.bond_between(i, j)
    length = expected_length(mol.atoms[i].z, mol.atoms[j].z, b.order)
    if length is None:
        ri = COVALENT_RADIUS.get(mol.atoms[i].z, {}).get(1, 0.77)
        rj = COVALENT_RADIUS.get(mol.atoms[j].z, {}).get(1, 0.77)
        length = ri + rj
    return length


def bounds_matrix(mol: Mol) -> np.ndarray:
    """[n, n, 2] lower/upper distance bounds from graph topology."""
    n = mol.num_atoms
    lower = np.zeros((n, n))
    upper = np.full((n, n), 1e3)
    # default: vdW lower bound for unconstrained pairs
    for i in range(n):
        for j in range(i + 1, n):
            v = 0.9 * (_VDW.get(mol.atoms[i].z, 1.7)
                       + _VDW.get(mol.atoms[j].z, 1.7)) / 2.0 * 2.0
            lower[i, j] = lower[j, i] = v * 0.5  # soft vdW floor
    # 1-2
    for b in mol.bonds:
        d = _bond_length(mol, b.i, b.j)
        lower[b.i, b.j] = lower[b.j, b.i] = d - 0.03
        upper[b.i, b.j] = upper[b.j, b.i] = d + 0.03
    # 1-3 via law of cosines at the center atom
    for j in range(n):
        nbrs = mol.neighbors(j)
        theta = _center_angle(mol, j)
        for a in range(len(nbrs)):
            for b in range(a + 1, len(nbrs)):
                i, k = nbrs[a], nbrs[b]
                d1 = _bond_length(mol, i, j)
                d2 = _bond_length(mol, j, k)
                d13 = np.sqrt(d1 * d1 + d2 * d2
                              - 2 * d1 * d2 * np.cos(theta))
                lower[i, k] = lower[k, i] = max(lower[i, k], d13 - 0.06)
                upper[i, k] = upper[k, i] = min(upper[i, k], d13 + 0.06)
    # 1-4: cis (lower) .. trans (upper) range
    for b in mol.bonds:
        j, k = b.i, b.j
        for i in mol.neighbors(j):
            if i == k:
                continue
            for l in mol.neighbors(k):
                if l == j or l == i:
                    continue
                dij = _bond_length(mol, i, j)
                djk = _bond_length(mol, j, k)
                dkl = _bond_length(mol, k, l)
                tj = _center_angle(mol, j)
                tk = _center_angle(mol, k)
                # planar cis (phi=0) and trans (phi=pi) distances
                def dist_at(phi):
                    # place j at origin, k on x-axis
                    pj = np.zeros(3)
                    pk = np.array([djk, 0, 0])
                    pi = pj + dij * np.array(
                        [np.cos(np.pi - tj), np.sin(np.pi - tj), 0.0]
                    )
                    pl = pk + dkl * np.array(
                        [-np.cos(np.pi - tk),
                         np.sin(np.pi - tk) * np.cos(phi),
                         np.sin(np.pi - tk) * np.sin(phi)],
                    )
                    return float(np.linalg.norm(pi - pl))
                cis, trans = dist_at(np.pi), dist_at(0.0)
                lo, hi = min(cis, trans), max(cis, trans)
                lower[i, l] = lower[l, i] = max(lower[i, l], lo - 0.15)
                upper[i, l] = upper[l, i] = min(upper[i, l], hi + 0.15)
    np.fill_diagonal(lower, 0.0)
    np.fill_diagonal(upper, 0.0)
    return np.stack([lower, np.maximum(lower, upper)], axis=-1)


def smooth_bounds(bounds: np.ndarray) -> np.ndarray:
    """Triangle-inequality smoothing (Floyd-Warshall style)."""
    lo = bounds[..., 0].copy()
    up = bounds[..., 1].copy()
    n = lo.shape[0]
    for k in range(n):
        up = np.minimum(up, up[:, k, None] + up[None, k, :])
    for k in range(n):
        lo = np.maximum(lo, lo[:, k, None] - up[None, k, :])
        lo = np.maximum(lo, lo[None, k, :] - up[:, k, None])
    lo = np.minimum(lo, up)
    np.fill_diagonal(lo, 0.0)
    np.fill_diagonal(up, 0.0)
    return np.stack([lo, up], axis=-1)


def _embed_from_distances(d: np.ndarray) -> np.ndarray:
    """Classical MDS: squared-distance matrix -> top-3-eigenvector coords."""
    n = d.shape[0]
    d2 = d * d
    j = np.eye(n) - np.ones((n, n)) / n
    g = -0.5 * j @ d2 @ j
    w, v = np.linalg.eigh(g)
    idx = np.argsort(w)[::-1][:3]
    w3 = np.maximum(w[idx], 0.0)
    return v[:, idx] * np.sqrt(w3)[None, :]


def _refine(pos: np.ndarray, bounds: np.ndarray, iters: int = 200,
            lr: float = 0.05) -> np.ndarray:
    """Gradient descent on the squared bound-violation error."""
    lo, up = bounds[..., 0], bounds[..., 1]
    n = pos.shape[0]
    mask = 1.0 - np.eye(n)
    for it in range(iters):
        diff = pos[:, None, :] - pos[None, :, :]
        dist = np.sqrt(np.sum(diff * diff, axis=-1)) + 1e-9
        over = np.maximum(dist - up, 0.0)
        under = np.maximum(lo - dist, 0.0)
        coef = (over - under) * mask / dist
        grad = np.sum(coef[:, :, None] * diff, axis=1) * 2.0
        pos = pos - lr * grad
    return pos


def generate_conformers(mol: Mol, n_conformers: int = 10,
                        seed: int = 0) -> List[np.ndarray]:
    """Distance-geometry conformers [n_atoms, 3] (the RDKit
    EmbedMultipleConfs analogue). Deterministic per seed."""
    rng = np.random.default_rng(seed)
    bounds = smooth_bounds(bounds_matrix(mol))
    lo, up = bounds[..., 0], bounds[..., 1]
    out = []
    for _ in range(n_conformers):
        frac = rng.random(lo.shape)
        frac = (frac + frac.T) / 2.0
        d = lo + frac * (up - lo)
        np.fill_diagonal(d, 0.0)
        pos = _embed_from_distances(d)
        pos = _refine(pos, bounds)
        out.append(pos)
    return out
