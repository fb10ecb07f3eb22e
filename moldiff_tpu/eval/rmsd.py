"""Rigid-alignment RMSD (Kabsch) and the global-3D quality metric.

First-party analogue of the reference's `get_rdkit_rmsd`
(`/root/reference/utils/scoring_func.py:56-74`): the reference embeds 100
ETKDG conformers with RDKit + UFF and reports the best heavy-atom RMSD to
the generated geometry. Without RDKit, the re-embedding here uses the
framework's force-field layout (`data/synthetic._embed_coords`) over several
random restarts — a cruder embedding, so absolute values differ from the
reference's, but the metric remains a consistent relative measure of
geometry plausibility across compared methods.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..chem.mol import Mol


def kabsch_rmsd(p: np.ndarray, q: np.ndarray, center: bool = True) -> float:
    """Minimum RMSD between point sets p, q [n, 3] over rotations (and
    optional translation)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    assert p.shape == q.shape
    if center:
        p = p - p.mean(axis=0)
        q = q - q.mean(axis=0)
    h = p.T @ q
    u, s, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    diag = np.diag([1.0, 1.0, d])
    r = vt.T @ diag @ u.T
    p_rot = p @ r.T
    return float(np.sqrt(np.mean(np.sum((p_rot - q) ** 2, axis=1))))


def best_embedding_rmsd(
    mol: Mol, n_restarts: int = 10, seed: int = 0, iters: int = 120
) -> Optional[float]:
    """Best RMSD between mol's coordinates and force-layout re-embeddings
    from random starts (reference: best of 100 ETKDG conformers)."""
    from ..data.synthetic import _embed_coords

    if mol.num_atoms < 2 or any(a.pos is None for a in mol.atoms):
        return None
    ref_pos = np.stack([a.pos for a in mol.atoms])
    rng = np.random.default_rng(seed)
    best = None
    for _ in range(n_restarts):
        trial = mol.copy()
        _embed_coords(trial, rng, iters=iters)
        r = kabsch_rmsd(ref_pos, np.stack([a.pos for a in trial.atoms]))
        best = r if best is None else min(best, r)
    return best


def global_3d(mol: Mol) -> dict:
    """Metric-family dict (reference global_3d, utils/evaluation.py:40-49)."""
    r = best_embedding_rmsd(mol)
    return {"rmsd_embed": r if r is not None else float("nan")}
