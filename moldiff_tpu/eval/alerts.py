"""Structural alerts (PAINS-style filter, subset).

First-party stand-in for the reference's RDKit PAINS catalog filter
(`/root/reference/utils/scoring_func.py:77-87`). The full PAINS catalog is
~480 SMARTS; without a full SMARTS engine this implements the common
reactive/unstable substructure alerts expressible with the framework's
linear-path matcher plus neighborhood tests. Used for the QED ALERTS
descriptor and the `passes_alert_filter` screen. Coverage is a documented
subset — applied identically to all compared methods, so relative
comparisons remain meaningful.
"""
from __future__ import annotations

from typing import Dict

from ..chem.mol import Mol
from .local3d import match_paths

# linear-path alerts (name -> SMARTS-subset pattern)
_PATH_ALERTS = {
    "azo": "[#6]-N=N-[#6]",
    "peroxide": "O-O",
    "disulfide_reactive": "S-S",
    "michael_acceptor": "C=C-C=O",
    "acyl_halide_cl": "Cl-C=O",
    "acyl_halide_br": "Br-C=O",
    "imine_reactive": "C=N-N",
    "nitroso": "[#7]=O",
    "thiocarbonyl": "C=S",
    "hydrazine": "N-N",
    "hemiketal": "O-C-O",
}


def _nitro_count(mol: Mol) -> int:
    """N bonded to two O (one double) — nitro group."""
    count = 0
    for i, a in enumerate(mol.atoms):
        if a.z != 7:
            continue
        o_orders = sorted(
            mol.bonds[b].order
            for j, b in mol._adj[i].items()
            if mol.atoms[j].z == 8
        )
        if len(o_orders) >= 2 and 2 in o_orders:
            count += 1
    return count


def _aldehyde_count(mol: Mol) -> int:
    """Carbonyl C with an implicit H (terminal CHO)."""
    count = 0
    for i, a in enumerate(mol.atoms):
        if a.z != 6:
            continue
        has_double_o = any(
            mol.atoms[j].z == 8 and mol.bonds[b].order == 2
            for j, b in mol._adj[i].items()
        )
        if has_double_o and mol.implicit_h(i) >= 1:
            count += 1
    return count


def count_alerts(mol: Mol) -> Dict[str, int]:
    """Per-alert match counts."""
    out: Dict[str, int] = {}
    for name, pat in _PATH_ALERTS.items():
        n = len(match_paths(mol, pat))
        if n:
            out[name] = n
    n = _nitro_count(mol)
    if n:
        out["nitro"] = n
    n = _aldehyde_count(mol)
    if n:
        out["aldehyde"] = n
    return out


def num_alerts(mol: Mol) -> int:
    """Number of distinct alert classes present (the QED ALERTS input)."""
    return len(count_alerts(mol))


def passes_alert_filter(mol: Mol) -> bool:
    return num_alerts(mol) == 0
