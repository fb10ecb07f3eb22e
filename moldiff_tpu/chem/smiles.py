"""Canonical SMILES generation.

First-party replacement for RDKit's MolToSmiles, which the reference uses
for uniqueness/novelty bookkeeping and disconnect detection ('.' in SMILES,
`/root/reference/scripts/sample_drug3d.py:152-156`). Canonicalization is a
Morgan-style iterative refinement of atom invariants followed by a
deterministic DFS with ring-closure digits; aromatic systems are written in
lowercase (kekulization-invariant), so equal graphs give equal strings.

This is NOT guaranteed to match RDKit's canonical form — it is canonical
*within* this framework (same molecule -> same string), which is what the
uniqueness/novelty/dedup metrics require.
"""
from __future__ import annotations

from typing import Dict, List, Set, Tuple

from .mol import AROMATIC, Mol
from .periodic import ORGANIC_SUBSET
from .sanitize import perceive_aromaticity

BOND_SYMBOL = {1: "", 2: "=", 3: "#"}


def _initial_invariant(mol: Mol, i: int) -> Tuple:
    a = mol.atoms[i]
    return (
        a.z,
        a.charge,
        mol.degree(i),
        int(round(mol.valence_sum(i) * 2)),
        mol.implicit_h(i),
        int(a.aromatic),
    )


def canonical_ranks(mol: Mol) -> List[int]:
    """Morgan-style refinement: ranks stable under neighborhood hashing."""
    n = mol.num_atoms
    inv = [_initial_invariant(mol, i) for i in range(n)]
    ranks = _ranks_from_keys(inv)
    for _ in range(n + 2):
        new_keys = []
        for i in range(n):
            nb = sorted(
                (ranks[j], mol.bonds[mol._adj[i][j]].order) for j in mol._adj[i]
            )
            new_keys.append((ranks[i], tuple(nb)))
        new_ranks = _ranks_from_keys(new_keys)
        if new_ranks == ranks:
            break
        ranks = new_ranks
    # break remaining ties deterministically (by current rank, then index)
    if len(set(ranks)) < n:
        order = sorted(range(n), key=lambda i: (ranks[i], i))
        final = [0] * n
        for r, i in enumerate(order):
            final[i] = r
        ranks = final
    return ranks


def _ranks_from_keys(keys: List) -> List[int]:
    sorted_unique = sorted(set(keys))
    lookup = {k: r for r, k in enumerate(sorted_unique)}
    return [lookup[k] for k in keys]


def _atom_token(mol: Mol, i: int) -> str:
    a = mol.atoms[i]
    sym = a.symbol
    arom = a.aromatic and a.z in (5, 6, 7, 8, 15, 16)
    body = sym.lower() if arom else sym
    n_h = mol.implicit_h(i)

    needs_bracket = (
        a.z not in ORGANIC_SUBSET
        or a.charge != 0
        or (arom and a.z == 7 and n_h > 0)  # pyrrole [nH]
    )
    if not needs_bracket:
        return body
    h_part = "" if n_h == 0 else ("H" if n_h == 1 else f"H{n_h}")
    if a.charge == 0:
        c_part = ""
    elif a.charge == 1:
        c_part = "+"
    elif a.charge == -1:
        c_part = "-"
    else:
        c_part = f"{a.charge:+d}"
    return f"[{body}{h_part}{c_part}]"


def _bond_token(mol: Mol, i: int, j: int) -> str:
    b = mol.bond_between(i, j)
    if b.order == AROMATIC:
        return ""  # implicit between aromatic atoms
    if b.order == 1 and mol.atoms[i].aromatic and mol.atoms[j].aromatic:
        return "-"  # explicit single between two aromatic atoms (biphenyl)
    return BOND_SYMBOL[b.order]


def mol_to_smiles(mol: Mol, canonical: bool = True) -> str:
    """Write (canonical) SMILES; disconnected components joined by '.'."""
    perceive_aromaticity(mol)
    ranks = canonical_ranks(mol) if canonical else list(range(mol.num_atoms))

    parts = []
    comps = mol.connected_components()
    comps.sort(key=lambda c: min(ranks[i] for i in c))
    visited_global: Set[int] = set()
    for comp in comps:
        root = min(comp, key=lambda i: ranks[i])
        parts.append(_write_component(mol, root, ranks))
        visited_global.update(comp)
    return ".".join(parts)


def _write_component(mol: Mol, root: int, ranks: List[int]) -> str:
    """Two passes: (1) deterministic DFS -> tree children + back edges in
    visit order; (2) emit tokens with ring-closure digits."""
    # pass 1: iterative DFS, children ordered by canonical rank
    order: List[int] = []
    tree_children: Dict[int, List[int]] = {}
    back_edges: List[Tuple[int, int]] = []  # (first-visited u, second v)
    visited: Set[int] = set()
    seen_edges: Set[Tuple[int, int]] = set()

    def dfs(u: int, parent: int):
        visited.add(u)
        order.append(u)
        tree_children[u] = []
        for v in sorted(mol._adj[u], key=lambda j: (ranks[j], j)):
            if v == parent:
                continue
            key = (min(u, v), max(u, v))
            if v in visited:
                if key not in seen_edges:
                    seen_edges.add(key)
                    back_edges.append((v, u))  # v was visited first
            else:
                seen_edges.add(key)
                tree_children[u].append(v)
                dfs(v, u)

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        dfs(root, -1)
    finally:
        sys.setrecursionlimit(old_limit)

    # assign ring-closure digits in order of the *second* endpoint's visit
    pos_in_order = {a: k for k, a in enumerate(order)}
    back_edges.sort(key=lambda e: (pos_in_order[e[1]], pos_in_order[e[0]]))
    ring_digits: Dict[int, List[Tuple[int, int]]] = {}  # atom -> [(digit, other)]
    for d, (u, v) in enumerate(back_edges, start=1):
        ring_digits.setdefault(u, []).append((d, v))
        ring_digits.setdefault(v, []).append((d, u))

    # pass 2: emit
    out: List[str] = []

    def emit(u: int):
        out.append(_atom_token(mol, u))
        for d, v in sorted(ring_digits.get(u, ())):
            # bond symbol printed at the closing (second) occurrence
            if pos_in_order[v] < pos_in_order[u]:
                out.append(_bond_token(mol, u, v) + _digit_token(d))
            else:
                out.append(_digit_token(d))
        kids = tree_children[u]
        for idx, v in enumerate(kids):
            btok = _bond_token(mol, u, v)
            if idx < len(kids) - 1:
                out.append("(" + btok)
                emit(v)
                out.append(")")
            else:
                out.append(btok)
                emit(v)

    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        emit(root)
    finally:
        sys.setrecursionlimit(old_limit)
    return "".join(out)


def _digit_token(d: int) -> str:
    return str(d) if d < 10 else f"%{d:02d}"
