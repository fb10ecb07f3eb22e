"""ctypes binding for the native SDF parser (native/sdf_parser.cpp).

Fast path for the dataset ingestion hot loop (the reference uses RDKit's
C++ SDMolSupplier there, /root/reference/utils/dataset.py:106-113).
Semantics mirror the Python parser exactly: one entry per ``$$$$`` record,
``None`` for unparsable records (parity-tested in tests/test_sdf_native.py).
Builds the .so on first use via make; callers fall back to the Python
parser when no compiler is available.

Measured (small drug-like molecules, docs/PERFORMANCE.md): raw text->
arrays parse is ~7x Python, the end-to-end ingestion record path
(:func:`read_sdf_arrays` + ``parse_conf_arrays``) 1.4x — numpy
post-processing and cross-conformer checks bound it. Building Mol objects
through :func:`read_sdf_native` is 0.8x (Python object construction
dominates), so Mol-producing callers keep the pure-Python ``read_sdf``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from .mol import Mol

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "native")
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libsdf_parser.so")

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _load_native() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-s"], cwd=_NATIVE_DIR, check=True,
                capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.sdf_parse_file.restype = ctypes.c_void_p
    lib.sdf_parse_file.argtypes = [ctypes.c_char_p]
    lib.sdf_num_mols.restype = ctypes.c_int64
    lib.sdf_num_mols.argtypes = [ctypes.c_void_p]
    lib.sdf_mol_counts.restype = ctypes.c_int64
    lib.sdf_mol_counts.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.sdf_mol_fill.restype = ctypes.c_int
    lib.sdf_mol_fill.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sdf_totals.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.sdf_fill_all.restype = ctypes.c_int
    lib.sdf_fill_all.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sdf_free.argtypes = [ctypes.c_void_p]
    return lib


def native_available() -> bool:
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _load_native()
        _LIB_TRIED = True
    return _LIB is not None


def _parse_batch(path: str):
    """ONE native parse + ONE batch fill: returns per-record
    ``(z, pos [n,3] f64, charge, bonds [m,3])`` tuples or None slots.
    Three ctypes calls per FILE (not per molecule)."""
    h = _LIB.sdf_parse_file(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        n_mols = int(_LIB.sdf_num_mols(h))
        ta = ctypes.c_int64()
        tb = ctypes.c_int64()
        _LIB.sdf_totals(h, ctypes.byref(ta), ctypes.byref(tb))
        n_atoms = np.empty(n_mols, np.int64)
        n_bonds = np.empty(n_mols, np.int64)
        z = np.empty(max(ta.value, 1), np.int32)
        pos = np.empty(max(3 * ta.value, 1), np.float64)
        charge = np.empty(max(ta.value, 1), np.int32)
        bonds = np.empty(max(3 * tb.value, 1), np.int32)
        rc = _LIB.sdf_fill_all(
            h,
            n_atoms.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n_bonds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            z.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            charge.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            bonds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise RuntimeError(f"sdf_fill_all rc={rc}")
    finally:
        _LIB.sdf_free(h)

    out = []
    za = ba = 0
    pos3 = pos.reshape(-1, 3)
    bonds3 = bonds.reshape(-1, 3)
    for i in range(n_mols):
        if n_atoms[i] < 0:
            out.append(None)
            continue
        n, m = int(n_atoms[i]), int(n_bonds[i])
        out.append((
            z[za:za + n], pos3[za:za + n], charge[za:za + n],
            bonds3[ba:ba + m],
        ))
        za += n
        ba += m
    return out


def read_sdf_native(path: str) -> List[Optional[Mol]]:
    """Parse a whole .sdf file natively into Mol objects; raises
    RuntimeError if the native library is unavailable (use
    :func:`read_sdf_fast` for auto-fallback)."""
    if not native_available():
        raise RuntimeError("native sdf parser unavailable")
    out: List[Optional[Mol]] = []
    for rec in _parse_batch(path):
        if rec is None:
            out.append(None)
            continue
        z, pos3, charge, bonds3 = rec
        mol = Mol()
        for a in range(len(z)):
            mol.add_atom(int(z[a]), pos=tuple(pos3[a]))
            if charge[a]:
                mol.atoms[a].charge = int(charge[a])
        try:
            for i, j, o in bonds3:
                mol.add_bond(int(i), int(j), int(o))
        except Exception:
            out.append(None)  # bad bond indices, like molblock_to_mol
            continue
        out.append(mol)
    return out


def read_sdf_arrays(path: str) -> List[Optional[dict]]:
    """Ingestion fast path: text -> canonical record arrays WITHOUT building
    Mol objects (the dataset record needs only arrays — data/dataset.py:
    mol_to_arrays). Each entry: {element int16, pos float32 [n,3],
    bond_index int16 [2,m] (i<j, sorted by flat i*n+j, duplicates/directed
    pairs collapsed), bond_type int8 [m]} or None for unparsable records.
    Raises RuntimeError when the native library is unavailable."""
    if not native_available():
        raise RuntimeError("native sdf parser unavailable")
    out: List[Optional[dict]] = []
    for rec in _parse_batch(path):
        if rec is None:
            out.append(None)
            continue
        z, pos3, _charge, bonds3 = rec
        n = len(z)
        if len(bonds3):
            i = bonds3[:, 0].astype(np.int64)
            j = bonds3[:, 1].astype(np.int64)
            bt_raw = bonds3[:, 2].astype(np.int64)
            # strict Mol.add_bond semantics (chem/mol.py:73-85): reject
            # out-of-range / self / duplicate bonds and bad orders, so the
            # record set is identical to the Mol-building path
            if (
                ((i < 0) | (j < 0) | (i >= n) | (j >= n) | (i == j)).any()
                or (~np.isin(bt_raw, (1, 2, 3, 4))).any()
            ):
                out.append(None)
                continue
            lo, hi = np.minimum(i, j), np.maximum(i, j)
            flat = lo * n + hi
            if len(np.unique(flat)) != len(flat):
                out.append(None)  # duplicate bond -> MolError
                continue
            order = np.argsort(flat, kind="stable")
            bi = np.stack([lo[order], hi[order]]).astype(np.int16)
            bt = bt_raw[order].astype(np.int8)
        else:
            bi = np.zeros((2, 0), np.int16)
            bt = np.zeros((0,), np.int8)
        out.append({
            "element": z.astype(np.int16),
            "pos": pos3.astype(np.float32),
            "bond_index": bi,
            "bond_type": bt,
        })
    return out
