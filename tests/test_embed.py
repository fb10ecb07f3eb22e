"""Distance-geometry conformer generation tests (chem/embed.py — the
ETKDG analogue behind the global_3d RMSD metric,
reference utils/scoring_func.py:56-74)."""
import numpy as np
import pytest

from moldiff_tpu.chem.bond_perception import expected_length
from moldiff_tpu.chem.embed import (
    bounds_matrix,
    generate_conformers,
    smooth_bounds,
)
from moldiff_tpu.chem.mol import AROMATIC, Mol
from moldiff_tpu.eval.rmsd import best_embedding_rmsd, kabsch_rmsd


def butane():
    m = Mol()
    for _ in range(4):
        m.add_atom(6)
    for i in range(3):
        m.add_bond(i, i + 1, 1)
    return m


def benzene_with_coords():
    m = Mol()
    r = 1.39
    for k in range(6):
        a = m.add_atom(6)
        m.atoms[a].pos = np.array(
            [r * np.cos(k * np.pi / 3), r * np.sin(k * np.pi / 3), 0.0]
        )
    for i in range(6):
        m.add_bond(i, (i + 1) % 6, AROMATIC)
    return m


class TestBounds:
    def test_bond_bounds_tight(self):
        b = smooth_bounds(bounds_matrix(butane()))
        want = expected_length(6, 6, 1)
        for i in range(3):
            assert b[i, i + 1, 0] == pytest.approx(want, abs=0.05)
            assert b[i, i + 1, 1] == pytest.approx(want, abs=0.05)

    def test_triangle_consistent(self):
        b = smooth_bounds(bounds_matrix(butane()))
        lo, up = b[..., 0], b[..., 1]
        assert (lo <= up + 1e-9).all()
        n = lo.shape[0]
        for i in range(n):
            for j in range(n):
                for k in range(n):
                    assert up[i, j] <= up[i, k] + up[k, j] + 1e-6


class TestConformers:
    def test_bond_lengths_respected(self):
        m = butane()
        for conf in generate_conformers(m, 5, seed=1):
            for b in m.bonds:
                d = np.linalg.norm(conf[b.i] - conf[b.j])
                assert abs(d - expected_length(6, 6, 1)) < 0.15, d

    def test_deterministic(self):
        m = butane()
        a = generate_conformers(m, 3, seed=7)
        b = generate_conformers(m, 3, seed=7)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_rigid_molecule_low_rmsd(self):
        """Benzene is rigid: DG re-embedding must recover its geometry."""
        m = benzene_with_coords()
        r = best_embedding_rmsd(m, n_conformers=10, seed=0)
        assert r is not None and r < 0.3, r

    def test_angles_reasonable(self):
        m = butane()
        conf = generate_conformers(m, 1, seed=0)[0]
        for j in (1, 2):
            v1 = conf[j - 1] - conf[j]
            v2 = conf[j + 1] - conf[j]
            cos = v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2))
            ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
            assert 95 < ang < 125, ang
