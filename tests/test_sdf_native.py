"""Native C++ SDF parser (native/sdf_parser.cpp + chem/sdf_native.py):
must be interchangeable with the Python parser — identical atoms, coords,
charges, bonds, and identical None slots for broken records."""
import os

import numpy as np
import pytest

from moldiff_tpu.chem.sdf import read_sdf, write_sdf
from moldiff_tpu.chem.sdf_native import native_available, read_sdf_native
from moldiff_tpu.data.synthetic import random_molecule

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native sdf parser not built"
)


def _assert_mols_equal(a, b):
    assert a.num_atoms == b.num_atoms and a.num_bonds == b.num_bonds
    for x, y in zip(a.atoms, b.atoms):
        assert x.z == y.z and x.charge == y.charge
        np.testing.assert_allclose(x.pos, y.pos, atol=1e-9)
    for x, y in zip(a.bonds, b.bonds):
        assert (x.i, x.j, x.order) == (y.i, y.j, y.order)


class TestParity:
    def test_roundtrip_random_corpus(self, tmp_path):
        rng = np.random.default_rng(0)
        mols = [random_molecule(rng) for _ in range(50)]
        path = str(tmp_path / "corpus.sdf")
        write_sdf(mols, path)
        py = list(read_sdf(path))
        nat = read_sdf_native(path)
        assert len(py) == len(nat) == 50
        for a, b in zip(py, nat):
            _assert_mols_equal(a, b)

    def test_charges_preserved(self, tmp_path):
        rng = np.random.default_rng(1)
        mol = random_molecule(rng)
        mol.atoms[0].charge = 1
        mol.atoms[-1].charge = -1
        path = str(tmp_path / "chg.sdf")
        write_sdf([mol], path)
        (py,), (nat,) = list(read_sdf(path)), read_sdf_native(path)
        _assert_mols_equal(py, nat)
        assert nat.atoms[0].charge == 1 and nat.atoms[-1].charge == -1

    def test_broken_record_yields_none_in_both(self, tmp_path):
        rng = np.random.default_rng(2)
        good = random_molecule(rng)
        path = str(tmp_path / "mix.sdf")
        write_sdf([good], path)
        with open(path, "a") as f:
            f.write("broken\n\n\n  1  0  0  0  0  0  0  0  0  0999 V2000\n")
            f.write("  bad atom line\n")
            f.write("M  END\n$$$$\n")
        write_sdf([good], str(tmp_path / "tail.sdf"))
        with open(str(tmp_path / "tail.sdf")) as f:
            tail = f.read()
        with open(path, "a") as f:
            f.write(tail)
        py = list(read_sdf(path))
        nat = read_sdf_native(path)
        assert len(py) == len(nat) == 3
        assert py[1] is None and nat[1] is None
        _assert_mols_equal(py[0], nat[0])
        _assert_mols_equal(py[2], nat[2])

    def test_no_trailing_separator(self, tmp_path):
        """A final record without $$$$ is still parsed (read_sdf tail
        handling)."""
        rng = np.random.default_rng(3)
        mol = random_molecule(rng)
        path = str(tmp_path / "tailless.sdf")
        write_sdf([mol], path)
        with open(path) as f:
            content = f.read()
        assert content.endswith("$$$$\n")
        with open(path, "w") as f:
            f.write(content[: -len("$$$$\n")])
        py = list(read_sdf(path))
        nat = read_sdf_native(path)
        assert len(py) == len(nat) == 1
        _assert_mols_equal(py[0], nat[0])

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            read_sdf_native("/nonexistent/x.sdf")

    def test_dataset_parse_one_uses_native(self, tmp_path):
        """_parse_one routes through the native arrays path when built."""
        from moldiff_tpu.data.dataset import _parse_one

        rng = np.random.default_rng(4)
        sdf_dir = str(tmp_path)
        write_sdf([random_molecule(rng)], os.path.join(sdf_dir, "7.sdf"))
        rec = _parse_one("7", sdf_dir)
        assert rec is not None and rec["molid"] == "7"
        assert rec["pos"].shape[0] == 1  # one conformer


class TestArraysPath:
    def test_record_parity_with_mol_path(self, tmp_path):
        """The ingestion fast path (read_sdf_arrays -> parse_conf_arrays)
        must produce byte-identical records to the Mol-building path
        (read_sdf -> parse_conf_list)."""
        from moldiff_tpu.data.dataset import parse_conf_arrays, parse_conf_list
        from moldiff_tpu.chem.sdf_native import read_sdf_arrays

        rng = np.random.default_rng(6)
        for trial in range(10):
            # multi-conformer: same molecule, jittered positions
            mol = random_molecule(rng)
            confs = []
            for _ in range(3):
                c = mol.copy()
                for a in c.atoms:
                    a.pos = a.pos + rng.normal(0, 0.05, 3)
                confs.append(c)
            path = str(tmp_path / f"m{trial}.sdf")
            write_sdf(confs, path)
            ref = parse_conf_list(list(read_sdf(path)), molid=trial)
            fast = parse_conf_arrays(read_sdf_arrays(path), molid=trial)
            assert ref is not None and fast is not None
            for k in ("element", "bond_index", "bond_type"):
                np.testing.assert_array_equal(ref[k], fast[k])
                assert ref[k].dtype == fast[k].dtype
            np.testing.assert_allclose(ref["pos"], fast["pos"], atol=0)
            assert ref["pos"].dtype == fast["pos"].dtype

    def test_inconsistent_conformers_rejected(self, tmp_path):
        from moldiff_tpu.data.dataset import parse_conf_arrays
        from moldiff_tpu.chem.sdf_native import read_sdf_arrays

        rng = np.random.default_rng(7)
        a, b = random_molecule(rng), random_molecule(rng)
        while a.num_atoms == b.num_atoms:
            b = random_molecule(rng)
        path = str(tmp_path / "bad.sdf")
        write_sdf([a, b], path)
        assert parse_conf_arrays(read_sdf_arrays(path)) is None

    def test_duplicate_bond_rejected_like_mol_path(self, tmp_path):
        from moldiff_tpu.chem.sdf_native import read_sdf_arrays

        rng = np.random.default_rng(8)
        mol = random_molecule(rng)
        path = str(tmp_path / "dup.sdf")
        write_sdf([mol], path)
        text = open(path).read().splitlines()
        # duplicate the first bond line (python parser: MolError -> None)
        bond_ln = 4 + mol.num_atoms
        text.insert(bond_ln, text[bond_ln])
        counts = text[3]
        text[3] = counts[:3] + f"{mol.num_bonds + 1:>3d}" + counts[6:]
        with open(path, "w") as f:
            f.write("\n".join(text) + "\n")
        py = list(read_sdf(path))
        nat = read_sdf_arrays(path)
        assert py[0] is None and nat[0] is None


class TestThroughput:
    def test_ingestion_path_completes(self, tmp_path):
        """Report-only: the deployed ingestion fast path (arrays, no Mol
        objects) vs the Python path on a multi-conformer corpus. Measured
        1.4x on dev hardware (docs/PERFORMANCE.md); no ratio assert — CI
        noise."""
        import time

        from moldiff_tpu.chem.sdf_native import read_sdf_arrays
        from moldiff_tpu.data.dataset import parse_conf_arrays, parse_conf_list

        rng = np.random.default_rng(5)
        paths = []
        for t in range(50):
            mol = random_molecule(rng)
            confs = []
            for _ in range(5):
                c = mol.copy()
                for a in c.atoms:
                    a.pos = a.pos + rng.normal(0, 0.05, 3)
                confs.append(c)
            p = str(tmp_path / f"{t}.sdf")
            write_sdf(confs, p)
            paths.append(p)
        t0 = time.time()
        ref = [parse_conf_list(list(read_sdf(p))) for p in paths]
        t_py = time.time() - t0
        t0 = time.time()
        fast = [parse_conf_arrays(read_sdf_arrays(p)) for p in paths]
        t_nat = time.time() - t0
        print(f"ingestion 50x5-conf files: python {t_py*1e3:.1f} ms, "
              f"native {t_nat*1e3:.1f} ms ({t_py/max(t_nat,1e-9):.1f}x)")
        assert all(r is not None for r in ref)
        assert all(f is not None for f in fast)
