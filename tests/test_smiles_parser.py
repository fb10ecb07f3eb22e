"""First-party SMILES reader (chem/smiles.py:mol_from_smiles).

The reference leans on RDKit MolFromSmiles throughout its eval stack; this
is our equivalent. Descriptor goldens below are published Ertl-TPSA /
RDKit-MolLogP values for well-known drugs, so they cross-validate the
parser AND the descriptor engines end-to-end.
"""
import numpy as np
import pytest

from moldiff_tpu.chem import AROMATIC, MolError
from moldiff_tpu.chem.smiles import SmilesError, mol_from_smiles, mol_to_smiles
from moldiff_tpu.eval.crippen import logp
from moldiff_tpu.eval.descriptors import tpsa


class TestParserBasics:
    def test_linear_chain(self):
        m = mol_from_smiles("CCO")
        assert m.num_atoms == 3
        assert [a.z for a in m.atoms] == [6, 6, 8]
        assert m.num_bonds == 2

    def test_bond_orders(self):
        m = mol_from_smiles("C=C")
        assert m.bonds[0].order == 2
        m = mol_from_smiles("C#N")
        assert m.bonds[0].order == 3

    def test_branches(self):
        m = mol_from_smiles("CC(C)(C)C")  # neopentane
        assert m.num_atoms == 5
        assert m.degree(1) == 4

    def test_two_letter_organic(self):
        m = mol_from_smiles("ClCBr")
        assert [a.z for a in m.atoms] == [17, 6, 35]

    def test_ring_closure(self):
        m = mol_from_smiles("C1CCCCC1")  # cyclohexane
        assert m.num_atoms == 6
        assert m.num_bonds == 6

    def test_percent_ring_closure(self):
        m = mol_from_smiles("C%11CCCCC%11")
        assert m.num_bonds == 6

    def test_dot_components(self):
        m = mol_from_smiles("C1CC1.O")
        assert len(m.connected_components()) == 2
        assert "." in mol_to_smiles(m)

    def test_aromatic_ring(self):
        m = mol_from_smiles("c1ccccc1")
        assert all(a.aromatic for a in m.atoms)
        assert all(b.order == AROMATIC for b in m.bonds)

    def test_biphenyl_interring_bond_single(self):
        m = mol_from_smiles("c1ccccc1c1ccccc1")
        singles = [b for b in m.bonds if b.order == 1]
        assert len(singles) == 1
        assert len([b for b in m.bonds if b.order == AROMATIC]) == 12

    def test_pyrrole_nh(self):
        m = mol_from_smiles("c1cc[nH]c1")
        n = next(i for i, a in enumerate(m.atoms) if a.z == 7)
        assert m.atoms[n].num_explicit_h == 1
        assert m.atoms[n].aromatic

    def test_bracket_charge(self):
        m = mol_from_smiles("C[N+](C)(C)C")
        n = next(i for i, a in enumerate(m.atoms) if a.z == 7)
        assert m.atoms[n].charge == 1
        m = mol_from_smiles("[O-]C=O", sanitize_mol=False)
        assert m.atoms[0].charge == -1

    def test_bracket_isotope_chirality_map_ignored(self):
        m = mol_from_smiles("[13CH4]", sanitize_mol=False)
        assert m.atoms[0].z == 6 and m.atoms[0].num_explicit_h == 4
        m = mol_from_smiles("N[C@@H](C)C(=O)O")  # alanine
        assert m.num_atoms == 6
        m = mol_from_smiles("[CH4:7]", sanitize_mol=False)
        assert m.atoms[0].num_explicit_h == 4

    def test_directional_bonds_parse_as_single(self):
        m = mol_from_smiles("C/C=C/C")
        assert [b.order for b in m.bonds] == [1, 2, 1]


class TestParserErrors:
    @pytest.mark.parametrize("bad", [
        "", "C(", "C)", "C1CC", "C=", "C==C", "CC.=C", "[Xx]", "C1CC2",
        "[C@", "%1C", "1CC",
    ])
    def test_malformed(self, bad):
        with pytest.raises((SmilesError, MolError)):
            mol_from_smiles(bad)

    def test_explicit_hydrogen_atom_rejected(self):
        with pytest.raises(SmilesError):
            mol_from_smiles("[H]O[H]")

    def test_ring_bond_order_mismatch(self):
        with pytest.raises(SmilesError):
            mol_from_smiles("C=1CCCCC-1")

    def test_ring_bond_order_agreement_ok(self):
        m = mol_from_smiles("C=1CCCCC=1")
        assert sum(1 for b in m.bonds if b.order == 2) == 1

    def test_sanitize_rejects_texas_carbon(self):
        with pytest.raises(MolError):
            mol_from_smiles("C(C)(C)(C)(C)C")


class TestRoundTrip:
    DRUGS = [
        "CC(=O)Oc1ccccc1C(=O)O",
        "CC(=O)Nc1ccc(O)cc1",
        "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
        "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
        "CN1CCCC1c1cccnc1",
        "c1ccc2ccccc2c1",
        "C[N+](C)(C)C",
        "c1cc[nH]c1",
    ]

    @pytest.mark.parametrize("s", DRUGS)
    def test_write_parse_write_stable(self, s):
        m = mol_from_smiles(s)
        c1 = mol_to_smiles(m)
        assert mol_to_smiles(mol_from_smiles(c1)) == c1

    def test_random_molecules_round_trip(self):
        from moldiff_tpu.data.synthetic import random_molecule

        rng = np.random.default_rng(11)
        for _ in range(100):
            m = random_molecule(rng)
            s1 = mol_to_smiles(m)
            assert mol_to_smiles(mol_from_smiles(s1)) == s1


class TestDescriptorGoldens:
    """Published Ertl-TPSA / RDKit-MolLogP values through the parser."""

    CASES = [
        # (smiles, TPSA, MolLogP) — TPSA from Ertl 2000 / PubChem; logP from
        # RDKit Descriptors.MolLogP
        ("CC(=O)Oc1ccccc1C(=O)O", 63.60, 1.31),      # aspirin
        ("CC(=O)Nc1ccc(O)cc1", 49.33, 1.35),         # paracetamol
        ("CC(C)Cc1ccc(cc1)C(C)C(=O)O", 37.30, 3.07), # ibuprofen
        ("CN1CCCC1c1cccnc1", 16.13, 1.52),           # nicotine
        ("c1ccccc1", 0.0, 1.69),                     # benzene
    ]

    # published Ertl-TPSA values for complex drugs (parser + aromatic
    # perception + N/O typing all have to be right to reproduce these)
    TPSA_ONLY = [
        ("CN1c2ccc(Cl)cc2C(=NCC1=O)c1ccccc1", 32.67),          # diazepam
        ("CN(C)CCCN1c2ccccc2Sc2ccc(Cl)cc21", 6.48),            # chlorpromazine
        ("CC(=O)CC(c1ccccc1)c1c(O)c2ccccc2oc1=O", 67.51),      # warfarin
        ("Cc1ccc(cc1)c1cc(nn1c1ccc(cc1)S(=O)(=O)N)C(F)(F)F",
         77.98),                                                # celecoxib
        ("CCCc1nn(C)c2c1nc([nH]c2=O)c1cc(ccc1OCC)S(=O)(=O)N1CCN(C)CC1",
         113.42),                                               # sildenafil
    ]

    @pytest.mark.parametrize("s,want_tpsa,want_logp", CASES)
    def test_tpsa_and_logp(self, s, want_tpsa, want_logp):
        m = mol_from_smiles(s)
        assert tpsa(m) == pytest.approx(want_tpsa, abs=0.01)
        assert logp(m) == pytest.approx(want_logp, abs=0.02)

    @pytest.mark.parametrize("s,want_tpsa", TPSA_ONLY)
    def test_complex_drug_tpsa(self, s, want_tpsa):
        assert tpsa(mol_from_smiles(s)) == pytest.approx(want_tpsa, abs=0.01)


class TestExplicitHChemistry:
    """Regression: sanitize/kekulize must RESPECT explicit [nH] overrides —
    found via parser round-trip fuzzing (tetrazole gained a second NH, and
    check_valence ignored explicit H entirely)."""

    def test_tetrazole_single_nh_preserved(self):
        m = mol_from_smiles("c1nnn[nH]1")
        nh = [i for i, a in enumerate(m.atoms)
              if a.z == 7 and (a.num_explicit_h or 0) >= 1]
        assert len(nh) == 1

    def test_purine_single_nh_preserved(self):
        m = mol_from_smiles("c1ncc2[nH]cnc2n1")
        nh = sum(1 for a in m.atoms
                 if a.z == 7 and (a.num_explicit_h or 0) >= 1)
        assert nh == 1

    def test_heteroaromatic_round_trips_stable(self):
        for s in ["c1nnn[nH]1", "c1ncc2[nH]cnc2n1", "c1cc[nH]n1",
                  "O=c1cccc[nH]1", "c1c[nH]cn1"]:
            out = mol_to_smiles(mol_from_smiles(s))
            assert mol_to_smiles(mol_from_smiles(out)) == out, s

    def test_check_valence_counts_explicit_h(self):
        """[NH4] (neutral N with 4 explicit H) must be a valence error."""
        with pytest.raises(MolError):
            mol_from_smiles("C[NH3]")  # N: 1 bond + 3 H = 4 > 3
        m = mol_from_smiles("C[NH2]")  # 1 + 2 = 3: fine
        assert m.num_atoms == 2
