"""Evaluation suite tests: fingerprints, descriptors, SA, local3d matching,
metrics families, JSD, similarity."""
import numpy as np
import pytest

from moldiff_tpu.chem.mol import AROMATIC, Mol
from moldiff_tpu.data.synthetic import make_synthetic_dataset, random_molecule
from moldiff_tpu.eval.descriptors import (
    all_descriptors,
    crippen_logp,
    lipinski,
    num_hba,
    num_hbd,
    num_rotatable_bonds,
    qed,
    tpsa,
)
from moldiff_tpu.eval.fingerprint import (
    morgan_fingerprint,
    morgan_fragments,
    pairwise_diversity,
    tanimoto,
)
from moldiff_tpu.eval.jsd import counter_jsd, hist_jsd
from moldiff_tpu.eval.local3d import (
    Local3D,
    bond_angle,
    dihedral_angle,
    match_paths,
    parse_path_smarts,
)
from moldiff_tpu.eval.metrics import (
    RingAnalyzer,
    calculate_validity,
    drug_chem,
    frags_counts,
    get_metric,
    ring_topo,
)
from moldiff_tpu.eval.sa_score import FragmentScorer, sa_score
from moldiff_tpu.eval.similarity import SimilarityAnalysis


def benzene(pos=True):
    m = Mol()
    for k in range(6):
        t = k * np.pi / 3
        m.add_atom(6, pos=(1.39 * np.cos(t), 1.39 * np.sin(t), 0.0) if pos else None)
    for i in range(6):
        m.add_bond(i, (i + 1) % 6, AROMATIC)
    return m


def aspirin_like():
    """Phenol + ester-ish test molecule with N."""
    m = benzene()
    o = m.add_atom(8, pos=(2.8, 0, 0))
    m.add_bond(0, o, 1)  # phenol O
    n = m.add_atom(7, pos=(-2.8, 0, 0))
    m.add_bond(3, n, 1)  # aniline N
    return m


class TestFingerprint:
    def test_identical_mols_sim_1(self):
        assert tanimoto(morgan_fingerprint(benzene()), morgan_fingerprint(benzene())) == 1.0

    def test_different_mols_sim_below_1(self):
        m2 = aspirin_like()
        s = tanimoto(morgan_fingerprint(benzene()), morgan_fingerprint(m2))
        assert 0.0 < s < 1.0

    def test_permutation_invariant(self, rng):
        mol = random_molecule(rng)
        fp1 = morgan_fingerprint(mol)
        perm = rng.permutation(mol.num_atoms)
        inv = np.argsort(perm)
        m2 = Mol()
        for k in range(mol.num_atoms):
            a = mol.atoms[perm[k]]
            m2.add_atom(a.z, a.charge, pos=a.pos)
        for b in mol.bonds:
            m2.add_bond(int(inv[b.i]), int(inv[b.j]), b.order)
        assert tanimoto(fp1, morgan_fingerprint(m2)) == 1.0


class TestDescriptors:
    def test_benzene(self):
        m = benzene()
        d = all_descriptors(m)
        assert d["mw"] == pytest.approx(78.11, abs=0.1)
        assert d["hba"] == 0 and d["hbd"] == 0
        assert d["n_aromatic_rings"] == 1
        assert d["tpsa"] == 0.0
        assert 1.5 < d["logp"] < 2.5  # RDKit: 1.69

    def test_phenol_amine(self):
        m = aspirin_like()
        assert num_hba(m) == 2
        assert num_hbd(m) == 3  # OH + NH2
        assert tpsa(m) == pytest.approx(20.23 + 26.02, abs=0.1)

    def test_qed_range(self, rng):
        for _ in range(10):
            mol = random_molecule(rng)
            q = qed(mol)
            assert 0.0 < q < 1.0

    def test_lipinski_small_mol(self):
        assert lipinski(benzene()) == 5

    def test_rotatable(self):
        # butane C-C-C-C: 1 rotatable bond
        m = Mol()
        for _ in range(4):
            m.add_atom(6)
        for i in range(3):
            m.add_bond(i, i + 1, 1)
        assert num_rotatable_bonds(m) == 1


class TestSA:
    def test_score_range(self, rng):
        for _ in range(10):
            s = sa_score(random_molecule(rng))
            assert 1.0 <= s <= 10.0

    def test_fragment_scorer_fit(self, rng):
        mols = [random_molecule(rng) for _ in range(30)]
        scorer = FragmentScorer.fit(mols)
        assert scorer.scores
        # common fragments score higher than unseen
        s_seen = sa_score(mols[0], scorer)
        assert 1.0 <= s_seen <= 10.0

    def test_bigger_is_harder(self):
        small = random_molecule(np.random.default_rng(1), n_atoms=8)
        big = random_molecule(np.random.default_rng(1), n_atoms=38)
        assert sa_score(big) > sa_score(small)


class TestLocal3D:
    def test_parse(self):
        atoms, bonds = parse_path_smarts("c:c-[#6]")
        assert atoms == [(6, True), (6, True), (6, None)]
        assert bonds == [AROMATIC, 1]

    def test_match_benzene(self):
        m = benzene()
        matches = match_paths(m, "c:c")
        assert len(matches) == 6
        assert len(match_paths(m, "c:c:c")) == 6
        assert len(match_paths(m, "[#6]-[#6]")) == 0

    def test_geometry(self):
        pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [1, 1, 1]], float)
        assert bond_angle(pos, 0, 1, 2) == pytest.approx(90.0)
        assert abs(dihedral_angle(pos, 0, 1, 2, 3)) == pytest.approx(90.0)

    def test_calc_frequent(self):
        l3d = Local3D()
        l3d.get_predefined()
        res = l3d.calc_frequent([benzene()], "length")
        assert len(res["c:c"]) == 6
        np.testing.assert_allclose(res["c:c"], 1.39, atol=0.01)
        angles = l3d.calc_frequent([benzene()], "angle")
        np.testing.assert_allclose(angles["c:c:c"], 120.0, atol=0.5)

    def test_predefined_lists_pin_reference(self):
        """The three predefined SMARTS sets must equal the reference's
        verbatim (utils/evaluation.py:195-208 get_predefined) — a silently
        dropped pattern shrinks the JSD panel without failing anything.
        Extracted by AST so no rdkit import is needed."""
        import ast
        import os

        ref = "/root/reference/utils/evaluation.py"
        if not os.path.exists(ref):
            pytest.skip("reference checkout unavailable")
        with open(ref) as f:
            tree = ast.parse(f.read())
        lists = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign) and len(node.targets) == 1:
                tgt = node.targets[0]
                if isinstance(tgt, ast.Name) and tgt.id in (
                        "bonds_smarts", "pairs_smarts", "triplet_smarts"):
                    lists[tgt.id] = [
                        e.value for e in node.value.elts
                        if isinstance(e, ast.Constant)]
        from moldiff_tpu.eval.local3d import (
            PREDEFINED_ANGLES, PREDEFINED_BONDS, PREDEFINED_DIHEDRALS)
        assert lists["bonds_smarts"] == PREDEFINED_BONDS
        assert lists["pairs_smarts"] == PREDEFINED_ANGLES
        assert lists["triplet_smarts"] == PREDEFINED_DIHEDRALS


class TestMetrics:
    def test_families_run(self, rng):
        mols = [random_molecule(rng) for _ in range(5)]
        for fam in ("drug_chem", "count_prop", "frags_counts",
                    "groups_counts", "ring_topo"):
            out = get_metric(mols, fam)
            assert len(out) == 5

    def test_frags_counts_benzene(self):
        c = frags_counts(benzene())
        assert c["elem_C"] == 6
        assert c["bond_aromatic"] == 6
        assert c["ring_size_6"] == 1

    def test_validity(self):
        good = {
            "element": np.array([6, 6]),
            "atom_pos": np.zeros((2, 3)),
            "bond_index": np.array([[0], [1]]),
            "bond_type": np.array([1]),
        }
        bad = {
            "element": np.array([9, 9]),
            "atom_pos": np.zeros((2, 3)),
            "bond_index": np.array([[0, 0], [1, 1]]),  # F=F nonsense
            "bond_type": np.array([2, 2]),
        }
        disc = {
            "element": np.array([6, 6]),
            "atom_pos": np.zeros((2, 3)),
            "bond_index": np.zeros((2, 0), dtype=int),
            "bond_type": np.zeros((0,), dtype=int),
        }
        v = calculate_validity([good, bad, disc])
        assert v["n_complete"] == 1 and v["n_invalid"] == 1 and v["n_disconnect"] == 1
        assert v["validity"] == pytest.approx(2 / 3)
        assert v["connectivity"] == pytest.approx(1 / 2)

    def test_ring_analyzer(self, rng):
        mols = [benzene() for _ in range(3)]
        rings, counts = RingAnalyzer().get_freq_rings(mols)
        assert counts[0] == 3


class TestJSD:
    def test_identical_zero(self, rng):
        x = rng.normal(size=1000)
        assert hist_jsd(x, x, bin_width=0.1) == pytest.approx(0.0, abs=1e-9)

    def test_different_positive(self, rng):
        a = rng.normal(0, 1, 1000)
        b = rng.normal(3, 1, 1000)
        assert hist_jsd(a, b, bin_width=0.1) > 0.5

    def test_counter_jsd(self):
        assert counter_jsd({"a": 10, "b": 5}, {"a": 10, "b": 5}) == pytest.approx(0.0, abs=1e-12)
        assert counter_jsd({"a": 10}, {"b": 10}) == pytest.approx(1.0, abs=1e-9)


class TestSimilarity:
    def test_all_metrics(self, rng):
        train = [random_molecule(rng) for _ in range(10)]
        val = [random_molecule(rng) for _ in range(5)]
        gen = [random_molecule(rng) for _ in range(6)] + [train[0]]
        sim = SimilarityAnalysis(train_mols=train, val_mols=val)
        m = sim.all_metrics(gen)
        assert 0 <= m["uniqueness"] <= 1
        assert m["novelty"] <= 1 and m["novelty"] >= 0
        # train[0] included -> novelty < 1
        assert m["novelty"] < 1.0
        assert 0 <= m["sim_with_train"] <= 1
        assert 0 <= m["diversity"] <= 1

    def test_cache_roundtrip(self, rng, tmp_path):
        train = [random_molecule(rng) for _ in range(5)]
        p = str(tmp_path / "fps.pkl")
        s1 = SimilarityAnalysis(train_mols=train, cache_path=p)
        s2 = SimilarityAnalysis(cache_path=p)
        gen = [random_molecule(rng) for _ in range(3)]
        assert s1.sim_with_train(gen) == pytest.approx(s2.sim_with_train(gen))


class TestAlerts:
    def test_nitro_detected(self):
        from moldiff_tpu.eval.alerts import count_alerts

        m = Mol()
        c = m.add_atom(6)
        n = m.add_atom(7, charge=1)
        o1 = m.add_atom(8)
        o2 = m.add_atom(8, charge=-1)
        m.add_bond(c, n, 1)
        m.add_bond(n, o1, 2)
        m.add_bond(n, o2, 1)
        assert count_alerts(m).get("nitro", 0) == 1

    def test_peroxide_detected(self):
        from moldiff_tpu.eval.alerts import count_alerts, passes_alert_filter

        m = Mol()
        c1, o1, o2, c2 = m.add_atom(6), m.add_atom(8), m.add_atom(8), m.add_atom(6)
        m.add_bond(c1, o1, 1)
        m.add_bond(o1, o2, 1)
        m.add_bond(o2, c2, 1)
        assert count_alerts(m).get("peroxide", 0) >= 1
        assert not passes_alert_filter(m)

    def test_benzene_clean(self):
        from moldiff_tpu.eval.alerts import passes_alert_filter

        assert passes_alert_filter(benzene())

    def test_qed_penalizes_alerts(self, monkeypatch):
        # more structural alerts must lower QED for an otherwise identical
        # descriptor vector (isolates the ALERTS channel: across different
        # molecules the other seven descriptors can legitimately dominate)
        import moldiff_tpu.eval.alerts as alerts_mod

        m = Mol()
        a, b, c = m.add_atom(6), m.add_atom(6), m.add_atom(6)
        m.add_bond(a, b, 1)
        m.add_bond(b, c, 1)
        monkeypatch.setattr(alerts_mod, "num_alerts", lambda mol: 0)
        q0 = qed(m)
        monkeypatch.setattr(alerts_mod, "num_alerts", lambda mol: 3)
        q3 = qed(m)
        assert q3 < q0


class TestFailureAnalysis:
    def test_disconnect_autopsy_and_pool(self):
        from moldiff_tpu.eval.failure_analysis import analyze_pool, disconnect_autopsy

        # two fragments: 0-1 bonded, 2 unbonded at 1.8 A from atom 1
        decoded = {
            "element": np.array([6, 6, 8]),
            "atom_pos": np.array([[0, 0, 0], [1.5, 0, 0], [3.3, 0, 0]], float),
            "bond_index": np.array([[0], [1]]),
            "bond_type": np.array([1]),
        }
        a = disconnect_autopsy(decoded)
        assert a["n_fragments"] == 2 and a["fragment_sizes"] == [2, 1]
        assert a["min_gaps"][0] == pytest.approx(1.8)

        far = dict(decoded)
        far["atom_pos"] = np.array([[0, 0, 0], [1.5, 0, 0], [8.0, 0, 0]], float)
        pool = {
            "finished": [{"smiles": "CC"}],
            "failed": [
                {"reason": "disconnect", "decoded": decoded},
                {"reason": "disconnect", "decoded": far},
                {"reason": "recon_error", "decoded": decoded},
            ],
        }
        r = analyze_pool(pool)
        assert r["success"] == pytest.approx(0.25)
        assert r["failure_modes"] == {"disconnect": 2, "recon_error": 1}
        assert r["disconnect_bondtype"] == 1   # 1.8 A gap: touching, unbonded
        assert r["disconnect_geometry"] == 1   # 6.5 A gap: spatially separated
