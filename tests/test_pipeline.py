"""End-to-end pipeline tests: sample -> unpad -> decode -> reconstruct, SDF
round-trip, and the classify/pool logic on handcrafted perfect predictions."""
import numpy as np
import pytest

from moldiff_tpu.chem.mol import AROMATIC, Mol
from moldiff_tpu.chem.sdf import mol_to_molblock, molblock_to_mol, read_sdf, write_sdf
from moldiff_tpu.chem.smiles import mol_to_smiles
from moldiff_tpu.data.featurize import MolFeaturizer
from moldiff_tpu.models.moldiff import MolDiff
from moldiff_tpu.sample.pipeline import MolSampler, classify_decoded
from moldiff_tpu.utils.config import Config

import jax


def tiny_model():
    cfg = Config(
        {
            "node_dim": 16,
            "edge_dim": 8,
            "denoiser": {"num_blocks": 1, "cutoff": 10, "use_gate": True},
            "diff": {
                "num_timesteps": 8,
                "time_dim": 4,
                "categorical_space": "discrete",
                "diff_pos": {"beta_schedule": "advance", "scale_start": 0.9999,
                             "scale_end": 0.0001, "width": 3},
                "diff_atom": {"init_prob": "tomask", "beta_schedule": "advance",
                              "scale_start": 0.9999, "scale_end": 0.0001, "width": 3},
                "diff_bond": {"init_prob": "absorb", "beta_schedule": "advance",
                              "scale_start": 0.9999, "scale_end": 0.0001, "width": 3},
            },
        }
    )
    return MolDiff(cfg, 8, 6)


class TestSamplerPipeline:
    @pytest.mark.slow
    def test_generate_runs_and_classifies(self):
        model = tiny_model()
        params = model.init_params(jax.random.key(0))
        feat = MolFeaturizer()
        sampler = MolSampler(model, feat, buckets=(8, 12), batch_size=16)
        rng = np.random.default_rng(0)
        sizes = np.array([5, 7, 9, 4], dtype=np.int64)
        decoded = sampler.sample_sizes(params, sizes, jax.random.key(1))
        assert len(decoded) == 4
        for d, n in zip(decoded, sizes):
            assert len(d["element"]) <= n  # mask atoms may be stripped
            assert d["atom_pos"].shape[1] == 3
        # pool classification must not crash (untrained model -> mostly failed)
        pool = {"finished": 0, "failed": 0}
        for d in decoded:
            entry = classify_decoded(d)
            pool[entry["pool"]] += 1
        assert pool["finished"] + pool["failed"] == 4

    @pytest.mark.slow
    def test_generate_pool_loop(self):
        model = tiny_model()
        params = model.init_params(jax.random.key(0))
        sampler = MolSampler(model, MolFeaturizer(), buckets=(8,), batch_size=8,
                             size_mean=5.0, size_std=1.0)
        pool = sampler.generate(params, num_mols=2, key=jax.random.key(2),
                                max_failures_factor=20, batch_graphs=8)
        assert len(pool["finished"]) <= 2
        # every entry classified
        for e in pool["finished"]:
            assert "smiles" in e and "." not in e["smiles"]

    @pytest.mark.slow
    def test_generate_bernoulli_trajectories(self, monkeypatch):
        """Per-molecule Bernoulli(save_traj_prob) across the pool (reference
        scripts/sample_drug3d.py:156-170): p=1 -> every finished molecule
        carries its full [T+1] trajectory; failed entries never do; p=0.5
        keeps a strict subset. The classifier is stubbed so the untrained
        tiny model still yields 'finished' entries to attach to."""
        import moldiff_tpu.sample.pipeline as pl

        real_classify = pl.classify_decoded
        calls = {"n": 0}

        def fake_classify(decoded, add_edge=None, sanitize_mode="reference"):
            calls["n"] += 1
            e = real_classify(decoded, add_edge=add_edge,
                              sanitize_mode=sanitize_mode)
            if calls["n"] % 2:  # force half the pool to 'finished'
                e["pool"] = "finished"
                e.setdefault("smiles", "C")
            return e

        monkeypatch.setattr(pl, "classify_decoded", fake_classify)
        model = tiny_model()
        params = model.init_params(jax.random.key(0))
        T = model.num_timesteps

        def run(p, mols=4):
            sampler = MolSampler(model, MolFeaturizer(), buckets=(8,),
                                 batch_size=8, size_mean=5.0, size_std=1.0)
            return sampler.generate(
                params, num_mols=mols, key=jax.random.key(2),
                rng=np.random.default_rng(9), max_failures_factor=50,
                batch_graphs=8, traj_prob=p,
            )

        pool = run(1.0)
        assert len(pool["finished"]) == 4
        for e in pool["finished"]:
            tr = e["traj"]
            n = tr["node"].shape[1]
            assert tr["node"].shape[0] == T + 1
            assert tr["pos"].shape == (T + 1, n, 3)
            assert tr["halfedge"].shape[:2] == (T + 1, n * (n - 1) // 2)
        for e in pool["failed"]:
            assert "traj" not in e

        calls["n"] = 0
        pool_half = run(0.5, mols=8)
        n_traj = sum("traj" in e for e in pool_half["finished"])
        assert 0 < n_traj < len(pool_half["finished"])

    @pytest.mark.slow
    def test_traj_prob_does_not_change_samples(self):
        """Recording trajectories must not perturb the sampled molecules
        (same key, single batch): finished SMILES identical with p=0/p=1."""
        model = tiny_model()
        params = model.init_params(jax.random.key(0))

        def run(p):
            sampler = MolSampler(model, MolFeaturizer(), buckets=(8,),
                                 batch_size=8, size_mean=5.0, size_std=1.0)
            pool = sampler.generate(
                params, num_mols=1, key=jax.random.key(3),
                rng=np.random.default_rng(5), max_failures_factor=50,
                batch_graphs=8, traj_prob=p,
            )
            return [e["smiles"] for e in pool["finished"] + pool["failed"]
                    if "smiles" in e]

        assert run(0.0) == run(1.0)

    def test_perfect_prediction_roundtrip(self):
        """Handcrafted logits for ethanol must survive decode+reconstruct
        exactly (reference-style invariant, SURVEY.md section 4e)."""
        feat = MolFeaturizer()
        n = 3
        # node logits: C C O (+pad classes); huge margins
        pred_node = np.full((n, feat.num_node_types), -10.0)
        pred_node[0, feat.ele_to_nodetype[6]] = 10.0
        pred_node[1, feat.ele_to_nodetype[6]] = 10.0
        pred_node[2, feat.ele_to_nodetype[8]] = 10.0
        pred_pos = np.array([[0, 0, 0], [1.5, 0, 0], [2.2, 1.2, 0]], float)
        e = 3
        pred_he = np.full((e, feat.num_edge_types), -10.0)
        # halfedges in triu order: (0,1), (0,2), (1,2)
        pred_he[0, 1] = 10.0  # single bond 0-1
        pred_he[1, 0] = 10.0  # none 0-2
        pred_he[2, 1] = 10.0  # single bond 1-2
        decoded = feat.decode_output(pred_node, pred_pos, pred_he)
        entry = classify_decoded(decoded)
        assert entry["pool"] == "finished"
        assert entry["smiles"] == "CCO"
        np.testing.assert_allclose(
            np.stack([a.pos for a in entry["mol"].atoms]), pred_pos
        )


class TestSDF:
    def test_molblock_roundtrip(self):
        m = Mol()
        c = m.add_atom(6, pos=(0.1, -0.2, 0.3))
        o = m.add_atom(8, pos=(1.4, 0.0, 0.0))
        nplus = m.add_atom(7, charge=1, pos=(0, 1, 0))
        m.add_bond(c, o, 2)
        m.add_bond(c, nplus, 1)
        block = mol_to_molblock(m, name="test")
        m2 = molblock_to_mol(block)
        assert m2.num_atoms == 3 and m2.num_bonds == 2
        assert m2.atoms[2].charge == 1
        np.testing.assert_allclose(m2.atoms[0].pos, [0.1, -0.2, 0.3], atol=1e-4)
        assert m2.bond_between(0, 1).order == 2

    def test_sdf_multi(self, tmp_path):
        mols = []
        for k in range(3):
            m = Mol()
            a = m.add_atom(6, pos=(k, 0, 0))
            b = m.add_atom(8, pos=(k, 1, 0))
            m.add_bond(a, b, 1)
            mols.append(m)
        p = str(tmp_path / "out.sdf")
        write_sdf(mols, p)
        back = list(read_sdf(p))
        assert len(back) == 3
        assert all(x is not None and x.num_atoms == 2 for x in back)

    def test_aromatic_bond_order_4(self, tmp_path):
        m = Mol()
        for _ in range(6):
            m.add_atom(6, pos=(0, 0, 0))
        for i in range(6):
            m.add_bond(i, (i + 1) % 6, AROMATIC)
        block = mol_to_molblock(m)
        m2 = molblock_to_mol(block)
        assert all(b.order == AROMATIC for b in m2.bonds)
        assert mol_to_smiles(m2) == "c1ccccc1"

    def test_bad_record_yields_none(self, tmp_path):
        p = str(tmp_path / "bad.sdf")
        with open(p, "w") as f:
            f.write("junk\njunk\n\n  1  0  0\n$$$$\n")
        out = list(read_sdf(p))
        assert out == [None]


class TestAromaticDecode:
    def test_perfect_benzene_prediction(self):
        """Handcrafted logits for benzene (aromatic bond class 4) survive
        decode + reconstruct and canonicalize to c1ccccc1."""
        feat = MolFeaturizer()
        n = 6
        pred_node = np.full((n, feat.num_node_types), -10.0)
        pred_node[:, feat.ele_to_nodetype[6]] = 10.0
        theta = np.arange(6) * np.pi / 3
        pred_pos = np.stack([1.39 * np.cos(theta), 1.39 * np.sin(theta),
                             np.zeros(6)], axis=1)
        from moldiff_tpu.ops.graph_ops import triu_indices

        iu, ju = triu_indices(n)
        e = len(iu)
        pred_he = np.full((e, feat.num_edge_types), -10.0)
        ring = {(i, (i + 1) % 6) for i in range(6)}
        ring |= {(j, i) for i, j in ring}
        for k in range(e):
            if (int(iu[k]), int(ju[k])) in ring:
                pred_he[k, 4] = 10.0  # aromatic class
            else:
                pred_he[k, 0] = 10.0
        decoded = feat.decode_output(pred_node, pred_pos, pred_he)
        entry = classify_decoded(decoded)
        assert entry["pool"] == "finished"
        assert entry["smiles"] == "c1ccccc1"

    def test_mask_atoms_stripped(self):
        """Mask-class atoms are dropped with bond reindexing intact."""
        feat = MolFeaturizer()
        n = 4
        pred_node = np.full((n, feat.num_node_types), -10.0)
        pred_node[0, feat.ele_to_nodetype[6]] = 10.0
        pred_node[1, feat.num_node_types - 1] = 10.0  # mask atom
        pred_node[2, feat.ele_to_nodetype[6]] = 10.0
        pred_node[3, feat.ele_to_nodetype[8]] = 10.0
        pred_pos = np.array([[0, 0, 0], [5, 5, 5], [1.5, 0, 0],
                             [2.2, 1.2, 0]], float)
        from moldiff_tpu.ops.graph_ops import triu_indices

        iu, ju = triu_indices(n)
        e = len(iu)
        pred_he = np.full((e, feat.num_edge_types), -10.0)
        want = {(0, 2): 1, (2, 3): 1}
        for k in range(e):
            pred_he[k, want.get((int(iu[k]), int(ju[k])), 0)] = 10.0
        decoded = feat.decode_output(pred_node, pred_pos, pred_he)
        assert len(decoded["element"]) == 3
        entry = classify_decoded(decoded)
        assert entry["pool"] == "finished"
        assert entry["smiles"] == "CCO"


class TestSamplerTraj:
    @pytest.mark.slow
    def test_sample_with_traj_chunked_matches_single(self):
        """MolSampler.sample_with_traj through the chunked path (chunk_steps
        set, as guided sampling configures it) must produce the same decoded
        outputs and trajectory as the single-scan path."""
        model = tiny_model()
        params = model.init_params(jax.random.key(0))
        feat = MolFeaturizer()
        sizes = np.array([5, 6], dtype=np.int32)

        single = MolSampler(model, feat, buckets=(8,), batch_size=2)
        chunked = MolSampler(model, feat, buckets=(8,), batch_size=2,
                             chunk_steps=4)
        dec_s, traj_s, counts_s = single.sample_with_traj(
            params, sizes, jax.random.key(1))
        dec_c, traj_c, counts_c = chunked.sample_with_traj(
            params, sizes, jax.random.key(1))

        assert len(traj_s) == len(traj_c) == 3
        for a, b in zip(traj_s, traj_c):
            assert a.shape == b.shape  # [T+1, B, ...]
            assert a.shape[0] == model.num_timesteps + 1
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(counts_s, counts_c)
        for ds, dc in zip(dec_s, dec_c):
            np.testing.assert_allclose(
                ds["atom_pos"], dc["atom_pos"], rtol=1e-5, atol=1e-6)


class TestParallelClassify:
    def _decoded_batch(self, n=40):
        from moldiff_tpu.data.synthetic import random_molecule

        rng = np.random.default_rng(3)
        out = []
        for _ in range(n):
            m = random_molecule(rng)
            bi = (np.array([[b.i, b.j] for b in m.bonds]).T
                  if m.bonds else np.zeros((2, 0), int))
            out.append({
                "element": np.array([a.z for a in m.atoms]),
                "atom_pos": np.array([a.pos for a in m.atoms]),
                "bond_index": bi,
                "bond_type": np.array([b.order for b in m.bonds], int),
            })
        return out

    @pytest.mark.slow
    def test_pool_matches_serial(self):
        """recon_workers pool must produce entry-for-entry identical pools
        (the sanitize cascade is deterministic)."""
        from moldiff_tpu.sample import pipeline as pl

        decoded = self._decoded_batch()
        serial = pl._classify_batch(decoded, None, None)
        workers = pl._make_classify_pool(2)
        try:
            par = pl._classify_batch(decoded, None, workers)
        finally:
            workers.terminate()
            workers.join()
        assert [e["pool"] for e in serial] == [e["pool"] for e in par]
        assert [e.get("smiles") for e in serial] == [e.get("smiles") for e in par]

    def test_workers_leq_one_is_serial(self):
        from moldiff_tpu.sample import pipeline as pl

        assert pl._make_classify_pool(0) is None
        assert pl._make_classify_pool(1) is None
        assert pl._make_classify_pool(None) is None
