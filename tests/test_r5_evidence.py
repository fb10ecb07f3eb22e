"""Round-5 evidence guards: the committed claims must match the committed
artifacts.

README / BASELINE / config comments quote specific measured numbers; these
tests pin the evidence JSONs so a stale or hand-edited claim can't drift
from what was actually measured.
"""
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(REPO, "results", name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not committed")
    with open(path) as f:
        return json.load(f)


class TestRound5Evidence:
    def test_commit_nodes_gate_claim(self):
        r = _load("gate_r5_commit_nodes.json")["runs"]["unguided"]
        assert r["sanitize_mode"] == "reference"
        assert 0.70 <= r["success_rate"] <= 0.80  # README claims 0.745
        assert r["jsd_vs_test"]["jsd_elem"] < 0.15  # vs 0.336 baseline
        assert r["accept_stage_counts"].get("fix_aromatic", 0) > 50

    def test_10k_headline_claim(self):
        ev = _load("soak_r5_10k.json")
        r = ev["runs"]["unguided"]
        assert ev["num_mols"] == 10000
        assert r["num_finished"] == 10000
        lo, hi = r["success_wilson95"]
        assert lo <= r["success_rate"] <= hi
        assert 0.70 <= r["success_rate"] <= 0.82  # BASELINE claims 0.7556

    def test_guided_geometry_vs_success_claim(self):
        g = _load("gate_r5_guided_modelbonds.json")["runs"]["guided"]
        u = _load("gate_r5_commit_nodes.json")["runs"]["unguided"]
        # guidance hurts success in the categorical regime...
        assert g["success_rate"] < u["success_rate"]
        # ...while the geometry panels improve (discriminative panels)
        assert (g["jsd_vs_test"]["jsd_length_mean"]
                < u["jsd_vs_test"]["jsd_length_mean"])
        assert (g["jsd_vs_test"]["jsd_angle_mean"]
                < u["jsd_vs_test"]["jsd_angle_mean"])

    def test_negative_ladder_is_ordered(self):
        """Every documented negative must actually measure below the
        champion (keeps the ladder honest if artifacts are regenerated)."""
        champ = _load("gate_r5_commit_nodes.json")["runs"]["unguided"][
            "success_rate"]
        for name in ("gate_r5_commit_both.json",
                     "gate_r5_v0ce_none.json",
                     "gate_r5_v0ce_nodes.json",
                     "gate_r5_cont_nodes.json"):
            ev = _load(name)
            r = next(iter(ev["runs"].values()))
            assert r["success_rate"] < champ, name

    def test_acceptance_parity_one_sided(self):
        p = _load("acceptance_parity_r5_10k.json")
        # the repo cascade is documented MORE lenient: molecules accepted
        # only by the reference search must not exist
        div = p.get("divergence", p)
        only_ref = div.get("only_reference",
                           p.get("n_only_reference", 0))
        if isinstance(only_ref, list):
            only_ref = len(only_ref)
        assert only_ref == 0

    def test_edge_guidance_dial_claims(self):
        """Session-2 claims: edge guidance trades success for aromatic
        fidelity + connectivity, and late-gating (tmax=300) is
        statistically identical to always-on (segment schedule freezes
        the early chain)."""
        champ = _load("gate_r5_commit_nodes.json")["runs"]["unguided"]
        eg1 = next(iter(_load("gate_r5_eg1.json")["runs"].values()))
        egt = next(iter(_load("gate_r5_eg1t300.json")["runs"].values()))
        for r in (eg1, egt):
            assert r["success_rate"] < champ["success_rate"]      # dial, not win
            assert r["connectivity"] > champ["connectivity"]      # disconnects fixed
            assert (r["aromatic_mol_fraction"]
                    > champ["aromatic_mol_fraction"] + 0.2)       # corpus-level
        assert abs(eg1["success_rate"] - egt["success_rate"]) < 0.04

    def test_flagship_config_defaults_commit(self):
        import yaml

        with open(os.path.join(
                REPO, "configs/sample/sample_flagship_v2.yml")) as f:
            cfg = yaml.safe_load(f)
        assert cfg["sample"]["commit"] == "nodes"
        assert cfg["sample"]["sanitize_mode"] == "reference"
