"""End-to-end CLI smoke: synthetic dataset -> train_drug3d -> checkpoint ->
sample_drug3d -> SDF/SMILES outputs. Drives the real script mains."""
import glob
import os
import pickle
import sys

import numpy as np
import pytest
import yaml

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
sys.path.insert(0, SCRIPTS)

from moldiff_tpu.data.synthetic import make_synthetic_dataset, random_molecule
from moldiff_tpu.chem.sanitize import sanitize
from moldiff_tpu.chem.smiles import mol_to_smiles


def tiny_train_cfg(root):
    return {
        "model": {
            "name": "diffusion",
            "node_dim": 16,
            "edge_dim": 8,
            "denoiser": {"backbone": "NodeEdgeNet", "num_blocks": 1, "cutoff": 10,
                         "use_gate": True},
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
        },
        "train": {
            "seed": 7,
            "batch_size": 8,
            "max_iters": 10,
            "val_freq": 5,
            "val_batches": 2,
            "ckpt_freq": 10,
            "pos_noise_std": 0.05,
            "max_grad_norm": 50.0,
            "buckets": [24, 48],
            "optimizer": {"type": "adamw", "lr": 1.0e-3, "weight_decay": 1.0e-8,
                          "beta1": 0.99, "beta2": 0.999},
            "scheduler": {"type": "plateau", "factor": 0.8, "patience": 1000,
                          "min_lr": 1.0e-5},
        },
        "transform": {"use_mask_node": True, "use_mask_edge": True},
        "dataset": {
            "name": "drug3d",
            "root": root,
            "path_dict": {"sdf": "sdf", "summary": "mol_summary.csv",
                          "processed": "processed.mdb"},
            "split": "split_by_molid.pkl",
        },
        "chem": {"atomic_numbers": [6, 7, 8, 9, 15, 16, 17],
                 "mol_bond_types": [1, 2, 3, 4]},
    }


class TestSynthetic:
    def test_random_molecules_valid(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            mol = random_molecule(rng)
            sanitize(mol)  # no raise
            s = mol_to_smiles(mol)
            assert "." not in s  # connected


@pytest.mark.slow
class TestEndToEnd:
    def test_train_then_sample(self, tmp_path):
        root = str(tmp_path / "data")
        make_synthetic_dataset(root, n_mols=60, seed=0)
        assert len(glob.glob(os.path.join(root, "sdf", "*.sdf"))) == 60

        cfg_path = str(tmp_path / "train.yml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(tiny_train_cfg(root), f)

        import train_drug3d

        log_dir = train_drug3d.main(
            ["--config", cfg_path, "--logdir", str(tmp_path / "logs")]
        )
        ckpts = glob.glob(os.path.join(log_dir, "checkpoints", "*.ckpt"))
        assert ckpts, "no checkpoint written"
        assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))

        sample_cfg = {
            "model": {"checkpoint": sorted(ckpts)[-1]},
            "sample": {"seed": 0, "batch_size": 8, "num_mols": 2,
                       "save_traj_prob": 1.0},
        }
        scfg_path = str(tmp_path / "sample.yml")
        with open(scfg_path, "w") as f:
            yaml.safe_dump(sample_cfg, f)

        import sample_drug3d

        out_dir = sample_drug3d.main(
            ["--config", scfg_path, "--outdir", str(tmp_path / "out"),
             "--batch_size", "8",
             # exercise the parallel host-reconstruction wiring end-to-end
             "--recon_workers", "2"]
        )
        assert os.path.exists(os.path.join(out_dir, "samples_all.pkl"))
        with open(os.path.join(out_dir, "samples_all.pkl"), "rb") as f:
            blob = pickle.load(f)
        # untrained tiny model: finished may be < num_mols; pipeline must
        # classify everything it generated
        assert len(blob["finished"]) + len(blob["failed"]) > 0
        if blob["finished"]:
            assert os.path.getsize(os.path.join(out_dir, "SMILES.txt")) > 0
            # save_traj_prob=1.0 -> every finished molecule gets a
            # traj_<idx>.sdf with one entry per reverse step
            trajs = glob.glob(os.path.join(out_dir, "SDF", "traj_*.sdf"))
            assert len(trajs) == len(blob["finished"])
            with open(trajs[0]) as f:
                n_entries = f.read().count("$$$$")
            assert n_entries == tiny_train_cfg(root)["model"]["diff"]["num_timesteps"] + 1

    def test_train_bond_predictor(self, tmp_path):
        root = str(tmp_path / "data")
        make_synthetic_dataset(root, n_mols=40, seed=1)
        cfg = tiny_train_cfg(root)
        cfg["model"] = {
            "name": "bond_predictor",
            "node_dim": 16,
            "edge_dim": 8,
            "encoder": {"backbone": "NodeEdgeNet", "num_blocks": 1, "cutoff": 10,
                        "use_gate": True, "update_edge": True, "update_pos": False},
            "diff": {
                "num_timesteps": 8,
                "time_dim": 4,
                "categorical_space": "discrete",
                "diff_pos": {"beta_schedule": "advance", "scale_start": 0.9999,
                             "scale_end": 0.0001, "width": 3},
                "diff_atom": {"init_prob": "tomask", "beta_schedule": "advance",
                              "scale_start": 0.9999, "scale_end": 0.0001, "width": 3},
            },
        }
        cfg["transform"]["use_mask_edge"] = False
        cfg_path = str(tmp_path / "train_bond.yml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)

        import train_bond

        log_dir = train_bond.main(
            ["--config", cfg_path, "--logdir", str(tmp_path / "logs")]
        )
        assert glob.glob(os.path.join(log_dir, "checkpoints", "*.ckpt"))


class TestEvaluateSmilesMode:
    def test_from_smiles(self, tmp_path):
        """evaluate_all --from_where smiles: 2D metric families on a bare
        SMILES list (possible since chem/smiles.py gained a reader)."""
        import pandas as pd

        import evaluate_all

        smi = tmp_path / "SMILES.txt"
        smi.write_text(
            "CC(=O)Oc1ccccc1C(=O)O aspirin\n"
            "CC(=O)Nc1ccc(O)cc1\n"
            "this_is_not_smiles\n"
            "c1ccccc1\n"
        )
        out = evaluate_all.main([
            "--from_where", "smiles", "--root", str(smi),
            "--outdir", str(tmp_path / "m"),
        ])
        df = pd.read_csv(os.path.join(out, "mols.csv"))
        assert len(df) == 3  # bad line skipped
        assert df.iloc[0]["logp"] == pytest.approx(1.31, abs=0.01)
        assert df.iloc[0]["weight"] == pytest.approx(180.16, abs=0.01)
        assert os.path.exists(os.path.join(out, "freq_ring_type.pkl"))
