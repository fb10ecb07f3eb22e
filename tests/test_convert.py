"""Reference-checkpoint converter tests: torch-module name/shape parity and
numerical equivalence of the shared building blocks."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax
import jax.numpy as jnp

from moldiff_tpu.models.moldiff import MolDiff
from moldiff_tpu.models.nn import mlp as our_mlp, linear as our_linear
from moldiff_tpu.utils.config import Config
from moldiff_tpu.utils.convert import (
    convert_moldiff_state_dict,
    linear_from_torch,
    mlp_from_torch,
)


def torch_mlp(in_dim, out_dim, hidden, num_layer=2):
    """Reference MLP structure (models/common.py:181-201)."""
    layers = []
    for k in range(num_layer):
        if k == 0:
            layers.append(nn.Linear(in_dim, hidden))
        elif k == num_layer - 1:
            layers.append(nn.Linear(hidden, out_dim))
        else:
            layers.append(nn.Linear(hidden, hidden))
        if k < num_layer - 1:
            layers.append(nn.LayerNorm(hidden))
            layers.append(nn.ReLU())
    m = nn.Module()
    m.net = nn.Sequential(*layers)
    return m


class TestBuildingBlocks:
    def test_mlp_numerical_equivalence(self):
        tm = torch_mlp(8, 6, 16)
        sd = {f"m.{k}": v for k, v in tm.state_dict().items()}
        ours = mlp_from_torch(sd, "m")
        x = np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32)
        with torch.no_grad():
            ref = tm.net(torch.from_numpy(x)).numpy()
        out = np.asarray(our_mlp(jax.tree.map(jnp.asarray, ours), jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_linear_transpose(self):
        tl = nn.Linear(4, 7)
        sd = {f"l.{k}": v for k, v in tl.state_dict().items()}
        ours = linear_from_torch(sd, "l")
        x = np.random.default_rng(1).normal(size=(3, 4)).astype(np.float32)
        with torch.no_grad():
            ref = tl(torch.from_numpy(x)).numpy()
        out = np.asarray(our_linear(jax.tree.map(jnp.asarray, ours), jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def build_reference_moldiff_modules(node_dim=16, edge_dim=8, time_dim=4,
                                    num_blocks=2, kn=8, ke=6):
    """Reference MolDiff module tree with plain torch layers (same names as
    models/model.py + models/graph.py; forward never called, only
    state_dict names/shapes matter)."""
    root = nn.Module()
    root.node_embedder = nn.Linear(kn, node_dim - time_dim, bias=False)
    root.edge_embedder = nn.Linear(ke, edge_dim - time_dim, bias=False)

    den = nn.Module()
    den.node_blocks_with_edge = nn.ModuleList()
    den.edge_embs = nn.ModuleList()
    den.edge_blocks = nn.ModuleList()
    den.pos_blocks = nn.ModuleList()
    for _ in range(num_blocks):
        nb = nn.Module()
        nb.node_net = torch_mlp(node_dim, node_dim, node_dim)
        nb.edge_net = torch_mlp(edge_dim, node_dim, node_dim)
        nb.msg_net = nn.Linear(node_dim, node_dim)
        nb.gate = torch_mlp(edge_dim + node_dim + 1, node_dim, node_dim)
        nb.centroid_lin = nn.Linear(node_dim, node_dim)
        nb.layer_norm = nn.LayerNorm(node_dim)
        nb.out_transform = nn.Linear(node_dim, node_dim)
        den.node_blocks_with_edge.append(nb)
        den.edge_embs.append(nn.Linear(edge_dim + 16, edge_dim))

        def bond_ffn(bond, node, inter, out=None):
            out = bond if out is None else out
            m = nn.Module()
            m.bond_linear = nn.Linear(bond, inter, bias=False)
            m.node_linear = nn.Linear(node, inter, bias=False)
            m.inter_module = torch_mlp(inter, out, inter)
            m.gate = torch_mlp(bond + node + 1, out, 32)
            return m

        eb = nn.Module()
        eb.bond_ffn_left = bond_ffn(edge_dim, node_dim, edge_dim * 2)
        eb.bond_ffn_right = bond_ffn(edge_dim, node_dim, edge_dim * 2)
        eb.node_ffn_left = nn.Linear(node_dim, edge_dim)
        eb.node_ffn_right = nn.Linear(node_dim, edge_dim)
        eb.self_ffn = nn.Linear(edge_dim, edge_dim)
        eb.layer_norm = nn.LayerNorm(edge_dim)
        eb.out_transform = nn.Linear(edge_dim, edge_dim)
        den.edge_blocks.append(eb)

        pb = nn.Module()
        pb.left_lin_edge = torch_mlp(node_dim, edge_dim, edge_dim)
        pb.right_lin_edge = torch_mlp(node_dim, edge_dim, edge_dim)
        pb.edge_lin = bond_ffn(edge_dim, edge_dim, node_dim, out=1)
        den.pos_blocks.append(pb)
    root.denoiser = den
    root.node_decoder = torch_mlp(node_dim, kn, node_dim)
    root.edge_decoder = torch_mlp(edge_dim, ke, edge_dim)
    return root


class TestFullConversion:
    def test_structure_and_forward(self):
        cfg = Config({
            "node_dim": 16,
            "edge_dim": 8,
            "denoiser": {"num_blocks": 2, "cutoff": 10, "use_gate": True},
            "diff": {
                "num_timesteps": 8, "time_dim": 4,
                "categorical_space": "discrete",
                "diff_pos": {"beta_schedule": "advance", "scale_start": 0.9999,
                             "scale_end": 0.0001, "width": 3},
                "diff_atom": {"init_prob": "tomask", "beta_schedule": "advance",
                              "scale_start": 0.9999, "scale_end": 0.0001,
                              "width": 3},
                "diff_bond": {"init_prob": "absorb", "beta_schedule": "advance",
                              "scale_start": 0.9999, "scale_end": 0.0001,
                              "width": 3},
            },
        })
        ref_modules = build_reference_moldiff_modules()
        sd = {k: v for k, v in ref_modules.state_dict().items()}
        converted = convert_moldiff_state_dict(sd, cfg)

        model = MolDiff(cfg, 8, 6)
        expected = model.init_params(jax.random.key(0))
        # same tree structure and leaf shapes
        conv_flat, conv_def = jax.tree.flatten(converted)
        exp_flat, exp_def = jax.tree.flatten(expected)
        assert conv_def == exp_def
        for a, b in zip(conv_flat, exp_flat):
            assert a.shape == b.shape, (a.shape, b.shape)

        # converted params run through the full forward
        import moldiff_tpu.ops.graph_ops as g

        b, n = 2, 6
        e = g.num_halfedges(n)
        h_node = jax.nn.one_hot(jnp.zeros((b, n), jnp.int32), 8)
        pos = jnp.zeros((b, n, 3))
        h_he = jax.nn.one_hot(jnp.zeros((b, e), jnp.int32), 6)
        t = jnp.full((b,), 3, jnp.int32)
        mask = jnp.ones((b, n))
        preds = model.forward(converted, h_node, pos, h_he, t, mask)
        assert np.isfinite(np.asarray(preds.pred_node)).all()


class TestConvertCLI:
    def test_convert_then_sample(self, tmp_path):
        """Full migration path: reference-style .pt -> convert CLI -> our
        checkpoint -> sample CLI loads and runs it."""
        import os
        import subprocess
        import sys

        ref = build_reference_moldiff_modules()
        cfg = {
            "model": {
                "name": "diffusion", "node_dim": 16, "edge_dim": 8,
                "denoiser": {"backbone": "NodeEdgeNet", "num_blocks": 2,
                             "cutoff": 10, "use_gate": True},
                "diff": {
                    "num_timesteps": 6, "time_dim": 4,
                    "categorical_space": "discrete",
                    "diff_pos": {"beta_schedule": "advance",
                                 "scale_start": 0.9999, "scale_end": 0.0001,
                                 "width": 3},
                    "diff_atom": {"init_prob": "tomask",
                                  "beta_schedule": "advance",
                                  "scale_start": 0.9999,
                                  "scale_end": 0.0001, "width": 3},
                    "diff_bond": {"init_prob": "absorb",
                                  "beta_schedule": "advance",
                                  "scale_start": 0.9999,
                                  "scale_end": 0.0001, "width": 3},
                },
            },
            "transform": {"use_mask_node": True, "use_mask_edge": True},
            "chem": {"atomic_numbers": [6, 7, 8, 9, 15, 16, 17],
                     "mol_bond_types": [1, 2, 3, 4]},
        }
        pt = str(tmp_path / "ref.pt")
        torch.save({"config": cfg, "model": ref.state_dict(), "iteration": 7},
                   pt)
        out = str(tmp_path / "conv.ckpt")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts",
                                          "convert_reference_ckpt.py"),
             "--input", pt, "--output", out],
            capture_output=True, text=True, cwd=repo,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr[-800:]
        assert os.path.exists(out)

        # sample from the converted checkpoint through the real CLI
        import yaml as _yaml

        scfg = {"model": {"checkpoint": out},
                "sample": {"seed": 0, "batch_size": 4, "num_mols": 1,
                           "save_traj_prob": 0.0}}
        sp = str(tmp_path / "s.yml")
        with open(sp, "w") as f:
            _yaml.safe_dump(scfg, f)
        r2 = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "sample_drug3d.py"),
             "--config", sp, "--outdir", str(tmp_path / "out"),
             "--batch_size", "4"],
            capture_output=True, text=True, cwd=repo,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r2.returncode == 0, r2.stderr[-800:]


class TestReverseExport:
    def test_export_roundtrip_via_cli(self, tmp_path):
        """OURS -> reference torch .pt (--reverse) -> re-import through the
        forward converter == the original param tree exactly. Closes the
        interop loop: a model trained HERE is usable by the reference
        codebase (scripts/sample_drug3d.py:49-50 checkpoint format)."""
        import os
        import pickle
        import subprocess
        import sys

        import jax

        from moldiff_tpu.models.moldiff import MolDiff
        from moldiff_tpu.utils.config import Config

        cfg = {
            "model": {
                "name": "diffusion", "node_dim": 16, "edge_dim": 8,
                "denoiser": {"backbone": "NodeEdgeNet", "num_blocks": 2,
                             "cutoff": 10, "use_gate": True},
                "diff": {
                    "num_timesteps": 6, "time_dim": 4,
                    "categorical_space": "discrete",
                    "diff_pos": {"beta_schedule": "advance",
                                 "scale_start": 0.9999, "scale_end": 0.0001,
                                 "width": 3},
                    "diff_atom": {"init_prob": "tomask",
                                  "beta_schedule": "advance",
                                  "scale_start": 0.9999,
                                  "scale_end": 0.0001, "width": 3},
                    "diff_bond": {"init_prob": "absorb",
                                  "beta_schedule": "advance",
                                  "scale_start": 0.9999,
                                  "scale_end": 0.0001, "width": 3},
                },
            },
        }
        model = MolDiff(Config(cfg["model"]), 8, 6)
        params = model.init_params(jax.random.key(3))
        blob = {
            "config": cfg,
            "params": jax.tree.map(np.asarray, params),
            "opt_state": None, "step": 42, "scheduler": None, "key": None,
            "extra": {},
        }
        ours = str(tmp_path / "ours.ckpt")
        with open(ours, "wb") as f:
            pickle.dump(blob, f)

        pt = str(tmp_path / "export.pt")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts",
                                          "convert_reference_ckpt.py"),
             "--reverse", "--input", ours, "--output", pt],
            capture_output=True, text=True, cwd=repo,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr[-800:]

        ckpt = torch.load(pt, map_location="cpu", weights_only=False)
        assert ckpt["iteration"] == 42
        assert ckpt["config"]["model"]["node_dim"] == 16
        sd = {k: v.numpy() for k, v in ckpt["model"].items()}
        reimported = convert_moldiff_state_dict(sd, Config(cfg["model"]))
        orig_flat, orig_def = jax.tree.flatten(params)
        re_flat, re_def = jax.tree.flatten(reimported)
        assert orig_def == re_def
        for a, b in zip(orig_flat, re_flat):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
