"""Guards the COMMITTED pretrained demo checkpoint artifact
(ckpts/demo_synthetic_30k.ckpt, configs/sample/sample_demo.yml): the repo
promises an out-of-the-box sampling quickstart (README), so the artifact
must stay loadable, dtype-correct, and runnable through the real model.

The reference ships no checkpoint (/root/reference/ckpt/ holds only a
README telling users to download one); shipping a small runnable artifact
is part of this framework's standalone story."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moldiff_tpu.data.featurize import featurizer_from_config
from moldiff_tpu.models.moldiff import MolDiff
from moldiff_tpu.ops import graph_ops
from moldiff_tpu.train.trainer import load_checkpoint
from moldiff_tpu.utils.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "ckpts", "demo_synthetic_30k.ckpt")
BP_CKPT = os.path.join(REPO, "ckpts", "demo_bondpred_4k.ckpt")


@pytest.fixture(scope="module")
def ckpt():
    assert os.path.exists(CKPT), "committed demo checkpoint missing"
    return load_checkpoint(CKPT)


def test_demo_ckpt_contract(ckpt):
    """Distribution format: params + full train config + step, resume state
    stripped, f16 storage upcast to f32 by load_checkpoint."""
    assert ckpt["step"] == 30000
    assert ckpt["opt_state"] is None and ckpt["scheduler"] is None
    leaves = jax.tree.leaves(ckpt["params"])
    assert leaves, "empty params tree"
    for leaf in leaves:
        assert leaf.dtype != np.float16  # storage f16 must be upcast
    cfg = Config(ckpt["config"])
    assert cfg.model.name == "diffusion"
    # the embedded config must be sufficient to rebuild the featurizer
    # (the sample CLI contract, scripts/sample_drug3d.py:136-147)
    feat = featurizer_from_config(cfg)
    assert feat.num_node_types >= 8


def test_demo_ckpt_forward_runs(ckpt):
    """One denoiser forward from the committed weights on CPU: finite heads
    at the right shapes (the full-chain TPU run is the README quickstart;
    this keeps the artifact wired into the fast lane)."""
    cfg = Config(ckpt["config"])
    cfg.model.denoiser["remat"] = False
    feat = featurizer_from_config(cfg)
    model = MolDiff(cfg.model, num_node_types=feat.num_node_types,
                    num_edge_types=feat.num_edge_types)
    b, n = 2, 8
    e = graph_ops.num_halfedges(n)
    rng = np.random.default_rng(0)
    h_node = jax.nn.one_hot(rng.integers(0, feat.num_node_types, (b, n)),
                            feat.num_node_types)
    h_edge = jax.nn.one_hot(rng.integers(0, feat.num_edge_types, (b, e)),
                            feat.num_edge_types)
    pos = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    t = jnp.asarray([3, 150], jnp.int32)
    node_mask = jnp.ones((b, n), jnp.float32).at[1, 6:].set(0.0)
    preds = model.forward(ckpt["params"], h_node, pos, h_edge, t, node_mask)
    assert preds.pred_node.shape == (b, n, feat.num_node_types)
    assert preds.pred_pos.shape == (b, n, 3)
    assert preds.pred_halfedge.shape == (b, e, feat.num_edge_types)
    for arr in (preds.pred_node, preds.pred_pos, preds.pred_halfedge):
        assert bool(jnp.isfinite(arr).all())


def test_demo_bondpred_ckpt_runs():
    """The committed bond-predictor weights (the guided quickstart,
    configs/sample/sample_demo_guided.yml) load and produce finite edge
    logits at the sample-time vocabulary (no mask class on edges —
    scripts/sample_drug3d.py:163-166)."""
    from moldiff_tpu.models.bond_predictor import BondPredictor

    assert os.path.exists(BP_CKPT), "committed bond-pred checkpoint missing"
    ckpt = load_checkpoint(BP_CKPT)
    assert ckpt["opt_state"] is None
    cfg = Config(ckpt["config"])
    assert cfg.model.name == "bond_predictor"
    feat = featurizer_from_config(cfg)
    cfg.model.encoder["remat"] = False
    bp = BondPredictor(cfg.model, num_node_types=feat.num_node_types,
                       num_edge_types=feat.num_bond_types + 1)
    b, n = 2, 8
    rng = np.random.default_rng(1)
    h_node = jax.nn.one_hot(rng.integers(0, feat.num_node_types, (b, n)),
                            feat.num_node_types)
    pos = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    t = jnp.asarray([5, 100], jnp.int32)
    node_mask = jnp.ones((b, n), jnp.float32).at[1, 5:].set(0.0)
    logits = bp.forward(ckpt["params"], h_node, pos, t, node_mask)
    assert logits.shape == (b, graph_ops.num_halfedges(n),
                            feat.num_bond_types + 1)
    assert bool(jnp.isfinite(logits).all())


def test_demo_fast_config_respaced_chain(ckpt):
    """Guards configs/sample/sample_demo_fast.yml (the advertised fast
    respaced quickstart, ADVICE r2): the config must resolve against the
    committed ckpt's T=200 and a short respaced chain must run through the
    real model on CPU (num_steps from the config, tiny batch)."""
    from moldiff_tpu.utils.config import load_config

    scfg = load_config(os.path.join(REPO, "configs", "sample",
                                    "sample_demo_fast.yml"))
    assert scfg.model.checkpoint.endswith("demo_synthetic_30k.ckpt")
    num_steps = scfg.sample.num_steps
    cfg = Config(ckpt["config"])
    T = cfg.model.diff.num_timesteps
    assert 0 < num_steps < T, (num_steps, T)
    assert T % num_steps == 0, "respacing must stride T evenly"

    cfg.model.denoiser["remat"] = False
    feat = featurizer_from_config(cfg)
    model = MolDiff(cfg.model, num_node_types=feat.num_node_types,
                    num_edge_types=feat.num_edge_types)
    node_mask = jnp.ones((2, 8), jnp.float32).at[1, 6:].set(0.0)
    res = model.sample(ckpt["params"], node_mask, jax.random.key(0),
                       num_steps=num_steps)
    for arr in (res.pred_node, res.pred_pos, res.pred_halfedge):
        assert bool(jnp.isfinite(arr).all())
