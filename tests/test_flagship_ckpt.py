"""Guards the COMMITTED flagship checkpoints (ckpts/flagship_xlft.ckpt,
ckpts/bondpred_40k.ckpt) behind the round-3 headline claims: the repo
promises that a fresh clone reproduces the >=0.99 sampling-success
headline (/root/reference/README.md:2 ">99%") and the guided
distance-bond win from these artifacts alone
(configs/sample/sample_flagship{,_guided}.yml, results/soak_flagship_*).

Skips cleanly while the artifacts are not yet committed (the quality
ladder that produces them runs for hours); once they land these tests
keep them loadable, dtype-correct, and runnable forever.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moldiff_tpu.data.featurize import featurizer_from_config
from moldiff_tpu.models.moldiff import MolDiff
from moldiff_tpu.ops import graph_ops
from moldiff_tpu.train.trainer import load_checkpoint
from moldiff_tpu.utils.config import Config, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "ckpts", "flagship_xlft.ckpt")
BP_CKPT = os.path.join(REPO, "ckpts", "bondpred_40k.ckpt")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="flagship checkpoint not committed yet")


@pytest.fixture(scope="module")
def ckpt():
    return load_checkpoint(CKPT)


def test_flagship_ckpt_contract(ckpt):
    """Distribution format (scripts/strip_checkpoint.py): full reference
    architecture (node_dim 256, 6 blocks, T=1000), resume state stripped,
    f16 storage upcast on load."""
    assert ckpt["step"] == 160000  # 110k + 20k bond_len ft + 30k xl ft
    assert ckpt["opt_state"] is None and ckpt["scheduler"] is None
    for leaf in jax.tree.leaves(ckpt["params"]):
        assert leaf.dtype != np.float16
    cfg = Config(ckpt["config"])
    assert cfg.model.diff.num_timesteps == 1000
    assert cfg.model.denoiser.num_blocks == 6
    assert cfg.model.node_dim == 256
    feat = featurizer_from_config(cfg)
    assert feat.num_node_types >= 8


def test_flagship_configs_resolve(ckpt):
    """Both committed sample configs must point at the committed artifacts
    and carry the headline settings (1000 mols, reference guidance scale)."""
    scfg = load_config(os.path.join(REPO, "configs", "sample",
                                    "sample_flagship.yml"))
    assert scfg.model.checkpoint.endswith("flagship_xlft.ckpt")
    assert scfg.sample.num_mols == 1000
    gcfg = load_config(os.path.join(REPO, "configs", "sample",
                                    "sample_flagship_guided.yml"))
    assert gcfg.model.checkpoint.endswith("flagship_xlft.ckpt")
    assert gcfg.bond_predictor.endswith("bondpred_40k.ckpt")
    assert gcfg.sample.guidance[0] == "uncertainty"
    assert float(gcfg.sample.guidance[1]) == pytest.approx(1e-4)
    assert os.path.exists(os.path.join(REPO, gcfg.bond_predictor))


def test_flagship_forward_runs(ckpt):
    """One denoiser forward from the committed weights on CPU: finite heads
    at the right shapes."""
    cfg = Config(ckpt["config"])
    cfg.model.denoiser["remat"] = False
    feat = featurizer_from_config(cfg)
    model = MolDiff(cfg.model, num_node_types=feat.num_node_types,
                    num_edge_types=feat.num_edge_types)
    b, n = 1, 8
    e = graph_ops.num_halfedges(n)
    node_mask = jnp.ones((b, n), jnp.float32)
    preds = model.forward(
        ckpt["params"],
        jax.nn.one_hot(jnp.zeros((b, n), jnp.int32), feat.num_node_types),
        jax.random.normal(jax.random.key(0), (b, n, 3)) * 0.5,
        jax.nn.one_hot(jnp.zeros((b, e), jnp.int32), feat.num_edge_types),
        jnp.full((b,), 500, jnp.int32), node_mask)
    assert preds.pred_node.shape == (b, n, feat.num_node_types)
    assert preds.pred_pos.shape == (b, n, 3)
    assert preds.pred_halfedge.shape == (b, e, feat.num_edge_types)
    for arr in (preds.pred_node, preds.pred_pos, preds.pred_halfedge):
        assert bool(jnp.isfinite(arr).all())


@pytest.mark.slow
def test_flagship_respaced_chain_cpu(ckpt):
    """A short respaced reverse chain (S=25 of T=1000) through the full
    5.5M-param model on CPU stays finite — the committed artifact is
    runnable end to end, not just loadable."""
    cfg = Config(ckpt["config"])
    cfg.model.denoiser["remat"] = False
    feat = featurizer_from_config(cfg)
    model = MolDiff(cfg.model, num_node_types=feat.num_node_types,
                    num_edge_types=feat.num_edge_types)
    node_mask = jnp.ones((2, 10), jnp.float32).at[1, 8:].set(0.0)
    res = model.sample(ckpt["params"], node_mask, jax.random.key(0),
                       num_steps=25)
    for arr in (res.pred_node, res.pred_pos, res.pred_halfedge):
        assert bool(jnp.isfinite(arr).all())
