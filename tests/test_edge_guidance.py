"""Class-space bond guidance ("edge_guidance") sampler tests.

Round-5 10k autopsy (NOTES_r5.md): after the commit sampler fixed WHAT
atoms are, the residual failures are WHERE bonds close — the edge head
draws per-edge near-independently and closes aromatic rings at sizes the
corpus never contains (7/8-rings, partial-aromatic). The bond predictor is
the learned geometric bond classifier (the same model position guidance
differentiates through, reference models/model.py:309-362); edge_guidance
mixes its log-probs straight into the edge v0 prediction inside the
reverse chain (models/moldiff.py) — a categorical analogue of position
guidance that needs no retraining and no gradient.

The rigged models here make the mechanism testable without training: the
denoiser's edge v0 is a fixed mixture over {none, single}, the bond
predictor's is a delta on {aromatic}. Guidance scale 0 must be bit-exact
to the unguided chain; a large scale must move the drawn edge marginal
onto the predictor's class.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moldiff_tpu.models.moldiff import MolDiff, MolDiffPreds
from moldiff_tpu.utils.config import Config

NODE_K = 8   # 7 elements + mask (data/featurize.py)
EDGE_K = 6   # none + 4 bond types + mask
BP_K = 5     # sample-time bond predictor: none + 4 bond types (no mask)


def _model(T=32):
    cfg = Config(
        {
            "node_dim": 16,
            "edge_dim": 8,
            "denoiser": {"num_blocks": 1, "cutoff": 10, "use_gate": True},
            "diff": {
                "num_timesteps": T,
                "time_dim": 4,
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
        }
    )
    model = MolDiff(cfg, NODE_K, EDGE_K)

    node_logits = np.full(NODE_K, -30.0)
    node_logits[0] = np.log(0.9)
    node_logits[1] = np.log(0.1)
    edge_logits = np.full(EDGE_K, -30.0)
    edge_logits[0] = np.log(0.55)  # no bond
    edge_logits[1] = np.log(0.45)  # single

    def fixed_forward(params, h_node, pos, h_halfedge, t, node_mask,
                      return_moe_aux=False):
        b, n = h_node.shape[:2]
        e = h_halfedge.shape[1]
        preds = MolDiffPreds(
            jnp.broadcast_to(
                jnp.asarray(node_logits, jnp.float32), (b, n, NODE_K)),
            jnp.zeros((b, n, 3)),
            jnp.broadcast_to(
                jnp.asarray(edge_logits, jnp.float32), (b, e, EDGE_K)),
        )
        return (preds, None) if return_moe_aux else preds

    model.forward = fixed_forward
    return model


class _AromaticBP:
    """Stub bond predictor: delta on the aromatic class (4), BP_K-way
    output — exercises the mask-class pad path (pad to EDGE_K at the
    uniform level) exactly like the real sample-time predictor."""

    def __init__(self, k=BP_K, cls=4):
        self.k, self.cls = k, cls
        self.calls = 0

    def forward(self, params, h_node, pos, t, node_mask):
        self.calls += 1
        b, n = h_node.shape[:2]
        e = n * (n - 1) // 2
        logits = np.full(self.k, -30.0)
        logits[self.cls] = 0.0
        return jnp.broadcast_to(
            jnp.asarray(logits, jnp.float32), (b, e, self.k))


def _edge_fracs(res):
    cls = np.asarray(res.pred_halfedge).argmax(-1).reshape(-1)
    return np.bincount(cls, minlength=EDGE_K) / cls.size


class TestEdgeGuidance:
    def test_scale_zero_is_bitwise_unguided(self):
        # edge_guidance=0 must take the static unguided path even with a
        # bond predictor attached (the knob is free when off)
        model = _model()
        nm = jnp.ones((4, 8), jnp.float32)
        bp = _AromaticBP()
        r0 = model.sample({}, nm, jax.random.PRNGKey(3))
        r1 = model.sample({}, nm, jax.random.PRNGKey(3),
                          bond_predictor=(bp, {}), edge_guidance=0.0)
        assert bp.calls == 0
        np.testing.assert_array_equal(
            np.asarray(r0.pred_halfedge), np.asarray(r1.pred_halfedge))
        np.testing.assert_array_equal(
            np.asarray(r0.pred_node), np.asarray(r1.pred_node))

    def test_requires_bond_predictor(self):
        model = _model()
        nm = jnp.ones((2, 6), jnp.float32)
        with pytest.raises(ValueError):
            model.sample({}, nm, jax.random.PRNGKey(0), edge_guidance=1.0)

    def test_strong_guidance_steers_edges_to_bp_class(self):
        # denoiser says {none:0.55, single:0.45}; bp says aromatic. A large
        # scale must hand the edge stream to the bp's class while leaving
        # the node stream untouched.
        model = _model()
        nm = jnp.ones((8, 10), jnp.float32)
        base = model.sample({}, nm, jax.random.PRNGKey(5))
        guided = model.sample({}, nm, jax.random.PRNGKey(5),
                              bond_predictor=(_AromaticBP(), {}),
                              edge_guidance=8.0)
        fb, fg = _edge_fracs(base), _edge_fracs(guided)
        assert fb[4] < 0.05, fb          # unguided chain: ~no aromatics
        assert fg[4] > 0.60, fg          # guided: aromatic dominates
        assert fg[5] == 0.0              # padded mask class never boosted
        np.testing.assert_array_equal(   # node stream untouched by the knob
            np.asarray(base.pred_node).argmax(-1),
            np.asarray(guided.pred_node).argmax(-1))

    def test_full_width_bp_skips_padding(self):
        # a predictor already emitting the model's full edge width takes the
        # pad == 0 branch; guidance must work identically
        model = _model()
        nm = jnp.ones((8, 10), jnp.float32)
        res = model.sample({}, nm, jax.random.PRNGKey(9),
                           bond_predictor=(_AromaticBP(k=EDGE_K), {}),
                           edge_guidance=8.0)
        f = _edge_fracs(res)
        assert f[4] > 0.60, f

    def test_composes_with_commit_nodes(self):
        # the champion config is commit=nodes; edge_guidance must stack on
        # top without disturbing the committed node stream
        model = _model()
        nm = jnp.ones((8, 10), jnp.float32)
        res = model.sample({}, nm, jax.random.PRNGKey(7), commit="nodes",
                           bond_predictor=(_AromaticBP(), {}),
                           edge_guidance=8.0)
        f = _edge_fracs(res)
        assert f[4] > 0.60, f
        cls = np.asarray(res.pred_node).argmax(-1).reshape(-1)
        frac_major = (cls == 0).mean()
        assert 0.75 < frac_major <= 1.0, frac_major

    def test_chunked_matches_single_scan(self):
        # the CLI routes edge_guidance>0 through sample_chunked (RPC
        # deadlines); the chunked chain must equal the single lax.scan
        model = _model(T=8)
        nm = jnp.ones((4, 8), jnp.float32)
        kw = dict(bond_predictor=(_AromaticBP(), {}), edge_guidance=2.0,
                  commit="nodes")
        r1 = model.sample({}, nm, jax.random.PRNGKey(2), **kw)
        r2 = model.sample_chunked({}, nm, jax.random.PRNGKey(2),
                                  chunk_size=4, **kw)
        np.testing.assert_array_equal(
            np.asarray(r1.pred_halfedge).argmax(-1),
            np.asarray(r2.pred_halfedge).argmax(-1))
        np.testing.assert_array_equal(
            np.asarray(r1.pred_node).argmax(-1),
            np.asarray(r2.pred_node).argmax(-1))

    def test_tmax_zero_matches_unguided_draws(self):
        # tmax=0 gates guidance off at every step: the drawn streams must
        # equal the unguided chain (same keys; log_softmax renorm of an
        # already-normalized v0 is a no-op up to float rounding)
        model = _model()
        nm = jnp.ones((8, 10), jnp.float32)
        base = model.sample({}, nm, jax.random.PRNGKey(11))
        gated = model.sample({}, nm, jax.random.PRNGKey(11),
                             bond_predictor=(_AromaticBP(), {}),
                             edge_guidance=8.0, edge_guidance_tmax=0)
        np.testing.assert_array_equal(
            np.asarray(base.pred_halfedge).argmax(-1),
            np.asarray(gated.pred_halfedge).argmax(-1))
        np.testing.assert_array_equal(
            np.asarray(base.pred_node).argmax(-1),
            np.asarray(gated.pred_node).argmax(-1))

    def test_tmax_late_gate_still_steers(self):
        # guidance restricted to the last quarter of the chain must still
        # hand the (absorb-prior) edge stream to the bp's class: reveals
        # concentrate at low t where abar transitions
        model = _model(T=32)
        nm = jnp.ones((8, 10), jnp.float32)
        res = model.sample({}, nm, jax.random.PRNGKey(13),
                           bond_predictor=(_AromaticBP(), {}),
                           edge_guidance=8.0, edge_guidance_tmax=8)
        f = _edge_fracs(res)
        assert f[4] > 0.30, f

    def test_pipeline_rejects_missing_bp(self):
        from moldiff_tpu.data.featurize import MolFeaturizer
        from moldiff_tpu.sample.pipeline import MolSampler

        with pytest.raises(ValueError):
            MolSampler(_model(), MolFeaturizer(), edge_guidance=1.0)
