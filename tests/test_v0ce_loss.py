"""Auxiliary v0 cross-entropy loss (model.v0_ce_scale).

Round-5 lever: the D3PM posterior KL gives ~zero gradient through revealed
elements (posterior is a delta at the revealed class regardless of the
prediction), so the v0 heads never learn the identity copy
(results/diag_calibration_v2.json). The aux CE supervises p(v0 | v_t)
directly over ALL real elements.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moldiff_tpu.models.moldiff import MolDiff
from moldiff_tpu.utils.config import Config


def _model(v0_ce_scale=0.0):
    cfg = Config(
        {
            "node_dim": 16,
            "edge_dim": 8,
            "v0_ce_scale": v0_ce_scale,
            "denoiser": {"num_blocks": 1, "cutoff": 10, "use_gate": True,
                         "remat": False},
            "diff": {
                "num_timesteps": 16,
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
    return MolDiff(cfg, 8, 6)


def _batch(key, b=4, n=10):
    kn, kp = jax.random.split(jax.random.PRNGKey(key))
    node_type = jax.random.randint(kn, (b, n), 0, 7)
    pos = jax.random.normal(kp, (b, n, 3))
    e = n * (n - 1) // 2
    halfedge_type = jnp.zeros((b, e), jnp.int32).at[:, :n].set(1)
    node_mask = jnp.ones((b, n), jnp.float32)
    return node_type, pos, halfedge_type, node_mask


class TestV0CELoss:
    def test_scale_zero_is_reference_loss(self):
        m0, m1 = _model(0.0), _model(0.0)
        params = m0.init_params(jax.random.key(0))
        nt, pos, he, nm = _batch(1)
        l0, aux0 = m0.get_loss(params, nt, pos, he, nm, jax.random.key(2))
        l1, aux1 = m1.get_loss(params, nt, pos, he, nm, jax.random.key(2))
        assert float(l0) == float(l1)
        assert "loss_v0ce" not in aux0

    def test_scale_positive_adds_term_and_gradient(self):
        m = _model(2.0)
        params = m.init_params(jax.random.key(0))
        nt, pos, he, nm = _batch(1)
        loss, aux = m.get_loss(params, nt, pos, he, nm, jax.random.key(2))
        assert "loss_v0ce" in aux
        assert float(aux["loss_v0ce"]) > 0
        # total = sum of parts
        expect = (float(aux["loss_pos"]) + float(aux["loss_node"])
                  + float(aux["loss_edge"]) + float(aux["loss_v0ce"]))
        assert float(loss) == pytest.approx(expect, rel=1e-5)

        # the CE must flow gradient into the node decoder head
        def node_head_loss(p):
            _, a = m.get_loss(p, nt, pos, he, nm, jax.random.key(2))
            return a["loss_v0ce"]

        g = jax.grad(node_head_loss)(params)
        leaves = [np.abs(np.asarray(x)).max() for x in jax.tree.leaves(g)]
        assert max(leaves) > 0

    def test_padding_invariance(self):
        m = _model(1.0)
        params = m.init_params(jax.random.key(0))
        nt, pos, he, nm = _batch(3, b=2, n=8)
        # zero out the last 3 atoms of each mol
        nm2 = nm.at[:, 5:].set(0.0)
        l1, a1 = m.get_loss(params, nt, pos, he, nm2, jax.random.key(4))
        # corrupt the padded lanes; the loss must not change
        nt_c = nt.at[:, 5:].set(6)
        pos_c = pos.at[:, 5:].set(99.0)
        l2, a2 = m.get_loss(params, nt_c, pos_c, he, nm2, jax.random.key(4))
        assert float(a1["loss_v0ce"]) == pytest.approx(
            float(a2["loss_v0ce"]), rel=1e-4)
