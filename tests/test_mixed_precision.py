"""Mixed-precision denoiser: bfloat16 compute must track float32 closely and
keep positions/losses in float32."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moldiff_tpu.models.moldiff import MolDiff
from moldiff_tpu.ops import graph_ops
from moldiff_tpu.utils.config import Config


def cfg(dtype):
    return Config({
        "node_dim": 32,
        "edge_dim": 16,
        "denoiser": {"num_blocks": 2, "cutoff": 10, "use_gate": True,
                     "dtype": dtype},
        "diff": {
            "num_timesteps": 10,
            "time_dim": 4,
            "categorical_space": "discrete",
            "diff_pos": {"beta_schedule": "advance", "scale_start": 0.9999,
                         "scale_end": 0.0001, "width": 3},
            "diff_atom": {"init_prob": "tomask", "beta_schedule": "advance",
                          "scale_start": 0.9999, "scale_end": 0.0001, "width": 3},
            "diff_bond": {"init_prob": "absorb", "beta_schedule": "advance",
                          "scale_start": 0.9999, "scale_end": 0.0001, "width": 3},
        },
    })


def test_bf16_tracks_f32():
    m32 = MolDiff(cfg("float32"), 8, 6)
    m16 = MolDiff(cfg("bfloat16"), 8, 6)
    params = m32.init_params(jax.random.key(0))  # same init works for both

    b, n = 2, 8
    e = graph_ops.num_halfedges(n)
    ks = jax.random.split(jax.random.key(1), 3)
    h_node = jax.nn.one_hot(jax.random.randint(ks[0], (b, n), 0, 8), 8)
    pos = jax.random.normal(ks[1], (b, n, 3))
    h_he = jax.nn.one_hot(jax.random.randint(ks[2], (b, e), 0, 6), 6)
    t = jnp.full((b,), 5, jnp.int32)
    mask = jnp.ones((b, n))

    p32 = m32.forward(params, h_node, pos, h_he, t, mask)
    p16 = m16.forward(params, h_node, pos, h_he, t, mask)

    # outputs stay float32 dtype
    assert p16.pred_pos.dtype == jnp.float32
    assert p16.pred_node.dtype == jnp.float32

    # bf16 has ~3 decimal digits; relative agreement should be close
    for a, bb in zip(p32, p16):
        a, bb = np.asarray(a), np.asarray(bb)
        denom = np.maximum(np.abs(a), 1e-2)
        assert np.median(np.abs(a - bb) / denom) < 0.05


def test_bf16_loss_finite_and_close():
    m32 = MolDiff(cfg("float32"), 8, 6)
    m16 = MolDiff(cfg("bfloat16"), 8, 6)
    params = m32.init_params(jax.random.key(0))
    b, n = 4, 8
    e = graph_ops.num_halfedges(n)
    rng = np.random.default_rng(0)
    node_type = rng.integers(0, 7, (b, n)).astype(np.int32)
    pos = rng.normal(size=(b, n, 3)).astype(np.float32)
    he = rng.integers(0, 5, (b, e)).astype(np.int32)
    mask = np.ones((b, n), np.float32)
    key = jax.random.key(3)
    l32, _ = m32.get_loss(params, node_type, pos, he, mask, key)
    l16, _ = m16.get_loss(params, node_type, pos, he, mask, key)
    assert np.isfinite(float(l16))
    assert float(l16) == pytest.approx(float(l32), rel=0.1)


def test_bf16_grads_finite():
    m16 = MolDiff(cfg("bfloat16"), 8, 6)
    params = m16.init_params(jax.random.key(0))
    b, n = 2, 6
    e = graph_ops.num_halfedges(n)
    rng = np.random.default_rng(1)
    node_type = rng.integers(0, 7, (b, n)).astype(np.int32)
    pos = rng.normal(size=(b, n, 3)).astype(np.float32)
    he = rng.integers(0, 5, (b, e)).astype(np.int32)
    mask = np.ones((b, n), np.float32)

    def loss_fn(p):
        l, _ = m16.get_loss(p, node_type, pos, he, mask, jax.random.key(4))
        return l

    grads = jax.grad(loss_fn)(params)
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
