import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moldiff_tpu.models.denoiser import init_node_edge_net, node_edge_net
from moldiff_tpu.ops import graph_ops

NODE_DIM, EDGE_DIM = 32, 16
B, N = 2, 8


@pytest.fixture(scope="module")
def net():
    params, static = init_node_edge_net(
        jax.random.PRNGKey(0), NODE_DIM, EDGE_DIM,
        num_blocks=2, cutoff=15.0, use_gate=True,
    )
    return params, static


def _inputs(key, b=B, n=N):
    ks = jax.random.split(key, 3)
    h_node = jax.random.normal(ks[0], (b, n, NODE_DIM))
    pos = jax.random.normal(ks[1], (b, n, 3)) * 2.0
    h_edge = jax.random.normal(ks[2], (b, n, n, EDGE_DIM))
    h_edge = 0.5 * (h_edge + jnp.swapaxes(h_edge, 1, 2))
    t_norm = jnp.full((b, 1, 1), 0.3)
    return h_node, pos, h_edge, t_norm


def test_shapes(net):
    params, static = net
    h_node, pos, h_edge, t = _inputs(jax.random.PRNGKey(1))
    mask = jnp.ones((B, N))
    pm = graph_ops.pair_mask_from_node_mask(mask)
    hn, p, he = node_edge_net(params, static, h_node, pos, h_edge, t, t, pm)
    assert hn.shape == (B, N, NODE_DIM)
    assert p.shape == (B, N, 3)
    assert he.shape == (B, N, N, EDGE_DIM)
    for x in (hn, p, he):
        assert np.all(np.isfinite(np.asarray(x)))


def test_e3_equivariance(net):
    """Rotating+translating inputs rotates pos output; features invariant."""
    params, static = net
    h_node, pos, h_edge, t = _inputs(jax.random.PRNGKey(2))
    mask = jnp.ones((B, N))
    pm = graph_ops.pair_mask_from_node_mask(mask)

    # random rotation via QR
    q, _ = np.linalg.qr(np.random.default_rng(0).normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    rot = jnp.asarray(q, dtype=jnp.float32)
    shift = jnp.asarray([1.0, -2.0, 0.5])

    hn1, p1, he1 = node_edge_net(params, static, h_node, pos, h_edge, t, t, pm)
    hn2, p2, he2 = node_edge_net(
        params, static, h_node, pos @ rot.T + shift, h_edge, t, t, pm
    )
    np.testing.assert_allclose(np.asarray(hn2), np.asarray(hn1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(he2), np.asarray(he1), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(p2), np.asarray(p1 @ rot.T + shift), atol=2e-4
    )


def test_padding_invariance(net):
    """Outputs on real atoms are identical when padding is added."""
    params, static = net
    n_real = 5
    h_node, pos, h_edge, t = _inputs(jax.random.PRNGKey(3))
    mask_full = jnp.zeros((B, N)).at[:, :n_real].set(1.0)
    pm_full = graph_ops.pair_mask_from_node_mask(mask_full)

    out_full = node_edge_net(params, static, h_node, pos, h_edge, t, t, pm_full)

    # same molecule in a smaller buffer
    h_node_s = h_node[:, :n_real]
    pos_s = pos[:, :n_real]
    h_edge_s = h_edge[:, :n_real, :n_real]
    mask_s = jnp.ones((B, n_real))
    pm_s = graph_ops.pair_mask_from_node_mask(mask_s)
    out_small = node_edge_net(params, static, h_node_s, pos_s, h_edge_s, t, t, pm_s)

    np.testing.assert_allclose(
        np.asarray(out_full[0][:, :n_real]), np.asarray(out_small[0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_full[1][:, :n_real]), np.asarray(out_small[1]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_full[2][:, :n_real, :n_real]),
        np.asarray(out_small[2]),
        atol=1e-5,
    )


def test_gradients_finite_under_padding(net):
    """No NaNs leak from masked pairs (diagonal distance = 0) into grads."""
    params, static = net
    h_node, pos, h_edge, t = _inputs(jax.random.PRNGKey(4))
    mask = jnp.zeros((B, N)).at[:, :5].set(1.0)
    pm = graph_ops.pair_mask_from_node_mask(mask)

    def loss(pos_in):
        hn, p, he = node_edge_net(params, static, h_node, pos_in, h_edge, t, t, pm)
        return jnp.sum((p * mask[..., None]) ** 2) + jnp.sum(
            (hn * mask[..., None]) ** 2
        )

    g = jax.grad(loss)(pos)
    assert np.all(np.isfinite(np.asarray(g)))


def test_update_flags():
    """update_pos=False freezes positions; update_edge=False drops edge state."""
    params, static = init_node_edge_net(
        jax.random.PRNGKey(5), NODE_DIM, EDGE_DIM,
        num_blocks=2, cutoff=20.0, use_gate=True, update_pos=False,
    )
    h_node, pos, h_edge, t = _inputs(jax.random.PRNGKey(6))
    mask = jnp.ones((B, N))
    pm = graph_ops.pair_mask_from_node_mask(mask)
    _, p, _ = node_edge_net(params, static, h_node, pos, h_edge, t, t, pm)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(pos))


def test_large_bucket_n64():
    """Max-bucket shapes (N=64, E=2016) trace and run."""
    import jax
    import jax.numpy as jnp

    from moldiff_tpu.models.moldiff import MolDiff
    from moldiff_tpu.ops import graph_ops
    from moldiff_tpu.utils.config import Config

    model = MolDiff(Config({
        "node_dim": 8, "edge_dim": 8,
        "denoiser": {"num_blocks": 1, "cutoff": 10, "use_gate": True},
        "diff": {
            "num_timesteps": 4, "time_dim": 2,
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
    }), 8, 6)
    params = model.init_params(jax.random.key(0))
    b, n = 2, 64
    e = graph_ops.num_halfedges(n)
    assert e == 2016
    h_node = jax.nn.one_hot(jnp.zeros((b, n), jnp.int32), 8)
    pos = jnp.zeros((b, n, 3))
    h_he = jax.nn.one_hot(jnp.zeros((b, e), jnp.int32), 6)
    t = jnp.full((b,), 2, jnp.int32)
    mask = jnp.ones((b, n))
    preds = model.forward(params, h_node, pos, h_he, t, mask)
    assert preds.pred_halfedge.shape == (b, e, 6)


@pytest.mark.parametrize("use_gate", [True, False])
@pytest.mark.parametrize("update_edge", [True, False])
def test_fused_edge_matmul_equivalence(use_gate, update_edge):
    """fuse_edge=True (one concatenated-weight matmul over the edge tensor)
    must match the unfused per-consumer matmuls (same math, float-tolerance)."""
    params, static_fused = init_node_edge_net(
        jax.random.PRNGKey(7), NODE_DIM, EDGE_DIM,
        num_blocks=2, cutoff=15.0, use_gate=use_gate,
        update_edge=update_edge, fuse_edge=True, remat=False,
    )
    static_unfused = dict(static_fused, fuse_edge=False)
    h_node, pos, h_edge, t = _inputs(jax.random.PRNGKey(8))
    mask = jnp.ones((B, N))
    pair_mask = graph_ops.pair_mask_from_node_mask(mask)

    out_f = node_edge_net(params, static_fused, h_node, pos, h_edge, t, t, pair_mask)
    out_u = node_edge_net(params, static_unfused, h_node, pos, h_edge, t, t, pair_mask)
    for a, b_, name in zip(out_f, out_u, ("h_node", "pos", "h_edge")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-5,
            err_msg=f"fused vs unfused mismatch in {name}")
