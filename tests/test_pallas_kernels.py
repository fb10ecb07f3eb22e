"""Pallas fused NodeBlock kernel: interpret-mode equivalence vs the XLA
composition, custom-vjp gradient parity, and denoiser-level wiring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moldiff_tpu.models.denoiser import init_node_block, node_block
from moldiff_tpu.ops.pallas_kernels import (
    _pallas_node_block_aggregate,
    _xla_node_block_aggregate,
)


@pytest.fixture(scope="module")
def setup(rng_seed=0):
    key = jax.random.key(0)
    b, n, dn, de = 4, 8, 32, 16
    params = init_node_block(key, dn, de, dn, use_gate=True)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (b, n, dn))
    e = jax.random.normal(ks[1], (b, n, n, de))
    t = jax.random.uniform(ks[2], (b, 1, 1))
    mask = (jax.random.uniform(ks[3], (b, n, n)) > 0.3).astype(jnp.float32)
    return params, x, e, t, mask


@pytest.mark.parametrize("group", [1, 2, 4])
def test_kernel_matches_xla(setup, group):
    params, x, e, t, mask = setup
    ref = _xla_node_block_aggregate(params, x, e, t, mask)
    out = _pallas_node_block_aggregate(params, x, e, t, mask,
                                       interpret=True, group=group)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_bwd_matches_xla(setup):
    """The custom_vjp backward (recompute via XLA) must equal the direct
    vjp of the XLA composition."""
    from moldiff_tpu.ops.pallas_kernels import _bwd

    params, x, e, t, mask = setup
    out, vjp = jax.vjp(_xla_node_block_aggregate, params, x, e, t, mask)
    g = jnp.ones_like(out)
    direct = vjp(g)
    via_custom = _bwd((params, x, e, t, mask), g)
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(via_custom)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_node_block_wiring(setup):
    """node_block(use_pallas=False) equals the inline computation — wiring
    through node_block_aggregate must not change the XLA path."""
    params, x, e, t, mask = setup
    out = node_block(params, x, e, t, mask, use_pallas=False)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


class TestFusedBlock:
    """Whole-block fused kernel (experimental, off by default: slower than
    the NodeBlock-only kernel on current Mosaic because receiver/sender
    broadcasts must be expressed as one-hot selector matmuls)."""

    def _setup(self):
        from moldiff_tpu.models.denoiser import init_node_edge_net

        key = jax.random.key(0)
        params, _ = init_node_edge_net(key, 32, 16, num_blocks=1, cutoff=10,
                                       use_gate=True)
        blk = jax.tree.map(lambda x: x[0], params["blocks"])
        b, n = 4, 8
        ks = jax.random.split(key, 6)
        h_node = jax.random.normal(ks[0], (b, n, 32))
        h_edge = jax.random.normal(ks[1], (b, n, n, 16))
        h_dist = jax.random.uniform(ks[2], (b, n, n, 16))
        pos = jax.random.normal(ks[3], (b, n, 3))
        rel = pos[:, :, None, :] - pos[:, None, :, :]
        dist = jnp.linalg.norm(rel + 1e-9, axis=-1)
        t = jax.random.uniform(ks[4], (b, 1, 1))
        mask = (jax.random.uniform(ks[5], (b, n, n)) > 0.2).astype(jnp.float32)
        mask = mask * (1 - np.eye(n))[None]
        return blk, (h_node, h_edge, h_dist, rel, dist, t, mask)

    @pytest.mark.parametrize("group", [1, 2])
    def test_matches_xla(self, group):
        from moldiff_tpu.ops.pallas_kernels import (
            _pallas_fused_block,
            _xla_fused_block,
        )

        blk, args = self._setup()
        ref = _xla_fused_block(blk, *args)
        out = _pallas_fused_block(blk, *args, interpret=True, group=group)
        for name, a, b in zip(("node", "edge", "pos"), ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4, err_msg=name)

    def test_vjp_matches_xla(self):
        from moldiff_tpu.ops.pallas_kernels import _fb_bwd, _xla_fused_block

        blk, args = self._setup()
        out, vjp = jax.vjp(_xla_fused_block, blk, *args)
        g = jax.tree.map(jnp.ones_like, out)
        direct = vjp(g)
        via = _fb_bwd((blk,) + args, g)
        for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(via)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_denoiser_fuse_block_flag_cpu(self):
        """fuse_block config wiring: on CPU the kernel path isn't taken at
        trace time only on TPU... it IS taken (flag-driven); run through
        interpret is not wired, so only check the flag exists in static."""
        from moldiff_tpu.models.denoiser import denoiser_static_config

        s = denoiser_static_config(num_blocks=1, cutoff=10, use_gate=True,
                                   fuse_block=True)
        assert s["fuse_block"] is True


class TestFusedBackward:
    """The fused Pallas backward (VERDICT r3: recompute the pair chain in
    VMEM instead of streaming saved [B,N,N,H] activations) must produce the
    SAME cotangents as the direct XLA vjp — params tree, dx, d_edge,
    d_node_time, d_pair_mask."""

    @staticmethod
    def _agg_params(params):
        # the call site (models/denoiser.py node_block) passes exactly the
        # four subtrees the aggregate chain consumes
        return {k: params[k] for k in ("node_net", "edge_net", "msg_net",
                                       "gate")}

    def test_bwd_matches_xla_vjp(self, setup):
        from moldiff_tpu.ops.pallas_kernels import _pallas_node_block_bwd

        params, x, e, t, mask = setup
        p = self._agg_params(params)
        out, vjp = jax.vjp(_xla_node_block_aggregate, p, x, e, t, mask)
        key = jax.random.key(42)
        g = jax.random.normal(key, out.shape, out.dtype)
        want = vjp(g)
        got = _pallas_node_block_bwd(p, x, e, t, mask, g, interpret=True)
        # identical tree structure (custom_vjp contract)
        assert jax.tree.structure(want) == jax.tree.structure(got)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(want)[0],
                jax.tree_util.tree_flatten_with_path(got)[0]):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=str(pa))

    def test_grad_scaled_cotangent(self, setup):
        """Backward with a non-trivial cotangent (2*out, i.e. d/dx of
        sum(out^2)) — catches scale bugs the all-ones cotangent would
        miss."""
        from moldiff_tpu.ops import pallas_kernels as pk

        params, x, e, t, mask = setup
        p = self._agg_params(params)
        out, vjp = jax.vjp(_xla_node_block_aggregate, p, x, e, t, mask)
        g = 2.0 * out
        want = vjp(g)
        got = pk._pallas_node_block_bwd(p, x, e, t, mask, g, interpret=True)
        for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


    def test_bf16_dtype_contract_and_accuracy(self, setup):
        """bf16 primals (the training compute dtype): cotangents must come
        back in the PRIMAL dtypes (custom_vjp contract — param grads
        accumulate in f32 inside the kernel and cast at the boundary), and
        must be at least as close to the f32 ground truth as XLA's own
        bf16 vjp (whose native-dtype accumulation is the noisier one)."""
        from moldiff_tpu.ops.pallas_kernels import _pallas_node_block_bwd

        params, x, e, t, mask = setup
        p32 = self._agg_params(params)
        bf = lambda tree: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, tree)
        p16, x16, e16 = bf(p32), x.astype(jnp.bfloat16), e.astype(jnp.bfloat16)

        out32, vjp32 = jax.vjp(_xla_node_block_aggregate, p32, x, e, t, mask)
        g32 = 2.0 * out32
        truth = vjp32(g32)

        out16, vjp16 = jax.vjp(_xla_node_block_aggregate, p16, x16, e16,
                               t, mask)
        g16 = g32.astype(out16.dtype)
        xla16 = vjp16(g16)
        pl16 = _pallas_node_block_bwd(p16, x16, e16, t, mask, g16,
                                      interpret=True)

        for (path, ref), (_, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(truth)[0],
                jax.tree_util.tree_flatten_with_path(xla16)[0],
                jax.tree_util.tree_flatten_with_path(pl16)[0]):
            assert a.dtype == b.dtype, (path, a.dtype, b.dtype)
            ref = np.asarray(ref, np.float32)
            scale = np.abs(ref).max() + 1e-9
            err_xla = np.abs(np.asarray(a, np.float32) - ref).max() / scale
            err_pl = np.abs(np.asarray(b, np.float32) - ref).max() / scale
            # 2x headroom: different-but-equally-valid rounding orders
            # (both paths sit at ~0.3-0.5% relative, pure bf16 noise)
            assert err_pl <= max(err_xla * 2.0, 1e-3), (
                str(path), float(err_pl), float(err_xla))


class TestPallasBwdIntegration:
    """END-TO-END check of the training path on CPU via the Pallas
    interpreter: grad of a scalar loss through the FULL denoiser with
    use_pallas + pallas_bwd (the exact static config TPU training uses,
    including per-block jax.checkpoint) must match the plain XLA path."""

    def _grad(self, static_kwargs, monkeypatch):
        from moldiff_tpu.models.denoiser import (
            denoiser_static_config,
            init_node_edge_net,
            node_edge_net,
        )
        from moldiff_tpu.ops import pallas_kernels as pk

        monkeypatch.setattr(pk, "INTERPRET", True)
        key = jax.random.key(1)
        params, _ = init_node_edge_net(key, 32, 16, num_blocks=2, cutoff=10,
                                       use_gate=True)
        static = denoiser_static_config(num_blocks=2, cutoff=10,
                                        use_gate=True, **static_kwargs)
        b, n = 2, 8
        ks = jax.random.split(key, 5)
        h_node = jax.random.normal(ks[0], (b, n, 32))
        pos = jax.random.normal(ks[1], (b, n, 3))
        h_edge = jax.random.normal(ks[2], (b, n, n, 16))
        t = jax.random.uniform(ks[3], (b, 1, 1))
        mask = (jax.random.uniform(ks[4], (b, n, n)) > 0.3).astype(jnp.float32)
        mask = mask * (1 - np.eye(n))[None]

        def loss(p):
            hn, pn, he = node_edge_net(p, static, h_node, pos, h_edge,
                                       t, t, mask)
            return (jnp.sum(hn ** 2) + jnp.sum(pn ** 2)
                    + jnp.sum(he ** 2))

        return jax.grad(loss)(params)

    def test_grad_matches_xla_path(self, monkeypatch):
        want = self._grad({}, monkeypatch)
        got = self._grad({"use_pallas": True, "pallas_bwd": True},
                         monkeypatch)
        assert jax.tree.structure(want) == jax.tree.structure(got)
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(want)[0],
                jax.tree_util.tree_flatten_with_path(got)[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
                err_msg=str(pa))
