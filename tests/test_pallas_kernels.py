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


class TestEdgePairFused:
    """Fused EdgeBlock pair aggregate (both BondFFN chains + endpoint
    reductions, reference graph.py:268-295): Pallas forward and fused
    backward must match the XLA composition / its direct vjp."""

    @pytest.fixture(scope="class")
    def esetup(self):
        from moldiff_tpu.models.denoiser import init_edge_block

        key = jax.random.key(7)
        b, n, dn, de = 4, 8, 32, 16
        eb = init_edge_block(key, de, dn, use_gate=True)
        params = {"left": eb["bond_ffn_left"], "right": eb["bond_ffn_right"]}
        ks = jax.random.split(key, 4)
        h_bond = jax.random.normal(ks[0], (b, n, n, de))
        h_node = jax.random.normal(ks[1], (b, n, dn))
        t = jax.random.uniform(ks[2], (b, 1, 1))
        mask = (jax.random.uniform(ks[3], (b, n, n)) > 0.3).astype(jnp.float32)
        mask = mask * (1 - np.eye(n))[None]
        return params, h_bond, h_node, t, mask

    @pytest.mark.parametrize("group", [1, 2, 4])
    def test_fwd_matches_xla(self, esetup, group):
        from moldiff_tpu.ops.pallas_kernels import (
            _pallas_edge_pair_aggregate,
            _xla_edge_pair_aggregate,
        )

        args = esetup
        ref_t, ref_u = _xla_edge_pair_aggregate(*args)
        out_t, out_u = _pallas_edge_pair_aggregate(
            *args, interpret=True, group=group)
        np.testing.assert_allclose(np.asarray(ref_t), np.asarray(out_t),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ref_u), np.asarray(out_u),
                                   rtol=1e-5, atol=1e-5)

    def test_bwd_matches_xla_vjp(self, esetup):
        from moldiff_tpu.ops.pallas_kernels import (
            _pallas_edge_pair_bwd,
            _xla_edge_pair_aggregate,
        )

        params, h_bond, h_node, t, mask = esetup
        out, vjp = jax.vjp(_xla_edge_pair_aggregate, params, h_bond, h_node,
                           t, mask)
        key = jax.random.key(42)
        k1, k2 = jax.random.split(key)
        ct = (jax.random.normal(k1, out[0].shape, out[0].dtype),
              jax.random.normal(k2, out[1].shape, out[1].dtype))
        want = vjp(ct)
        got = _pallas_edge_pair_bwd(params, h_bond, h_node, t, mask, ct,
                                    interpret=True)
        assert jax.tree.structure(want) == jax.tree.structure(got)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(want)[0],
                jax.tree_util.tree_flatten_with_path(got)[0]):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=str(pa))

    def test_edge_block_wiring(self, esetup, monkeypatch):
        """edge_block(pallas_bwd=True) through the interpreter must equal
        the plain path (forward), including grads through the whole block."""
        from moldiff_tpu.models.denoiser import edge_block, init_edge_block
        from moldiff_tpu.ops import pallas_kernels as pk

        monkeypatch.setattr(pk, "INTERPRET", True)
        _, h_bond, h_node, t, mask = esetup
        key = jax.random.key(3)
        eb = init_edge_block(key, h_bond.shape[-1], h_node.shape[-1],
                             use_gate=True)

        def loss(p, pallas_bwd):
            out = edge_block(p, h_bond, h_node, t, mask,
                             pallas_bwd=pallas_bwd)
            return jnp.sum(out ** 2)

        want_l, want_g = jax.value_and_grad(
            lambda p: loss(p, False))(eb), None
        got_l = jax.value_and_grad(lambda p: loss(p, True))(eb)
        np.testing.assert_allclose(np.asarray(want_l[0]),
                                   np.asarray(got_l[0]), rtol=1e-5)
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(want_l[1])[0],
                jax.tree_util.tree_flatten_with_path(got_l[1])[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
                err_msg=str(pa))

    def test_bf16_dtype_contract(self, esetup):
        """bf16 primals: cotangents come back in the primal dtypes and stay
        within 2x of XLA's own bf16 error vs the f32 ground truth."""
        from moldiff_tpu.ops.pallas_kernels import (
            _pallas_edge_pair_bwd,
            _xla_edge_pair_aggregate,
        )

        params, h_bond, h_node, t, mask = esetup
        bf = lambda tree: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, tree)
        p16 = bf(params)
        hb16 = h_bond.astype(jnp.bfloat16)
        hn16 = h_node.astype(jnp.bfloat16)

        out32, vjp32 = jax.vjp(_xla_edge_pair_aggregate, params, h_bond,
                               h_node, t, mask)
        ct32 = (2.0 * out32[0], 2.0 * out32[1])
        truth = vjp32(ct32)

        out16, vjp16 = jax.vjp(_xla_edge_pair_aggregate, p16, hb16, hn16,
                               t, mask)
        ct16 = (ct32[0].astype(out16[0].dtype), ct32[1].astype(out16[1].dtype))
        xla16 = vjp16(ct16)
        pl16 = _pallas_edge_pair_bwd(p16, hb16, hn16, t, mask, ct16,
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
            assert err_pl <= max(err_xla * 2.0, 1e-3), (
                str(path), float(err_pl), float(err_xla))


class TestEdgeBlockFull:
    """FULL-EdgeBlock fused kernel (both BondFFN chains + reductions + the
    tail: node/self FFNs, LayerNorm, relu, out — reference graph.py:268-295):
    Pallas forward and fused backward must match the whole XLA edge_block /
    its direct vjp. This is the round-4 edge-tail fusion (VERDICT r3 #5)."""

    @pytest.fixture(scope="class")
    def fsetup(self):
        from moldiff_tpu.models.denoiser import init_edge_block

        key = jax.random.key(11)
        b, n, dn, de = 4, 8, 32, 16
        params = init_edge_block(key, de, dn, use_gate=True)
        ks = jax.random.split(key, 4)
        h_bond = jax.random.normal(ks[0], (b, n, n, de))
        h_node = jax.random.normal(ks[1], (b, n, dn))
        t = jax.random.uniform(ks[2], (b, 1, 1))
        mask = (jax.random.uniform(ks[3], (b, n, n)) > 0.3).astype(jnp.float32)
        mask = mask * (1 - np.eye(n))[None]
        return params, h_bond, h_node, t, mask

    @pytest.mark.parametrize("group", [1, 2, 4])
    def test_fwd_matches_xla(self, fsetup, group):
        from moldiff_tpu.ops.pallas_kernels import (
            _pallas_edge_block_full,
            _xla_edge_block_full,
        )

        args = fsetup
        ref = _xla_edge_block_full(*args)
        out = _pallas_edge_block_full(*args, interpret=True, group=group)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)

    def test_bwd_matches_xla_vjp(self, fsetup):
        from moldiff_tpu.ops.pallas_kernels import (
            _pallas_edge_block_full_bwd,
            _xla_edge_block_full,
        )

        params, h_bond, h_node, t, mask = fsetup
        out, vjp = jax.vjp(_xla_edge_block_full, params, h_bond, h_node,
                           t, mask)
        ct = jax.random.normal(jax.random.key(42), out.shape, out.dtype)
        want = vjp(ct)
        got = _pallas_edge_block_full_bwd(params, h_bond, h_node, t, mask,
                                          ct, interpret=True)
        assert jax.tree.structure(want) == jax.tree.structure(got)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(want)[0],
                jax.tree_util.tree_flatten_with_path(got)[0]):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=str(pa))

    def test_bf16_dtype_contract(self, fsetup):
        """bf16 primals: cotangents come back in the primal dtypes and stay
        within 2x of XLA's own bf16 error vs the f32 ground truth."""
        from moldiff_tpu.ops.pallas_kernels import (
            _pallas_edge_block_full_bwd,
            _xla_edge_block_full,
        )

        params, h_bond, h_node, t, mask = fsetup
        bf = lambda tree: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, tree)
        p16 = bf(params)
        hb16 = h_bond.astype(jnp.bfloat16)
        hn16 = h_node.astype(jnp.bfloat16)

        out32, vjp32 = jax.vjp(_xla_edge_block_full, params, h_bond,
                               h_node, t, mask)
        ct32 = 2.0 * out32
        truth = vjp32(ct32)

        out16, vjp16 = jax.vjp(_xla_edge_block_full, p16, hb16, hn16,
                               t, mask)
        ct16 = ct32.astype(out16.dtype)
        xla16 = vjp16(ct16)
        pl16 = _pallas_edge_block_full_bwd(p16, hb16, hn16, t, mask, ct16,
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
            # 2.5x (vs the 2x used for the partial kernels): the full-block
            # recompute chain is longer, so the recorded f32-recompute
            # asymmetry (see _node_block_bwd_kernel) accumulates slightly
            # more divergence from XLA's bf16 vjp on the deepest gate weight
            assert err_pl <= max(err_xla * 2.5, 1e-3), (
                str(path), float(err_pl), float(err_xla))


class TestPosUpdateFused:
    """Fused PosUpdate (node MLPs + pairwise product + gated BondFFN +
    force reduction, reference graph.py:384-396): Pallas forward and fused
    backward must match the XLA composition / its direct vjp."""

    @pytest.fixture(scope="class")
    def psetup(self):
        from moldiff_tpu.models.denoiser import init_pos_update

        key = jax.random.key(11)
        b, n, dn, de = 4, 8, 32, 16
        params = init_pos_update(key, dn, de, de, use_gate=True)
        ks = jax.random.split(key, 5)
        h_node = jax.random.normal(ks[0], (b, n, dn))
        h_edge = jax.random.normal(ks[1], (b, n, n, de))
        pos = jax.random.normal(ks[2], (b, n, 3)) * 2.0
        rel_vec = pos[:, :, None, :] - pos[:, None, :, :]
        distance = jnp.linalg.norm(rel_vec, axis=-1)
        t = jax.random.uniform(ks[3], (b, 1, 1))
        mask = (jax.random.uniform(ks[4], (b, n, n)) > 0.3).astype(jnp.float32)
        mask = mask * (1 - np.eye(n))[None]
        return params, h_node, h_edge, rel_vec, distance, t, mask

    @pytest.mark.parametrize("group", [1, 2, 4])
    def test_fwd_matches_xla(self, psetup, group):
        from moldiff_tpu.ops.pallas_kernels import (
            _pallas_pos_update,
            _xla_pos_update,
        )

        args = psetup
        ref = _xla_pos_update(*args)
        out = _pallas_pos_update(*args, interpret=True, group=group)
        assert out.dtype == ref.dtype
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)

    def test_bwd_matches_xla_vjp(self, psetup):
        from moldiff_tpu.ops.pallas_kernels import (
            _pallas_pos_update_bwd,
            _xla_pos_update,
        )

        args = psetup
        out, vjp = jax.vjp(_xla_pos_update, *args)
        ct = jax.random.normal(jax.random.key(42), out.shape, out.dtype)
        want = vjp(ct)
        got = _pallas_pos_update_bwd(*args, ct, interpret=True)
        assert jax.tree.structure(want) == jax.tree.structure(got)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(want)[0],
                jax.tree_util.tree_flatten_with_path(got)[0]):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=str(pa))

    def test_pos_update_wiring(self, psetup, monkeypatch):
        """pos_update(pallas_bwd=True) through the interpreter must equal
        the plain path, including grads through the whole module."""
        from moldiff_tpu.models.denoiser import pos_update
        from moldiff_tpu.ops import pallas_kernels as pk

        monkeypatch.setattr(pk, "INTERPRET", True)
        params, h_node, h_edge, rel_vec, distance, t, mask = psetup

        def loss(p, pallas_bwd):
            out = pos_update(p, h_node, h_edge, rel_vec, distance, t, mask,
                             pallas_bwd=pallas_bwd)
            return jnp.sum(out ** 2)

        want_l = jax.value_and_grad(lambda p: loss(p, False))(params)
        got_l = jax.value_and_grad(lambda p: loss(p, True))(params)
        np.testing.assert_allclose(np.asarray(want_l[0]),
                                   np.asarray(got_l[0]), rtol=1e-5)
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(want_l[1])[0],
                jax.tree_util.tree_flatten_with_path(got_l[1])[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
                err_msg=str(pa))

    def test_equivariance(self, psetup, monkeypatch):
        """Rotating positions rotates the Pallas force output (E(3))."""
        from moldiff_tpu.ops.pallas_kernels import _pallas_pos_update

        params, h_node, h_edge, rel_vec, distance, t, mask = psetup
        # random rotation via QR
        q, _ = jnp.linalg.qr(jax.random.normal(jax.random.key(5), (3, 3)))
        out = _pallas_pos_update(params, h_node, h_edge, rel_vec, distance,
                                 t, mask, interpret=True)
        out_rot = _pallas_pos_update(params, h_node, h_edge, rel_vec @ q.T,
                                     distance, t, mask, interpret=True)
        np.testing.assert_allclose(np.asarray(out @ q.T), np.asarray(out_rot),
                                   rtol=1e-4, atol=1e-5)

    def test_bf16_dtype_contract(self, psetup):
        """bf16 primals: cotangents come back in the primal dtypes and stay
        within 2x of XLA's own bf16 error vs the f32 ground truth."""
        from moldiff_tpu.ops.pallas_kernels import (
            _pallas_pos_update_bwd,
            _xla_pos_update,
        )

        params, h_node, h_edge, rel_vec, distance, t, mask = psetup
        bf = lambda tree: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, tree)
        p16 = bf(params)
        hn16 = h_node.astype(jnp.bfloat16)
        he16 = h_edge.astype(jnp.bfloat16)

        out32, vjp32 = jax.vjp(_xla_pos_update, params, h_node, h_edge,
                               rel_vec, distance, t, mask)
        ct = 2.0 * out32
        truth = vjp32(ct)

        out16, vjp16 = jax.vjp(_xla_pos_update, p16, hn16, he16, rel_vec,
                               distance, t, mask)
        assert out16.dtype == jnp.float32  # force stays f32
        xla16 = vjp16(ct)
        pl16 = _pallas_pos_update_bwd(p16, hn16, he16, rel_vec, distance,
                                      t, mask, ct, interpret=True)

        # bf16 rounding points differ between the kernel (f32 chain, cast at
        # matmul inputs) and XLA's vjp, so PER-LEAF max-errors trade places
        # leaf by leaf (a single relu-boundary flip moves a leaf's max by
        # ~3x at these tiny sizes) — the guard against systematic precision
        # loss is the AGGREGATE: mean leaf error within 1.5x of XLA's, plus
        # a loose 4x per-leaf outlier bound.
        errs_xla, errs_pl = [], []
        for (path, ref), (_, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(truth)[0],
                jax.tree_util.tree_flatten_with_path(xla16)[0],
                jax.tree_util.tree_flatten_with_path(pl16)[0]):
            assert a.dtype == b.dtype, (path, a.dtype, b.dtype)
            ref = np.asarray(ref, np.float32)
            scale = np.abs(ref).max() + 1e-9
            errs_xla.append(
                np.abs(np.asarray(a, np.float32) - ref).max() / scale)
            errs_pl.append(
                (str(path),
                 np.abs(np.asarray(b, np.float32) - ref).max() / scale))
        mean_xla = np.mean(errs_xla)
        assert np.mean([e for _, e in errs_pl]) <= max(1.5 * mean_xla, 2e-3)
        for (path, err_pl), err_xla in zip(errs_pl, errs_xla):
            assert err_pl <= max(4.0 * err_xla, 4.0 * mean_xla, 5e-3), (
                path, float(err_pl), float(err_xla), float(mean_xla))
