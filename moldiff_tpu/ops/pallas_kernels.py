"""Pallas TPU kernels for the hot message-passing paths.

The dense-graph NodeBlock (reference semantics: models/graph.py:29-55)
materializes four [B, N, N, H] intermediates in HBM under XLA:
edge-MLP output, bilinear message, gate input, gated message. For H=256,
B=128, N=32 that's ~1.6 GB of HBM traffic per block. This kernel computes
the whole chain for one molecule per grid cell with every intermediate
resident in VMEM ([N*N, H] at N=32, H=256 is 512 KB bf16), writing only the
[N, H] aggregated output.

CPU paths use the XLA implementation (the kernel wires in through
`node_block_aggregate`, which falls back outside TPU). Gradients flow
through a custom_vjp: by default the backward recomputes via the XLA
reference implementation; with the denoiser's `pallas_bwd` knob the FUSED
Pallas backward (`node_block_aggregate_tpu_fused_bwd`) recomputes the pair
chain in VMEM per molecule tile instead — no [N,N,H] intermediate touches
HBM in either direction (docs/PERFORMANCE.md train-MFU analysis).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:  # pallas import is TPU/CPU-interpret safe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

# Global interpreter switch: tests set this True (monkeypatch) to run every
# kernel through the Pallas interpreter on CPU, which lets the FULL denoiser
# use_pallas/pallas_bwd paths be integration-tested off-TPU.
INTERPRET = False


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _node_block_kernel(
    # per-cell blocks: G molecules per grid cell
    x_ref,        # [G, N, Dn]
    e_ref,        # [G, N*N, De]
    mask_ref,     # [G, N, N] f32
    t_ref,        # [G, N*N, 1] f32 time column (precomputed on host)
    # edge_net MLP
    we1_ref, be1_ref, se1_ref, be1n_ref, we2_ref, be2_ref,
    # node_net MLP
    wn1_ref, bn1_ref, sn1_ref, bn1n_ref, wn2_ref, bn2_ref,
    # msg linear
    wm_ref, bm_ref,
    # gate MLP
    wg1_ref, bg1_ref, sg1_ref, bg1n_ref, wg2_ref, bg2_ref,
    # output
    out_ref,      # [G, N, H]
):
    g_sz, n, dn = x_ref.shape
    x = x_ref[:].reshape(g_sz * n, dn)            # [G*N, Dn] bf16
    e = e_ref[:].reshape(g_sz * n * n, -1)        # [G*N*N, De]
    dt = x.dtype

    # edge_net: Linear -> LN -> ReLU -> Linear     [G*N*N, H]
    h = jnp.dot(e, we1_ref[:], preferred_element_type=jnp.float32) + be1_ref[:]
    h = jax.nn.relu(_ln(h, se1_ref[:], be1n_ref[:])).astype(dt)
    h = (jnp.dot(h, we2_ref[:], preferred_element_type=jnp.float32)
         + be2_ref[:]).astype(dt)

    # node_net on senders: [G*N, H]
    xn = jnp.dot(x, wn1_ref[:], preferred_element_type=jnp.float32) + bn1_ref[:]
    xn = jax.nn.relu(_ln(xn, sn1_ref[:], bn1n_ref[:])).astype(dt)
    xn = (jnp.dot(xn, wn2_ref[:], preferred_element_type=jnp.float32)
          + bn2_ref[:]).astype(dt)

    # bilinear message: h[g,i,j] * xn[g,j] -> Linear   [G*N*N, H]
    hh = h.reshape(g_sz, n, n, -1) * xn.reshape(g_sz, 1, n, -1)
    msg = (jnp.dot(hh.reshape(g_sz * n * n, -1), wm_ref[:],
                   preferred_element_type=jnp.float32) + bm_ref[:]).astype(dt)

    # gate: sigmoid(MLP([e || x_j || t])). The first Linear decomposes as
    # e @ W[:De] + x_j @ W[De:De+Dn] + t * W[-1] + b — the x part is
    # computed per *sender* ([G*N, H]) and broadcast over receivers,
    # saving an N-fold factor on its matmul and skipping the concat.
    de = e.shape[-1]
    ge = jnp.dot(e, wg1_ref[:de], preferred_element_type=jnp.float32)
    gx = jnp.dot(x, wg1_ref[de:de + dn], preferred_element_type=jnp.float32)
    tvals = t_ref[:, 0, :].astype(jnp.float32)            # [G, 1] per-graph t
    gt_t = jnp.dot(tvals, wg1_ref[de + dn:de + dn + 1],
                   preferred_element_type=jnp.float32)     # [G, H]
    h_dim = ge.shape[-1]
    gt = (
        ge.reshape(g_sz, n, n, h_dim)
        + gx.reshape(g_sz, 1, n, h_dim)
        + gt_t.reshape(g_sz, 1, 1, h_dim)
        + bg1_ref[:]
    ).reshape(g_sz * n * n, h_dim)
    gt = jax.nn.relu(_ln(gt, sg1_ref[:], bg1n_ref[:])).astype(dt)
    gt = (jnp.dot(gt, wg2_ref[:], preferred_element_type=jnp.float32)
          + bg2_ref[:])
    gt = jax.nn.sigmoid(gt).astype(dt)

    # mask + sum over senders j (f32 accumulation) [G, N, H]
    gated = (msg * gt).reshape(g_sz, n, n, -1).astype(jnp.float32)
    gated = gated * mask_ref[:][:, :, :, None]
    out_ref[:] = jnp.sum(gated, axis=2).astype(out_ref.dtype)


def _prep(p2d):
    """1-D params -> [1, H] rows (TPU wants >=2D operands)."""
    return p2d.reshape(1, -1)


def _xla_node_block_aggregate(params, x, edge_attr, node_time, pair_mask):
    """Reference XLA implementation of the fused region (must exactly match
    models/denoiser.node_block's message+gate+sum; used as fallback and as
    the backward path)."""
    from ..models.nn import linear, mlp

    dt = x.dtype
    h_node = mlp(params["node_net"], x)
    h_edge = mlp(params["edge_net"], edge_attr)
    msg = linear(params["msg_net"], h_edge * h_node[:, None, :, :])
    b, n = x.shape[0], x.shape[1]
    gate_in = jnp.concatenate(
        [
            edge_attr,
            jnp.broadcast_to(x[:, None, :, :], (b, n, n, x.shape[-1])),
            jnp.broadcast_to(node_time.astype(dt)[:, :, :, None], (b, n, n, 1)),
        ],
        axis=-1,
    )
    msg = msg * jax.nn.sigmoid(mlp(params["gate"], gate_in))
    msg = msg * pair_mask.astype(dt)[..., None]
    return jnp.sum(msg, axis=2, dtype=jnp.float32).astype(dt)


def _pallas_node_block_aggregate(params, x, edge_attr, node_time, pair_mask,
                                 interpret=False, group: int = 4):
    b, n, dn = x.shape
    de = edge_attr.shape[-1]
    h = params["msg_net"]["w"].shape[0]
    dt = x.dtype
    while b % group:
        group //= 2
    g_sz = max(group, 1)

    e_flat = edge_attr.reshape(b, n * n, de)
    tcol = jnp.broadcast_to(
        node_time.reshape(-1, 1, 1).astype(jnp.float32), (b, n * n, 1)
    )
    mask = pair_mask.astype(jnp.float32)

    pe = params["edge_net"]["layers"]
    pn = params["node_net"]["layers"]
    pg = params["gate"]["layers"]
    cast = lambda w: w.astype(dt)
    f32 = lambda w: w.astype(jnp.float32)
    weights = [
        cast(pe[0]["lin"]["w"]), f32(_prep(pe[0]["lin"]["b"])),
        f32(_prep(pe[0]["ln"]["scale"])), f32(_prep(pe[0]["ln"]["bias"])),
        cast(pe[1]["lin"]["w"]), f32(_prep(pe[1]["lin"]["b"])),
        cast(pn[0]["lin"]["w"]), f32(_prep(pn[0]["lin"]["b"])),
        f32(_prep(pn[0]["ln"]["scale"])), f32(_prep(pn[0]["ln"]["bias"])),
        cast(pn[1]["lin"]["w"]), f32(_prep(pn[1]["lin"]["b"])),
        cast(params["msg_net"]["w"]), f32(_prep(params["msg_net"]["b"])),
        cast(pg[0]["lin"]["w"]), f32(_prep(pg[0]["lin"]["b"])),
        f32(_prep(pg[0]["ln"]["scale"])), f32(_prep(pg[0]["ln"]["bias"])),
        cast(pg[1]["lin"]["w"]), f32(_prep(pg[1]["lin"]["b"])),
    ]

    grid = (b // g_sz,)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((g_sz, n, dn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((g_sz, n * n, de), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((g_sz, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((g_sz, n * n, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [const(w.shape) for w in weights]

    out = pl.pallas_call(
        _node_block_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g_sz, n, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, h), dt),
        interpret=interpret or INTERPRET,
    )(x, e_flat, mask, tcol, *weights)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def node_block_aggregate_tpu(params, x, edge_attr, node_time, pair_mask):
    return _pallas_node_block_aggregate(params, x, edge_attr, node_time, pair_mask)


def _fwd(params, x, edge_attr, node_time, pair_mask):
    out = node_block_aggregate_tpu(params, x, edge_attr, node_time, pair_mask)
    return out, (params, x, edge_attr, node_time, pair_mask)


def _bwd(res, g):
    params, x, edge_attr, node_time, pair_mask = res
    _, vjp = jax.vjp(_xla_node_block_aggregate, params, x, edge_attr,
                     node_time, pair_mask)
    return vjp(g)


node_block_aggregate_tpu.defvjp(_fwd, _bwd)


def node_block_aggregate(params, x, edge_attr, node_time, pair_mask,
                         use_pallas: Optional[bool] = None):
    """Fused gated-message aggregation. Uses the Pallas kernel on TPU,
    the XLA composition elsewhere."""
    if use_pallas is None:
        use_pallas = HAS_PALLAS and jax.default_backend() == "tpu"
    if use_pallas:
        return node_block_aggregate_tpu(params, x, edge_attr, node_time, pair_mask)
    return _xla_node_block_aggregate(params, x, edge_attr, node_time, pair_mask)


# ===========================================================================
# Fused full denoiser block: edge_emb + NodeBlock + EdgeBlock + PosUpdate
# ===========================================================================
#
# One grid cell processes G molecules with every [N,N,*] intermediate in
# VMEM. Matches models/denoiser.py's block_fn exactly (use_gate=True,
# update_edge=True, update_pos=True); gradients flow through a custom_vjp
# whose backward recomputes via the XLA composition.

def _ln_p(x, scale, bias, eps=1e-5):
    return _ln(x, scale, bias, eps)


def _mlp2(x, w1, b1, s1, c1, w2, b2, dt):
    """Linear -> LN -> ReLU -> Linear (the framework MLP, 2 layers)."""
    h = jnp.dot(x, w1[:], preferred_element_type=jnp.float32) + b1[:]
    h = jax.nn.relu(_ln_p(h, s1[:], c1[:])).astype(dt)
    return jnp.dot(h, w2[:], preferred_element_type=jnp.float32) + b2[:]


def _flatten_linear(p, dt, bias=True):
    out = [p["w"].astype(dt)]
    if bias:
        out.append(_prep(p["b"]).astype(jnp.float32))
    return out


def _flatten_mlp(p, dt):
    l0, l1 = p["layers"]
    return [
        l0["lin"]["w"].astype(dt), _prep(l0["lin"]["b"]).astype(jnp.float32),
        _prep(l0["ln"]["scale"]).astype(jnp.float32),
        _prep(l0["ln"]["bias"]).astype(jnp.float32),
        l1["lin"]["w"].astype(dt), _prep(l1["lin"]["b"]).astype(jnp.float32),
    ]


def _flatten_bond_ffn(p, dt):
    return (
        [p["bond_linear"]["w"].astype(dt), p["node_linear"]["w"].astype(dt)]
        + _flatten_mlp(p["inter"], dt)
        + _flatten_mlp(p["gate"], dt)
    )


def _flatten_ln(p):
    return [_prep(p["scale"]).astype(jnp.float32),
            _prep(p["bias"]).astype(jnp.float32)]


def flatten_block_weights(blk, dt):
    """Canonical flat weight list for the fused block kernel."""
    nb, eb, pb = blk["node_block"], blk["edge_block"], blk["pos_block"]
    ws = []
    ws += _flatten_linear(blk["edge_emb"], dt)                      # 2
    ws += _flatten_mlp(nb["edge_net"], dt)                          # 6
    ws += _flatten_mlp(nb["node_net"], dt)                          # 6
    ws += _flatten_linear(nb["msg_net"], dt)                        # 2
    ws += _flatten_mlp(nb["gate"], dt)                              # 6
    ws += _flatten_linear(nb["centroid_lin"], dt)                   # 2
    ws += _flatten_ln(nb["ln"])                                     # 2
    ws += _flatten_linear(nb["out"], dt)                            # 2
    ws += _flatten_bond_ffn(eb["bond_ffn_left"], dt)                # 14
    ws += _flatten_bond_ffn(eb["bond_ffn_right"], dt)               # 14
    ws += _flatten_linear(eb["node_ffn_left"], dt)                  # 2
    ws += _flatten_linear(eb["node_ffn_right"], dt)                 # 2
    ws += _flatten_linear(eb["self_ffn"], dt)                       # 2
    ws += _flatten_ln(eb["ln"])                                     # 2
    ws += _flatten_linear(eb["out"], dt)                            # 2
    ws += _flatten_mlp(pb["left_lin_edge"], dt)                     # 6
    ws += _flatten_mlp(pb["right_lin_edge"], dt)                    # 6
    ws += _flatten_bond_ffn(pb["edge_lin"], dt)                     # 14
    return ws


def _expand_rows(vals, g_sz, n):
    """vals [G, N, H] -> flat [G*N*N, H] with out[g, i, j] = vals[g, i].

    Mosaic can't insert a singleton between the two N dims, but it CAN
    broadcast on the leading axis and transpose [N, N, H] -> so the
    receiver-indexed expansion is broadcast-then-swapaxes."""
    outs = []
    for gi in range(g_sz):
        a = jnp.broadcast_to(vals[gi][None, :, :],
                             (n, n, vals.shape[-1]))        # a[j, i] = v[i]
        outs.append(jnp.swapaxes(a, 0, 1).reshape(n * n, -1))
    return jnp.concatenate(outs, axis=0) if g_sz > 1 else outs[0]


def _expand_cols(vals, g_sz, n):
    """vals [G, N, H] -> flat [G*N*N, H] with out[g, i, j] = vals[g, j]."""
    outs = [
        jnp.broadcast_to(vals[gi][None, :, :],
                         (n, n, vals.shape[-1])).reshape(n * n, -1)
        for gi in range(g_sz)
    ]
    return jnp.concatenate(outs, axis=0) if g_sz > 1 else outs[0]


def _expand_graph(vals, g_sz, n):
    """vals [G, H] -> flat [G*N*N, H] (per-graph row broadcast)."""
    outs = [jnp.broadcast_to(vals[gi:gi + 1], (n * n, vals.shape[-1]))
            for gi in range(g_sz)]
    return jnp.concatenate(outs, axis=0) if g_sz > 1 else outs[0]


def _bond_ffn_flat(e_flat, node_rows, w, dt, g_sz, n, tvals, receiver):
    """BondFFN on flat pairs [G*N*N, .]; node features are per-node
    [G*N, Dn] expanded receiver-indexed (True) or sender-indexed."""
    (wb, wn, i1w, i1b, i1s, i1c, i2w, i2b,
     g1w, g1b, g1s, g1c, g2w, g2b) = w
    de = e_flat.shape[-1]
    dn = node_rows.shape[-1]
    bond = jnp.dot(e_flat, wb[:], preferred_element_type=jnp.float32)
    nodef = jnp.dot(node_rows, wn[:], preferred_element_type=jnp.float32)
    expand = _expand_rows if receiver else _expand_cols
    nf_flat = expand(nodef.reshape(g_sz, n, -1), g_sz, n)
    inter = (bond * nf_flat).astype(dt)
    inter = _mlp2(inter, i1w, i1b, i1s, i1c, i2w, i2b, dt)
    ge = jnp.dot(e_flat, g1w[:de], preferred_element_type=jnp.float32)
    gn = jnp.dot(node_rows, g1w[de:de + dn], preferred_element_type=jnp.float32)
    gn_flat = expand(gn.reshape(g_sz, n, -1), g_sz, n)
    gt = jnp.dot(tvals, g1w[de + dn:de + dn + 1],
                 preferred_element_type=jnp.float32)          # [G, H]
    gsum = (ge + gn_flat + _expand_graph(gt, g_sz, n) + g1b[:])
    gsum = jax.nn.relu(_ln_p(gsum, g1s[:], g1c[:])).astype(dt)
    gate = jax.nn.sigmoid(
        jnp.dot(gsum, g2w[:], preferred_element_type=jnp.float32) + g2b[:]
    )
    return (inter.astype(jnp.float32) * gate).astype(dt)


def _bond_ffn_pairflat(e_flat, node_pair, w, dt, g_sz, n, tvals):
    """BondFFN where the node features are already pairwise flat
    [G*N*N, Dn] (PosUpdate)."""
    (wb, wn, i1w, i1b, i1s, i1c, i2w, i2b,
     g1w, g1b, g1s, g1c, g2w, g2b) = w
    de = e_flat.shape[-1]
    dn = node_pair.shape[-1]
    bond = jnp.dot(e_flat, wb[:], preferred_element_type=jnp.float32)
    nodef = jnp.dot(node_pair, wn[:], preferred_element_type=jnp.float32)
    inter = (bond * nodef).astype(dt)
    inter = _mlp2(inter, i1w, i1b, i1s, i1c, i2w, i2b, dt)
    ge = jnp.dot(e_flat, g1w[:de], preferred_element_type=jnp.float32)
    gn = jnp.dot(node_pair, g1w[de:de + dn], preferred_element_type=jnp.float32)
    gt = jnp.dot(tvals, g1w[de + dn:de + dn + 1],
                 preferred_element_type=jnp.float32)
    gsum = (ge + gn + _expand_graph(gt, g_sz, n) + g1b[:])
    gsum = jax.nn.relu(_ln_p(gsum, g1s[:], g1c[:])).astype(dt)
    gate = jax.nn.sigmoid(
        jnp.dot(gsum, g2w[:], preferred_element_type=jnp.float32) + g2b[:]
    )
    return (inter.astype(jnp.float32) * gate).astype(dt)


def _fused_block_kernel(x_ref, e_ref, hd_ref, rel_ref, dist_ref, mask_ref,
                        t_ref, *rest):
    """Whole denoiser block for G molecules (see flatten_block_weights for
    the weight order). Flat [G*N*N, .] layout throughout;
    per-node features expand to pairs via leading-axis broadcast (+
    transpose for receiver-indexed). Outputs: h_node_new, h_edge_new (flat), pos_delta."""
    wrefs = list(rest[:-3])
    out_node_ref, out_edge_ref, out_pos_ref = rest[-3:]

    g_sz, n, dn = x_ref.shape
    de = e_ref.shape[-1]
    dt = x_ref[:].dtype
    x = x_ref[:].reshape(g_sz * n, dn)
    e_in = e_ref[:].reshape(g_sz * n * n, de)
    hd = hd_ref[:].reshape(g_sz * n * n, -1)
    mask_flat = mask_ref[:].reshape(g_sz * n * n, 1)     # f32
    tvals = t_ref[:, 0, :].astype(jnp.float32)           # [G,1]

    cur = [0]

    def take(k):
        w = wrefs[cur[0]:cur[0] + k]
        cur[0] += k
        return w

    # -- edge_emb: Linear([h_edge || h_dist]) split ------------------------
    (w_ee, b_ee) = take(2)
    he = (jnp.dot(e_in, w_ee[:de], preferred_element_type=jnp.float32)
          + jnp.dot(hd, w_ee[de:], preferred_element_type=jnp.float32)
          + b_ee[:]).astype(dt)                          # [G*N*N, De]

    # -- NodeBlock ----------------------------------------------------------
    (we1, be1, se1, ce1, we2, be2) = take(6)
    (wn1, bn1, sn1, cn1, wn2, bn2) = take(6)
    (wm, bm) = take(2)
    (wg1, bg1, sg1, cg1, wg2, bg2) = take(6)
    (wc, bc) = take(2)
    (sl, cl) = take(2)
    (wo, bo) = take(2)

    h_e = jnp.dot(he, we1[:], preferred_element_type=jnp.float32) + be1[:]
    h_e = jax.nn.relu(_ln_p(h_e, se1[:], ce1[:])).astype(dt)
    h_e = (jnp.dot(h_e, we2[:], preferred_element_type=jnp.float32)
           + be2[:]).astype(dt)
    xn = jnp.dot(x, wn1[:], preferred_element_type=jnp.float32) + bn1[:]
    xn = jax.nn.relu(_ln_p(xn, sn1[:], cn1[:])).astype(dt)
    xn = (jnp.dot(xn, wn2[:], preferred_element_type=jnp.float32)
          + bn2[:]).astype(dt)
    # message uses the SENDER's node features -> expand via S
    xn_pairs = _expand_cols(xn.reshape(g_sz, n, -1), g_sz, n).astype(dt)
    msg = (jnp.dot((h_e.astype(jnp.float32) * xn_pairs).astype(dt), wm[:],
                   preferred_element_type=jnp.float32) + bm[:]).astype(dt)
    ge = jnp.dot(he, wg1[:de], preferred_element_type=jnp.float32)
    gx = jnp.dot(x, wg1[de:de + dn], preferred_element_type=jnp.float32)
    gx_pairs = _expand_cols(gx.reshape(g_sz, n, -1), g_sz, n)
    gt_t = jnp.dot(tvals, wg1[de + dn:de + dn + 1],
                   preferred_element_type=jnp.float32)
    gsum = ge + gx_pairs + _expand_graph(gt_t, g_sz, n) + bg1[:]
    gsum = jax.nn.relu(_ln_p(gsum, sg1[:], cg1[:])).astype(dt)
    gate = jax.nn.sigmoid(
        jnp.dot(gsum, wg2[:], preferred_element_type=jnp.float32) + bg2[:]
    ).astype(dt)
    gated = (msg * gate).astype(jnp.float32) * mask_flat
    # sum over senders j: rows are (g, i, j) -> reduce axis 2 of 4D view
    aggr = jnp.sum(gated.reshape(g_sz, n, n, -1), axis=2
                   ).reshape(g_sz * n, -1)
    nb = jnp.dot(x, wc[:], preferred_element_type=jnp.float32) + bc[:] + aggr
    nb = jax.nn.relu(_ln_p(nb, sl[:], cl[:])).astype(dt)
    h_node_delta = (jnp.dot(nb, wo[:], preferred_element_type=jnp.float32)
                    + bo[:]).astype(dt)                   # [G*N, Dn]

    # -- EdgeBlock (uses OLD h_node) -----------------------------------------
    w_bffn_l = take(14)
    w_bffn_r = take(14)
    (wnl, bnl) = take(2)
    (wnr, bnr) = take(2)
    (wsf, bsf) = take(2)
    (sle, cle) = take(2)
    (woe, boe) = take(2)

    # left FFN: node features indexed by the LEFT/receiver i -> selector R
    msg_l = _bond_ffn_flat(he, x, w_bffn_l, dt, g_sz, n, tvals, receiver=True)
    msg_l = msg_l.astype(jnp.float32) * mask_flat
    t_per = jnp.sum(msg_l.reshape(g_sz, n, n, -1), axis=1)   # [G,N,De] by j
    msg_l_out = _expand_rows(t_per.astype(dt), g_sz, n)

    # right FFN: node features indexed by the RIGHT/sender j -> selector S
    msg_r = _bond_ffn_flat(he, x, w_bffn_r, dt, g_sz, n, tvals, receiver=False)
    msg_r = msg_r.astype(jnp.float32) * mask_flat
    u_per = jnp.sum(msg_r.reshape(g_sz, n, n, -1), axis=2)   # [G,N,De] by i
    msg_r_out = _expand_cols(u_per.astype(dt), g_sz, n)

    proj_l = jnp.dot(x, wnl[:], preferred_element_type=jnp.float32) + bnl[:]
    proj_r = jnp.dot(x, wnr[:], preferred_element_type=jnp.float32) + bnr[:]
    proj_l_flat = _expand_rows(proj_l.astype(dt).reshape(g_sz, n, -1), g_sz, n)
    proj_r_flat = _expand_cols(proj_r.astype(dt).reshape(g_sz, n, -1), g_sz, n)
    selfe = jnp.dot(he, wsf[:], preferred_element_type=jnp.float32) + bsf[:]

    eb = msg_l_out + msg_r_out + proj_l_flat + proj_r_flat + selfe
    eb = jax.nn.relu(_ln_p(eb, sle[:], cle[:])).astype(dt)
    edge_out = (jnp.dot(eb, woe[:], preferred_element_type=jnp.float32)
                + boe[:]).astype(dt)
    h_edge_new = (he + edge_out)                          # [G*N*N, De]

    h_node_new = (x + h_node_delta)                       # [G*N, Dn]

    # -- PosUpdate (uses NEW node + NEW edge) ---------------------------------
    w_left = take(6)
    w_right = take(6)
    w_elin = take(14)

    lf = _mlp2(h_node_new, *w_left, dt).astype(dt)        # [G*N, De]
    rf = _mlp2(h_node_new, *w_right, dt).astype(dt)
    lf_flat = _expand_rows(lf.reshape(g_sz, n, -1), g_sz, n)
    rf_flat = _expand_cols(rf.reshape(g_sz, n, -1), g_sz, n)
    node_pair = (lf_flat * rf_flat).astype(dt)            # [G*N*N, De]
    weight = _bond_ffn_pairflat(h_edge_new, node_pair, w_elin, dt, g_sz, n,
                                tvals)                    # [G*N*N, 1]

    rel = rel_ref[:].reshape(g_sz * n * n, 3)             # f32
    d = dist_ref[:].reshape(g_sz * n * n, 1)              # f32
    d_safe = jnp.where(mask_flat > 0, d, 1.0)
    force = weight.astype(jnp.float32) * rel / d_safe / (d_safe + 1.0)
    force = force * mask_flat
    pos_delta = jnp.sum(force.reshape(g_sz, n, n, 3), axis=2)

    out_node_ref[:] = h_node_new.reshape(g_sz, n, dn).astype(out_node_ref.dtype)
    out_edge_ref[:] = h_edge_new.reshape(g_sz, n * n, de).astype(out_edge_ref.dtype)
    out_pos_ref[:] = pos_delta.astype(out_pos_ref.dtype)


def _xla_fused_block(blk, h_node, h_edge, h_dist, rel_vec, distance,
                     node_time, pair_mask):
    """XLA composition of one denoiser block (must match
    models/denoiser.py block_fn with update_edge=update_pos=True); serves as
    fallback, test reference, and custom_vjp backward."""
    from ..models.denoiser import edge_block, node_block, pos_update
    from ..models.nn import linear

    h_edge_in = jnp.concatenate([h_edge, h_dist], axis=-1)
    h_edge_i = linear(blk["edge_emb"], h_edge_in)
    h_node_delta = node_block(blk["node_block"], h_node, h_edge_i,
                              node_time, pair_mask)
    h_edge_i = h_edge_i + edge_block(blk["edge_block"], h_edge_i, h_node,
                                     node_time, pair_mask)
    h_node_new = h_node + h_node_delta
    pos_delta = pos_update(blk["pos_block"], h_node_new, h_edge_i, rel_vec,
                           distance, node_time, pair_mask)
    return h_node_new, h_edge_i, pos_delta


def _pallas_fused_block(blk, h_node, h_edge, h_dist, rel_vec, distance,
                        node_time, pair_mask, interpret=False, group=2):
    b, n, dn = h_node.shape
    de = h_edge.shape[-1]
    dh = h_dist.shape[-1]
    dt = h_node.dtype
    while b % group:
        group //= 2
    g_sz = max(group, 1)

    weights = flatten_block_weights(blk, dt)
    e_flat = h_edge.reshape(b, n * n, de)
    hd_flat = h_dist.astype(dt).reshape(b, n * n, dh)
    rel = rel_vec.astype(jnp.float32).reshape(b, n * n, 3)
    dist = distance.astype(jnp.float32).reshape(b, n * n, 1)
    tcol = jnp.broadcast_to(
        node_time.reshape(-1, 1, 1).astype(jnp.float32), (b, 1, 1)
    )
    mask = pair_mask.astype(jnp.float32).reshape(b, n * n, 1)

    grid = (b // g_sz,)
    cell = lambda shape: pl.BlockSpec(
        (g_sz,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    const = lambda w: pl.BlockSpec(
        w.shape, lambda i: (0,) * w.ndim, memory_space=pltpu.VMEM
    )
    in_specs = [
        cell((n, dn)), cell((n * n, de)), cell((n * n, dh)),
        cell((n * n, 3)), cell((n * n, 1)), cell((n * n, 1)), cell((1, 1)),
    ] + [const(w) for w in weights]
    out_specs = (
        cell((n, dn)), cell((n * n, de)), cell((n, 3)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((b, n, dn), dt),
        jax.ShapeDtypeStruct((b, n * n, de), dt),
        jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
    )
    h_node_new, h_edge_new, pos_delta = pl.pallas_call(
        _fused_block_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # alias the node/edge carries with their outputs: the edge tensor is
        # ~17 MB at B=128 and a fresh output allocation OOMs VMEM when XLA
        # stages the custom-call result on-stack inside the scan
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None if (interpret or INTERPRET) else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or INTERPRET,
    )(h_node, e_flat, hd_flat, rel, dist, mask, tcol, *weights)
    return h_node_new, h_edge_new.reshape(b, n, n, de), pos_delta


@jax.custom_vjp
def fused_block_tpu(blk, h_node, h_edge, h_dist, rel_vec, distance,
                    node_time, pair_mask):
    return _pallas_fused_block(blk, h_node, h_edge, h_dist, rel_vec,
                               distance, node_time, pair_mask)


def _fb_fwd(blk, h_node, h_edge, h_dist, rel_vec, distance, node_time,
            pair_mask):
    out = fused_block_tpu(blk, h_node, h_edge, h_dist, rel_vec, distance,
                          node_time, pair_mask)
    return out, (blk, h_node, h_edge, h_dist, rel_vec, distance, node_time,
                 pair_mask)


def _fb_bwd(res, g):
    _, vjp = jax.vjp(_xla_fused_block, *res)
    return vjp(g)


fused_block_tpu.defvjp(_fb_fwd, _fb_bwd)


# ===========================================================================
# Fused Pallas BACKWARD for the NodeBlock aggregate chain (VERDICT r3 item)
# ===========================================================================
#
# The train step is HBM-bound (docs/PERFORMANCE.md): under remat, XLA's
# backward re-materializes ~10 [B,N,N,H] pair tensors per block in HBM.
# This kernel recomputes the whole edge-MLP/gate/message chain for one
# molecule per grid cell ENTIRELY in VMEM and emits input gradients plus
# f32 parameter-gradient accumulators (the TPU grid is sequential, so
# accumulation across cells into constant-index output blocks is sound).
# HBM traffic per block becomes: read x/edge_attr/dout, write
# dx/d_edge/param grads — no [N,N,H] intermediate ever leaves the chip.


def _ln_fwd_stats(h, scale, bias, eps=1e-5):
    """Mirror models/nn.layernorm: f32 stats; returns (y_f32, xhat, inv)."""
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.var(h, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (h - mean) * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(d_y, xhat, inv, scale):
    """Backward of y = xhat*scale + bias given d_y (f32).

    Returns (d_h, d_scale_rows, d_bias_rows) where the scale/bias grads are
    still per-row (caller sums over rows into the [1,H] accumulator)."""
    d_scale = d_y * xhat
    d_xhat = d_y * scale
    m1 = jnp.mean(d_xhat, axis=-1, keepdims=True)
    m2 = jnp.mean(d_xhat * xhat, axis=-1, keepdims=True)
    d_h = inv * (d_xhat - m1 - xhat * m2)
    return d_h, d_scale, d_y


def _node_block_bwd_kernel(
    x_ref, e_ref, mask_ref, t_ref, dout_ref,
    we1_ref, be1_ref, se1_ref, be1n_ref, we2_ref, be2_ref,
    wn1_ref, bn1_ref, sn1_ref, bn1n_ref, wn2_ref, bn2_ref,
    wm_ref, bm_ref,
    wg1_ref, bg1_ref, sg1_ref, bg1n_ref, wg2_ref, bg2_ref,
    # per-cell outputs
    dx_ref, de_ref, dt_ref, dmask_ref,
    # f32 parameter-grad accumulators (constant index map; sequential grid)
    dwe1_ref, dbe1_ref, dse1_ref, dbe1n_ref, dwe2_ref, dbe2_ref,
    dwn1_ref, dbn1_ref, dsn1_ref, dbn1n_ref, dwn2_ref, dbn2_ref,
    dwm_ref, dbm_ref,
    dwg1e_ref, dwg1x_ref, dwg1t_ref,
    dbg1_ref, dsg1_ref, dbg1n_ref, dwg2_ref, dbg2_ref,
):
    g_sz, n, dn = x_ref.shape
    de_dim = e_ref.shape[-1]
    dt = x_ref.dtype
    x = x_ref[:].reshape(g_sz * n, dn)
    e = e_ref[:].reshape(g_sz * n * n, de_dim)
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)

    # ---- forward recompute (mirrors _node_block_kernel; intermediates kept
    # only in VMEM). INTENTIONAL precision asymmetry: the recompute keeps
    # sigmoid/msg in f32 where the primal forward rounds them to the compute
    # dtype (bf16), so cotangents correspond to a slightly-higher-precision
    # surrogate of the primal. Recorded decision, not an oversight: the
    # delta is bounded by bf16 rounding noise and pinned by the 2x-of-XLA-
    # error accuracy tests (tests/test_pallas_kernels.py). -------------------
    h1 = dot(e, we1_ref[:]) + be1_ref[:]
    ln_e, xhat_e, inv_e = _ln_fwd_stats(h1, se1_ref[:], be1n_ref[:])
    r1 = jax.nn.relu(ln_e).astype(dt)
    h = (dot(r1, we2_ref[:]) + be2_ref[:]).astype(dt)          # [GNN, H]

    hn1 = dot(x, wn1_ref[:]) + bn1_ref[:]
    ln_n, xhat_n, inv_n = _ln_fwd_stats(hn1, sn1_ref[:], bn1n_ref[:])
    rn = jax.nn.relu(ln_n).astype(dt)
    xn = (dot(rn, wn2_ref[:]) + bn2_ref[:]).astype(dt)         # [GN, H]

    hdim = h.shape[-1]
    hh = (h.reshape(g_sz, n, n, hdim)
          * xn.reshape(g_sz, 1, n, hdim)).reshape(g_sz * n * n, hdim)
    msg = (dot(hh, wm_ref[:]) + bm_ref[:]).astype(dt)

    ge = dot(e, wg1_ref[:de_dim])
    gx = dot(x, wg1_ref[de_dim:de_dim + dn])
    tvals = t_ref[:, 0, :].astype(jnp.float32)                 # [G, 1]
    gt_t = dot(tvals, wg1_ref[de_dim + dn:de_dim + dn + 1])    # [G, H]
    g1 = (
        ge.reshape(g_sz, n, n, hdim)
        + gx.reshape(g_sz, 1, n, hdim)
        + gt_t.reshape(g_sz, 1, 1, hdim)
        + bg1_ref[:]
    ).reshape(g_sz * n * n, hdim)
    ln_g, xhat_g, inv_g = _ln_fwd_stats(g1, sg1_ref[:], bg1n_ref[:])
    rg = jax.nn.relu(ln_g).astype(dt)
    g2 = dot(rg, wg2_ref[:]) + bg2_ref[:]
    sig = jax.nn.sigmoid(g2)                                    # f32 [GNN, H]

    # ---- backward ----------------------------------------------------------
    dout = dout_ref[:].astype(jnp.float32).reshape(g_sz, n, 1, hdim)
    mask = mask_ref[:].reshape(g_sz, n, n, 1)
    d_gated = (dout * mask).reshape(g_sz * n * n, hdim)        # [GNN, H]
    msg_f = msg.astype(jnp.float32)
    d_msg = d_gated * sig
    d_sig = d_gated * msg_f
    # d mask: sum_h dout * (msg * sig)
    dmask_ref[:] = (
        (dout * (msg_f * sig).reshape(g_sz, n, n, hdim)).sum(-1)
    ).astype(dmask_ref.dtype)

    # msg linear
    hh_f = hh.astype(jnp.float32)
    d_hh = dot(d_msg, wm_ref[:].T)
    # bilinear
    h_f = h.astype(jnp.float32).reshape(g_sz, n, n, hdim)
    xn_f = xn.astype(jnp.float32).reshape(g_sz, 1, n, hdim)
    d_hh4 = d_hh.reshape(g_sz, n, n, hdim)
    d_h = (d_hh4 * xn_f).reshape(g_sz * n * n, hdim)
    d_xn = (d_hh4 * h_f).sum(axis=1).reshape(g_sz * n, hdim)

    # edge MLP backward
    d_r1 = dot(d_h, we2_ref[:].T.astype(dt))
    d_lne = d_r1 * (ln_e > 0)
    d_h1, dse_rows, dbe_rows = _ln_bwd(d_lne, xhat_e, inv_e, se1_ref[:])
    d_e_edge = dot(d_h1.astype(dt), we1_ref[:].T)

    # node MLP backward
    d_rn = dot(d_xn, wn2_ref[:].T.astype(dt))
    d_lnn = d_rn * (ln_n > 0)
    d_hn1, dsn_rows, dbn_rows = _ln_bwd(d_lnn, xhat_n, inv_n, sn1_ref[:])
    d_x_node = dot(d_hn1.astype(dt), wn1_ref[:].T)

    # gate backward
    d_g2 = d_sig * sig * (1.0 - sig)
    d_rg = dot(d_g2.astype(dt), wg2_ref[:].T.astype(dt))
    d_lng = d_rg * (ln_g > 0)
    d_g1, dsg_rows, dbg_rows = _ln_bwd(d_lng, xhat_g, inv_g, sg1_ref[:])
    d_e_gate = dot(d_g1.astype(dt), wg1_ref[:de_dim].T)
    s_sender = d_g1.reshape(g_sz, n, n, hdim).sum(axis=1)      # [G, N, H]
    d_x_gate = dot(s_sender.reshape(g_sz * n, hdim).astype(dt),
                   wg1_ref[de_dim:de_dim + dn].T)
    d_g1_tot = d_g1.reshape(g_sz, n * n, hdim).sum(axis=1)     # [G, H]
    # dt_ref is [G,1,1]: rank-3 so the Mosaic block (G,1,1) has its last
    # two dims equal to the full array dims (the (8,128) tiling rule).
    dt_ref[:] = dot(d_g1_tot, wg1_ref[de_dim + dn:de_dim + dn + 1].T
                    ).reshape(g_sz, 1, 1).astype(dt_ref.dtype)

    # per-cell input grads
    dx_ref[:] = (d_x_node + d_x_gate).reshape(g_sz, n, dn).astype(dx_ref.dtype)
    de_ref[:] = (d_e_edge + d_e_gate).reshape(g_sz, n * n, de_dim).astype(
        de_ref.dtype)

    # ---- parameter-grad accumulation (sequential grid) ---------------------
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dwe1_ref, dbe1_ref, dse1_ref, dbe1n_ref, dwe2_ref,
                    dbe2_ref, dwn1_ref, dbn1_ref, dsn1_ref, dbn1n_ref,
                    dwn2_ref, dbn2_ref, dwm_ref, dbm_ref,
                    dwg1e_ref, dwg1x_ref, dwg1t_ref,
                    dbg1_ref, dsg1_ref, dbg1n_ref, dwg2_ref, dbg2_ref):
            ref[:] = jnp.zeros_like(ref)

    rsum = lambda a: a.sum(axis=0, keepdims=True)
    e_f = e.astype(jnp.float32)
    x_f = x.astype(jnp.float32)
    r1_f = r1.astype(jnp.float32)
    rn_f = rn.astype(jnp.float32)
    rg_f = rg.astype(jnp.float32)
    dwe1_ref[:] += dot(e_f.T, d_h1)
    dbe1_ref[:] += rsum(d_h1)
    dse1_ref[:] += rsum(dse_rows)
    dbe1n_ref[:] += rsum(dbe_rows)
    dwe2_ref[:] += dot(r1_f.T, d_h)
    dbe2_ref[:] += rsum(d_h)
    dwn1_ref[:] += dot(x_f.T, d_hn1)
    dbn1_ref[:] += rsum(d_hn1)
    dsn1_ref[:] += rsum(dsn_rows)
    dbn1n_ref[:] += rsum(dbn_rows)
    dwn2_ref[:] += dot(rn_f.T, d_xn)
    dbn2_ref[:] += rsum(d_xn)
    dwm_ref[:] += dot(hh_f.T, d_msg)
    dbm_ref[:] += rsum(d_msg)
    # gate first-layer weight rows, [e | x_sender | t], as THREE separate
    # accumulators (concatenated by the caller): sliced `+=` stores into a
    # VMEM ref at non-tile-aligned row offsets don't lower on Mosaic.
    dwg1e_ref[:] += dot(e_f.T, d_g1)
    dwg1x_ref[:] += dot(x_f.T, s_sender.reshape(g_sz * n, hdim))
    dwg1t_ref[:] += dot(tvals.T, d_g1_tot)                     # [1, H]
    dbg1_ref[:] += rsum(d_g1)
    dsg1_ref[:] += rsum(dsg_rows)
    dbg1n_ref[:] += rsum(dbg_rows)
    dwg2_ref[:] += dot(rg_f.T, d_g2)
    dbg2_ref[:] += rsum(d_g2)


def _pallas_node_block_bwd(params, x, edge_attr, node_time, pair_mask, dout,
                           interpret=False, group: int = 1):
    """Run the fused backward kernel; returns cotangents matching the
    primal signature (params, x, edge_attr, node_time, pair_mask)."""
    b, n, dn = x.shape
    de = edge_attr.shape[-1]
    h = params["msg_net"]["w"].shape[0]
    dt = x.dtype
    while b % group:
        group //= 2
    g_sz = max(group, 1)

    e_flat = edge_attr.reshape(b, n * n, de)
    tcol = jnp.broadcast_to(
        node_time.reshape(-1, 1, 1).astype(jnp.float32), (b, n * n, 1)
    )
    mask = pair_mask.astype(jnp.float32)

    pe = params["edge_net"]["layers"]
    pn = params["node_net"]["layers"]
    pg = params["gate"]["layers"]
    cast = lambda w: w.astype(dt)
    f32 = lambda w: w.astype(jnp.float32)
    weights = [
        cast(pe[0]["lin"]["w"]), f32(_prep(pe[0]["lin"]["b"])),
        f32(_prep(pe[0]["ln"]["scale"])), f32(_prep(pe[0]["ln"]["bias"])),
        cast(pe[1]["lin"]["w"]), f32(_prep(pe[1]["lin"]["b"])),
        cast(pn[0]["lin"]["w"]), f32(_prep(pn[0]["lin"]["b"])),
        f32(_prep(pn[0]["ln"]["scale"])), f32(_prep(pn[0]["ln"]["bias"])),
        cast(pn[1]["lin"]["w"]), f32(_prep(pn[1]["lin"]["b"])),
        cast(params["msg_net"]["w"]), f32(_prep(params["msg_net"]["b"])),
        cast(pg[0]["lin"]["w"]), f32(_prep(pg[0]["lin"]["b"])),
        f32(_prep(pg[0]["ln"]["scale"])), f32(_prep(pg[0]["ln"]["bias"])),
        cast(pg[1]["lin"]["w"]), f32(_prep(pg[1]["lin"]["b"])),
    ]

    grid = (b // g_sz,)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    cell = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    in_specs = [
        cell((g_sz, n, dn)), cell((g_sz, n * n, de)), cell((g_sz, n, n)),
        cell((g_sz, n * n, 1)), cell((g_sz, n, h)),
    ] + [const(w.shape) for w in weights]

    f32s = jnp.float32
    acc_shapes = [
        (de, h), (1, h), (1, h), (1, h), (h, h), (1, h),      # edge mlp
        (dn, h), (1, h), (1, h), (1, h), (h, h), (1, h),      # node mlp
        (h, h), (1, h),                                        # msg linear
        # gate first-layer weight rows [e | x_sender | t] as three separate
        # accumulators (sliced VMEM `+=` at non-tile-aligned row offsets
        # doesn't lower on Mosaic) — concatenated back below.
        (de, h), (dn, h), (1, h),
        (1, h), (1, h), (1, h), (h, h), (1, h),                # gate rest
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, n, dn), dt),        # dx
        jax.ShapeDtypeStruct((b, n * n, de), dt),    # d_edge
        jax.ShapeDtypeStruct((b, 1, 1), f32s),       # d_t (rank-3: tiling)
        jax.ShapeDtypeStruct((b, n, n), f32s),       # d_mask
    ] + [jax.ShapeDtypeStruct(s, f32s) for s in acc_shapes]
    out_specs = [
        cell((g_sz, n, dn)), cell((g_sz, n * n, de)), cell((g_sz, 1, 1)),
        cell((g_sz, n, n)),
    ] + [const(s) for s in acc_shapes]

    outs = pl.pallas_call(
        _node_block_bwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret or INTERPRET,
        # The recomputed chain holds ~a dozen [N*N,H] f32 intermediates
        # live at once (~17.2 MB at N=32, H=256) — above Mosaic's default
        # 16 MB scoped-VMEM limit under some surrounding remat layouts.
        # v5e has 128 MB VMEM/core; raise the per-kernel cap explicitly.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(x, e_flat, mask, tcol, dout, *weights)

    dx, d_edge, d_t, d_mask = outs[:4]
    (dwe1, dbe1, dse1, dbe1n, dwe2, dbe2,
     dwn1, dbn1, dsn1, dbn1n, dwn2, dbn2,
     dwm, dbm,
     dwg1e, dwg1x, dwg1t, dbg1, dsg1, dbg1n, dwg2, dbg2) = outs[4:]
    dwg1 = jnp.concatenate([dwg1e, dwg1x, dwg1t], axis=0)

    row = lambda a: a.reshape(-1)
    d_params = {
        "edge_net": {"layers": [
            {"lin": {"w": dwe1, "b": row(dbe1)},
             "ln": {"scale": row(dse1), "bias": row(dbe1n)}},
            {"lin": {"w": dwe2, "b": row(dbe2)}},
        ]},
        "node_net": {"layers": [
            {"lin": {"w": dwn1, "b": row(dbn1)},
             "ln": {"scale": row(dsn1), "bias": row(dbn1n)}},
            {"lin": {"w": dwn2, "b": row(dbn2)}},
        ]},
        "msg_net": {"w": dwm, "b": row(dbm)},
        "gate": {"layers": [
            {"lin": {"w": dwg1, "b": row(dbg1)},
             "ln": {"scale": row(dsg1), "bias": row(dbg1n)}},
            {"lin": {"w": dwg2, "b": row(dbg2)}},
        ]},
    }
    # custom_vjp contract: cotangent dtypes must match the primals. The
    # kernel accumulates param grads in f32 (more accurate than XLA's
    # native-dtype accumulation); cast down only at the boundary.
    d_params = jax.tree.map(lambda g, prm: g.astype(prm.dtype),
                            d_params, params)
    d_node_time = d_t.reshape(node_time.shape).astype(node_time.dtype)
    d_pair_mask = d_mask.astype(pair_mask.dtype)
    return (d_params, dx, d_edge.reshape(edge_attr.shape), d_node_time,
            d_pair_mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def node_block_aggregate_tpu_fused_bwd(params, x, edge_attr, node_time,
                                       pair_mask):
    """Same forward as node_block_aggregate_tpu but with the FUSED Pallas
    backward: the VJP recomputes the pair chain in VMEM per molecule tile
    instead of letting XLA stream saved/remat [B,N,N,H] activations through
    HBM (docs/PERFORMANCE.md train-MFU analysis)."""
    return _pallas_node_block_aggregate(params, x, edge_attr, node_time,
                                        pair_mask)


def _fused_fwd(params, x, edge_attr, node_time, pair_mask):
    out = node_block_aggregate_tpu_fused_bwd(params, x, edge_attr, node_time,
                                             pair_mask)
    return out, (params, x, edge_attr, node_time, pair_mask)


def _fused_bwd(res, g):
    params, x, edge_attr, node_time, pair_mask = res
    return _pallas_node_block_bwd(params, x, edge_attr, node_time, pair_mask,
                                  g)


node_block_aggregate_tpu_fused_bwd.defvjp(_fused_fwd, _fused_bwd)


# ===========================================================================
# Fused Pallas kernels for the EdgeBlock dual-BondFFN pair aggregate
# ===========================================================================
#
# The EdgeBlock (reference graph.py:268-295; models/denoiser.py edge_block)
# runs TWO gated BondFFN chains over the [B,N,N,De] edge tensor at an
# interior width of 2*De and reduces each through a shared endpoint:
#   msg_left  = BondFFN_L(h_bond, h_node[row]);  t[k] = sum_rows msg_left
#   msg_right = BondFFN_R(h_bond, h_node[col]);  u[k] = sum_cols msg_right
# Under XLA those chains stream ~8 [B,N,N,2De] pair tensors per block
# through HBM in the backward (the train step's remaining HBM-bound region
# after the NodeBlock fusion — docs/PERFORMANCE.md). These kernels compute
# both chains per molecule group entirely in VMEM: the forward writes only
# the two [B,N,De] endpoint reductions; the backward recomputes the chains
# and emits input grads plus f32 parameter-grad accumulators, exactly like
# the NodeBlock kernels above.


def _xla_edge_pair_aggregate(params, h_bond, h_node, bond_time, pair_mask):
    """Reference XLA implementation (must exactly match the two BondFFN
    chains + endpoint reductions in models/denoiser.py edge_block; used as
    CPU fallback and as the parity target). ``params`` = {'left': bond_ffn
    params, 'right': bond_ffn params} (gated variant)."""
    from ..models.denoiser import bond_ffn

    dt = h_bond.dtype
    mask = pair_mask.astype(dt)[..., None]
    msg_left = bond_ffn(params["left"], h_bond,
                        h_node[:, :, None, :], bond_time) * mask
    t_per_node = jnp.sum(msg_left, axis=1, dtype=jnp.float32).astype(dt)
    msg_right = bond_ffn(params["right"], h_bond,
                         h_node[:, None, :, :], bond_time) * mask
    u_per_node = jnp.sum(msg_right, axis=2, dtype=jnp.float32).astype(dt)
    return t_per_node, u_per_node


def _edge_side_weights(p, dt):
    """Flatten one BondFFN's params into the kernel operand list (14)."""
    cast = lambda w: w.astype(dt)
    f32 = lambda w: w.astype(jnp.float32)
    pi = p["inter"]["layers"]
    pg = p["gate"]["layers"]
    return [
        cast(p["bond_linear"]["w"]), cast(p["node_linear"]["w"]),
        cast(pi[0]["lin"]["w"]), f32(_prep(pi[0]["lin"]["b"])),
        f32(_prep(pi[0]["ln"]["scale"])), f32(_prep(pi[0]["ln"]["bias"])),
        cast(pi[1]["lin"]["w"]), f32(_prep(pi[1]["lin"]["b"])),
        cast(pg[0]["lin"]["w"]), f32(_prep(pg[0]["lin"]["b"])),
        f32(_prep(pg[0]["ln"]["scale"])), f32(_prep(pg[0]["ln"]["bias"])),
        cast(pg[1]["lin"]["w"]), f32(_prep(pg[1]["lin"]["b"])),
    ]


def _edge_side_chain(e, x, tvals, w, g_sz, n, node_axis, dt):
    """Forward of ONE gated BondFFN chain inside a kernel, all in VMEM.

    ``node_axis`` is the pair axis the node features index (1 = left/row,
    2 = right/col); they broadcast over the other axis. Returns every
    intermediate the backward needs (forward-only callers let DCE drop
    them). Dots accumulate f32; activations cast to the compute dtype at
    the same points as the XLA path.
    """
    (wb, wn, w1, b1, s1, b1n, w2, b2,
     wg1, bg1, sg1, bg1n, wg2, bg2) = w
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    i_dim = wb.shape[1]
    de_in = e.shape[-1]
    dn = x.shape[-1]

    bp = dot(e, wb)                                   # f32 [GNN, I]
    np_ = dot(x, wn)                                  # f32 [GN, I]
    shp = (g_sz, n, 1, i_dim) if node_axis == 1 else (g_sz, 1, n, i_dim)
    np_b = np_.reshape(shp)
    inter0 = (bp.reshape(g_sz, n, n, i_dim) * np_b).reshape(
        g_sz * n * n, i_dim)
    h1 = dot(inter0.astype(dt), w1) + b1
    ln1, xhat1, inv1 = _ln_fwd_stats(h1, s1, b1n)
    r1 = jax.nn.relu(ln1).astype(dt)
    out_i = dot(r1, w2) + b2                          # f32 [GNN, De]

    gh = wg1.shape[1]
    ge = dot(e, wg1[:de_in])
    gx = dot(x, wg1[de_in:de_in + dn])                # [GN, gh]
    gt = dot(tvals, wg1[de_in + dn:de_in + dn + 1])   # [G, gh]
    gshp = (g_sz, n, 1, gh) if node_axis == 1 else (g_sz, 1, n, gh)
    g1 = (
        ge.reshape(g_sz, n, n, gh)
        + gx.reshape(gshp)
        + gt.reshape(g_sz, 1, 1, gh)
        + bg1
    ).reshape(g_sz * n * n, gh)
    lng, xhatg, invg = _ln_fwd_stats(g1, sg1, bg1n)
    rg = jax.nn.relu(lng).astype(dt)
    g2 = dot(rg, wg2) + bg2                           # f32 [GNN, De]
    sig = jax.nn.sigmoid(g2)
    msg = out_i * sig                                 # f32 [GNN, De]
    return dict(bp=bp, np_=np_, np_b=np_b, inter0=inter0, xhat1=xhat1,
                inv1=inv1, ln1=ln1, r1=r1, out_i=out_i, xhatg=xhatg,
                invg=invg, lng=lng, rg=rg, sig=sig, msg=msg)


def _edge_pair_kernel(e_ref, x_ref, mask_ref, t_ref, *refs):
    wl = [r[:] for r in refs[:14]]
    wr = [r[:] for r in refs[14:28]]
    t_out, u_out = refs[28], refs[29]
    g_sz, n, dn = x_ref.shape
    de_in = e_ref.shape[-1]
    dt = x_ref.dtype
    e = e_ref[:].reshape(g_sz * n * n, de_in)
    x = x_ref[:].reshape(g_sz * n, dn)
    tvals = t_ref[:, 0, :].astype(jnp.float32)        # [G, 1]
    mask4 = mask_ref[:][:, :, :, None]                # f32 [G,N,N,1]

    msg_l = _edge_side_chain(e, x, tvals, wl, g_sz, n, 1, dt)["msg"]
    de_out = msg_l.shape[-1]
    t_out[:] = (msg_l.reshape(g_sz, n, n, de_out) * mask4).sum(
        axis=1).astype(t_out.dtype)
    msg_r = _edge_side_chain(e, x, tvals, wr, g_sz, n, 2, dt)["msg"]
    u_out[:] = (msg_r.reshape(g_sz, n, n, de_out) * mask4).sum(
        axis=2).astype(u_out.dtype)


def _edge_side_bwd(w, acc, d_red4, node_axis, e, x, e_f, x_f, tvals, mask4,
                   g_sz, n, dt):
    """Backward of ONE gated BondFFN chain + its masked endpoint reduction,
    given the broadcast cotangent d_red4 ([G,1,N,De] for left / [G,N,1,De]
    for right). Recomputes the forward chain in VMEM (f32 — see the
    recorded precision-asymmetry note on _node_block_bwd_kernel),
    accumulates param grads into ``acc`` and returns
    (d_e, d_x, d_time, d_mask). Shared by the pair-aggregate and the
    full-EdgeBlock backward kernels."""
    (wb, wn, w1, b1, s1, b1n, w2, b2,
     wg1, bg1, sg1, bg1n, wg2, bg2) = w
    (dwb_r, dwn_r, dw1_r, db1_r, ds1_r, db1n_r, dw2_r, db2_r,
     dwg1e_r, dwg1x_r, dwg1t_r, dbg1_r, dsg1_r, dbg1n_r,
     dwg2_r, dbg2_r) = acc
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    rsum = lambda a: a.sum(axis=0, keepdims=True)
    de_in = e.shape[-1]
    dn = x.shape[-1]
    c = _edge_side_chain(e, x, tvals, w, g_sz, n, node_axis, dt)
    de_out = c["msg"].shape[-1]
    i_dim = wb.shape[1]
    sum_axis = 3 - node_axis  # node features broadcast over this axis

    # rank-4 broadcast-multiplies, flattened only with the lane (last)
    # dim preserved — Mosaic can't reshape [G,N,N] -> [GNN,1]
    msg4 = c["msg"].reshape(g_sz, n, n, de_out)
    d_mask_c = (d_red4 * msg4).sum(-1)                       # [G,N,N]
    d_msg = jnp.broadcast_to(d_red4 * mask4,
                             (g_sz, n, n, de_out)).reshape(
        g_sz * n * n, de_out)
    d_out_i = d_msg * c["sig"]
    d_sig = d_msg * c["out_i"]
    d_g2 = d_sig * c["sig"] * (1.0 - c["sig"])
    d_rg = dot(d_g2.astype(dt), wg2.T)
    d_lng = d_rg * (c["lng"] > 0)
    d_g1, dsg_rows, dbg_rows = _ln_bwd(d_lng, c["xhatg"], c["invg"], sg1)
    d_e_gate = dot(d_g1.astype(dt), wg1[:de_in].T)
    gh = wg1.shape[1]
    s_node = d_g1.reshape(g_sz, n, n, gh).sum(axis=sum_axis)  # [G,N,gh]
    s_node_flat = s_node.reshape(g_sz * n, gh)
    d_x_gate = dot(s_node_flat.astype(dt), wg1[de_in:de_in + dn].T)
    d_g1_tot = d_g1.reshape(g_sz, n * n, gh).sum(axis=1)      # [G,gh]
    d_time_c = dot(d_g1_tot, wg1[de_in + dn:de_in + dn + 1].T)  # [G,1]

    d_r1 = dot(d_out_i.astype(dt), w2.T)
    d_ln1 = d_r1 * (c["ln1"] > 0)
    d_h1, ds_rows, db_rows = _ln_bwd(d_ln1, c["xhat1"], c["inv1"], s1)
    d_inter0 = dot(d_h1.astype(dt), w1.T)                     # f32
    d_i4 = d_inter0.reshape(g_sz, n, n, i_dim)
    d_bp = (d_i4 * c["np_b"]).reshape(g_sz * n * n, i_dim)
    d_np = (d_i4 * c["bp"].reshape(g_sz, n, n, i_dim)).sum(
        axis=sum_axis).reshape(g_sz * n, i_dim)
    d_e_inter = dot(d_bp.astype(dt), wb.T)
    d_x_inter = dot(d_np.astype(dt), wn.T)

    dwb_r[:] += dot(e_f.T, d_bp)
    dwn_r[:] += dot(x_f.T, d_np)
    dw1_r[:] += dot(c["inter0"].astype(jnp.float32).T, d_h1)
    db1_r[:] += rsum(d_h1)
    ds1_r[:] += rsum(ds_rows)
    db1n_r[:] += rsum(db_rows)
    dw2_r[:] += dot(c["r1"].astype(jnp.float32).T, d_out_i)
    db2_r[:] += rsum(d_out_i)
    dwg1e_r[:] += dot(e_f.T, d_g1)
    dwg1x_r[:] += dot(x_f.T, s_node_flat)
    dwg1t_r[:] += dot(tvals.T, d_g1_tot)
    dbg1_r[:] += rsum(d_g1)
    dsg1_r[:] += rsum(dsg_rows)
    dbg1n_r[:] += rsum(dbg_rows)
    dwg2_r[:] += dot(c["rg"].astype(jnp.float32).T, d_g2)
    dbg2_r[:] += rsum(d_g2)
    return d_e_gate + d_e_inter, d_x_gate + d_x_inter, d_time_c, d_mask_c


def _edge_pair_bwd_kernel(e_ref, x_ref, mask_ref, t_ref, dt_ct_ref,
                          du_ct_ref, *refs):
    wl = [r[:] for r in refs[:14]]
    wr = [r[:] for r in refs[14:28]]
    de_ref, dx_ref, dtm_ref, dmask_ref = refs[28:32]
    accl = refs[32:48]
    accr = refs[48:64]
    g_sz, n, dn = x_ref.shape
    de_in = e_ref.shape[-1]
    dt = x_ref.dtype
    e = e_ref[:].reshape(g_sz * n * n, de_in)
    x = x_ref[:].reshape(g_sz * n, dn)
    tvals = t_ref[:, 0, :].astype(jnp.float32)
    mask4 = mask_ref[:][:, :, :, None]
    e_f = e.astype(jnp.float32)
    x_f = x.astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in accl + accr:
            ref[:] = jnp.zeros_like(ref)

    def side(w, acc, d_red4, node_axis):
        return _edge_side_bwd(w, acc, d_red4, node_axis, e, x, e_f, x_f,
                              tvals, mask4, g_sz, n, dt)

    de_out = dt_ct_ref.shape[-1]
    # t = sum over rows (axis 1) -> its cotangent broadcasts back over rows;
    # u = sum over cols (axis 2) -> broadcasts back over cols.
    d_red_l = dt_ct_ref[:].astype(jnp.float32).reshape(g_sz, 1, n, de_out)
    d_red_r = du_ct_ref[:].astype(jnp.float32).reshape(g_sz, n, 1, de_out)
    de_l, dx_l, dtm_l, dm_l = side(wl, accl, d_red_l, 1)
    de_r, dx_r, dtm_r, dm_r = side(wr, accr, d_red_r, 2)

    de_ref[:] = (de_l + de_r).reshape(g_sz, n * n, de_in).astype(de_ref.dtype)
    dx_ref[:] = (dx_l + dx_r).reshape(g_sz, n, dn).astype(dx_ref.dtype)
    dtm_ref[:] = (dtm_l + dtm_r).reshape(g_sz, 1, 1).astype(dtm_ref.dtype)
    dmask_ref[:] = (dm_l + dm_r).astype(dmask_ref.dtype)


def _edge_acc_shapes(de_in, dn, i_dim, gh, de_out):
    """Accumulator shapes for ONE BondFFN side (order matches ``side``)."""
    return [
        (de_in, i_dim), (dn, i_dim),                   # bond/node linear
        (i_dim, i_dim), (1, i_dim), (1, i_dim), (1, i_dim),  # inter l0 + ln
        (i_dim, de_out), (1, de_out),                  # inter l1
        # gate first-layer rows [bond | node | time] as three accumulators
        # (sliced VMEM += at non-tile-aligned offsets doesn't lower)
        (de_in, gh), (dn, gh), (1, gh),
        (1, gh), (1, gh), (1, gh),                     # bias + ln
        (gh, de_out), (1, de_out),                     # gate l1
    ]


def _edge_dims(params, h_bond, h_node):
    de_in = h_bond.shape[-1]
    dn = h_node.shape[-1]
    i_dim = params["left"]["bond_linear"]["w"].shape[1]
    gh = params["left"]["gate"]["layers"][0]["lin"]["w"].shape[1]
    de_out = params["left"]["inter"]["layers"][1]["lin"]["w"].shape[1]
    return de_in, dn, i_dim, gh, de_out


def _pallas_edge_pair_aggregate(params, h_bond, h_node, bond_time, pair_mask,
                                interpret=False, group: int = 4):
    b, n, dn = h_node.shape
    de_in, _, i_dim, gh, de_out = _edge_dims(params, h_bond, h_node)
    dt = h_bond.dtype
    while b % group:
        group //= 2
    g_sz = max(group, 1)

    e_flat = h_bond.reshape(b, n * n, de_in)
    tcol = jnp.broadcast_to(
        bond_time.reshape(-1, 1, 1).astype(jnp.float32), (b, n * n, 1))
    mask = pair_mask.astype(jnp.float32)
    weights = (_edge_side_weights(params["left"], dt)
               + _edge_side_weights(params["right"], dt))

    grid = (b // g_sz,)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    cell = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    in_specs = [
        cell((g_sz, n * n, de_in)), cell((g_sz, n, dn)), cell((g_sz, n, n)),
        cell((g_sz, n * n, 1)),
    ] + [const(w.shape) for w in weights]

    t_out, u_out = pl.pallas_call(
        _edge_pair_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[cell((g_sz, n, de_out)), cell((g_sz, n, de_out))],
        out_shape=[jax.ShapeDtypeStruct((b, n, de_out), dt)] * 2,
        interpret=interpret or INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(e_flat, h_node, mask, tcol, *weights)
    return t_out, u_out


def _pallas_edge_pair_bwd(params, h_bond, h_node, bond_time, pair_mask, ct,
                          interpret=False, group: int = 1):
    """Run the fused EdgeBlock backward kernel; returns cotangents matching
    the primal signature (params, h_bond, h_node, bond_time, pair_mask)."""
    d_t_ct, d_u_ct = ct
    b, n, dn = h_node.shape
    de_in, _, i_dim, gh, de_out = _edge_dims(params, h_bond, h_node)
    dt = h_bond.dtype
    while b % group:
        group //= 2
    g_sz = max(group, 1)

    e_flat = h_bond.reshape(b, n * n, de_in)
    tcol = jnp.broadcast_to(
        bond_time.reshape(-1, 1, 1).astype(jnp.float32), (b, n * n, 1))
    mask = pair_mask.astype(jnp.float32)
    weights = (_edge_side_weights(params["left"], dt)
               + _edge_side_weights(params["right"], dt))

    grid = (b // g_sz,)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    cell = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    in_specs = [
        cell((g_sz, n * n, de_in)), cell((g_sz, n, dn)), cell((g_sz, n, n)),
        cell((g_sz, n * n, 1)), cell((g_sz, n, de_out)),
        cell((g_sz, n, de_out)),
    ] + [const(w.shape) for w in weights]

    f32s = jnp.float32
    acc_shapes = (_edge_acc_shapes(de_in, dn, i_dim, gh, de_out)
                  + _edge_acc_shapes(de_in, dn, i_dim, gh, de_out))
    out_shape = [
        jax.ShapeDtypeStruct((b, n * n, de_in), dt),   # d_bond
        jax.ShapeDtypeStruct((b, n, dn), dt),          # d_node
        jax.ShapeDtypeStruct((b, 1, 1), f32s),         # d_time (rank-3)
        jax.ShapeDtypeStruct((b, n, n), f32s),         # d_mask
    ] + [jax.ShapeDtypeStruct(s, f32s) for s in acc_shapes]
    out_specs = [
        cell((g_sz, n * n, de_in)), cell((g_sz, n, dn)), cell((g_sz, 1, 1)),
        cell((g_sz, n, n)),
    ] + [const(s) for s in acc_shapes]

    outs = pl.pallas_call(
        _edge_pair_bwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret or INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(e_flat, h_node, mask, tcol, d_t_ct, d_u_ct, *weights)

    d_bond, d_node, d_time, d_mask = outs[:4]
    n_acc = len(acc_shapes) // 2

    def _side_tree(acc):
        (dwb, dwn, dw1, db1, ds1, db1n, dw2, db2,
         dwg1e, dwg1x, dwg1t, dbg1, dsg1, dbg1n, dwg2, dbg2) = acc
        dwg1 = jnp.concatenate([dwg1e, dwg1x, dwg1t], axis=0)
        row = lambda a: a.reshape(-1)
        return {
            "bond_linear": {"w": dwb},
            "node_linear": {"w": dwn},
            "inter": {"layers": [
                {"lin": {"w": dw1, "b": row(db1)},
                 "ln": {"scale": row(ds1), "bias": row(db1n)}},
                {"lin": {"w": dw2, "b": row(db2)}},
            ]},
            "gate": {"layers": [
                {"lin": {"w": dwg1, "b": row(dbg1)},
                 "ln": {"scale": row(dsg1), "bias": row(dbg1n)}},
                {"lin": {"w": dwg2, "b": row(dbg2)}},
            ]},
        }

    d_params = {"left": _side_tree(outs[4:4 + n_acc]),
                "right": _side_tree(outs[4 + n_acc:])}
    # custom_vjp contract: cotangent dtypes must match the primals (f32
    # accumulation inside the kernel, cast only at the boundary).
    d_params = jax.tree.map(lambda g, prm: g.astype(prm.dtype),
                            d_params, params)
    return (d_params, d_bond.reshape(h_bond.shape), d_node,
            d_time.reshape(bond_time.shape).astype(bond_time.dtype),
            d_mask.astype(pair_mask.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def edge_pair_aggregate_tpu_fused_bwd(params, h_bond, h_node, bond_time,
                                      pair_mask):
    """EdgeBlock pair aggregate (both BondFFN chains + endpoint reductions)
    with the Pallas forward AND the fused Pallas backward — neither
    direction streams a [B,N,N,2De] intermediate through HBM. Wired in via
    models/denoiser.py edge_block(pallas_bwd=True)."""
    return _pallas_edge_pair_aggregate(params, h_bond, h_node, bond_time,
                                       pair_mask)


def _ep_fwd(params, h_bond, h_node, bond_time, pair_mask):
    out = edge_pair_aggregate_tpu_fused_bwd(params, h_bond, h_node,
                                            bond_time, pair_mask)
    return out, (params, h_bond, h_node, bond_time, pair_mask)


def _ep_bwd(res, ct):
    params, h_bond, h_node, bond_time, pair_mask = res
    return _pallas_edge_pair_bwd(params, h_bond, h_node, bond_time,
                                 pair_mask, ct)


edge_pair_aggregate_tpu_fused_bwd.defvjp(_ep_fwd, _ep_bwd)


# ===========================================================================
# FULL-EdgeBlock fused kernels: both BondFFN chains + endpoint reductions +
# the edge TAIL (node-FFN broadcasts, self FFN, LayerNorm, relu, out
# projection) as ONE VMEM-resident kernel, forward and backward.
#
# Motivation (docs/PERFORMANCE.md train-MFU analysis, round 4): with the
# pair-aggregate kernel the tail still streamed ~5 width-64 [B,N,N,64]
# tensors through HBM per block (self_ffn in/out, the 5-term sum, LN/relu,
# out in/out) plus their saved-activation copies under autodiff. Fusing the
# tail removes those round-trips: the forward reads (h_bond, h_node, time,
# mask) and writes ONLY the [B,N,N,De] block delta; the backward recomputes
# the whole block in VMEM and emits input grads + f32 param accumulators.
# Matches models/denoiser.py edge_block (reference graph.py:268-295).
# ===========================================================================


def _edge_tail_weights(p, dt):
    """Flatten the EdgeBlock tail params (node FFNs, self FFN, LN, out)
    into the kernel operand list (10)."""
    cast = lambda w: w.astype(dt)
    f32 = lambda w: w.astype(jnp.float32)
    return [
        cast(p["node_ffn_left"]["w"]), f32(_prep(p["node_ffn_left"]["b"])),
        cast(p["node_ffn_right"]["w"]), f32(_prep(p["node_ffn_right"]["b"])),
        cast(p["self_ffn"]["w"]), f32(_prep(p["self_ffn"]["b"])),
        f32(_prep(p["ln"]["scale"])), f32(_prep(p["ln"]["bias"])),
        cast(p["out"]["w"]), f32(_prep(p["out"]["b"])),
    ]


def _edge_tail_acc_shapes(dn, de_in, de_out):
    """Accumulator shapes for the tail params (order matches
    _edge_tail_weights)."""
    return [
        (dn, de_out), (1, de_out),       # node_ffn_left
        (dn, de_out), (1, de_out),       # node_ffn_right
        (de_in, de_out), (1, de_out),    # self_ffn
        (1, de_out), (1, de_out),        # ln scale/bias
        (de_out, de_out), (1, de_out),   # out
    ]


def _edge_block_tail_fwd(e, x, wt, t_per, u_per, g_sz, n, dt):
    """Tail forward in VMEM given the two reduction results; returns every
    intermediate the backward needs. f32 adds where the XLA path rounds to
    bf16 between terms — same recorded precision asymmetry as the other
    backward kernels."""
    (wnl, bnl, wnr, bnr, wsf, bsf, sle, cle, woe, boe) = wt
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    de_out = t_per.shape[-1]
    # broadcasts back to pairs: T by ROW index i, U by COL index j
    t_b = _expand_rows(t_per, g_sz, n).astype(jnp.float32)
    u_b = _expand_cols(u_per, g_sz, n).astype(jnp.float32)
    projl = (dot(x, wnl) + bnl).astype(dt)           # [GN, De]
    projr = (dot(x, wnr) + bnr).astype(dt)
    projl_b = _expand_rows(projl.reshape(g_sz, n, de_out), g_sz, n)
    projr_b = _expand_cols(projr.reshape(g_sz, n, de_out), g_sz, n)
    selfe = dot(e, wsf) + bsf                        # f32 [GNN, De]
    h1 = (t_b + u_b + projl_b.astype(jnp.float32)
          + projr_b.astype(jnp.float32) + selfe)
    ln_out, xhat, inv = _ln_fwd_stats(h1, sle, cle)
    r = jax.nn.relu(ln_out).astype(dt)
    delta = (dot(r, woe) + boe).astype(dt)           # [GNN, De]
    return dict(h1=h1, ln_out=ln_out, xhat=xhat, inv=inv, r=r, delta=delta)


def _edge_block_full_kernel(e_ref, x_ref, mask_ref, t_ref, *refs):
    wl = [r[:] for r in refs[:14]]
    wr = [r[:] for r in refs[14:28]]
    wt = [r[:] for r in refs[28:38]]
    out_ref = refs[38]
    t_sc, u_sc = refs[39:41]   # VMEM scratch (see layout note below)
    g_sz, n, dn = x_ref.shape
    de_in = e_ref.shape[-1]
    dt = x_ref.dtype
    e = e_ref[:].reshape(g_sz * n * n, de_in)
    x = x_ref[:].reshape(g_sz * n, dn)
    tvals = t_ref[:, 0, :].astype(jnp.float32)        # [G, 1]
    mask4 = mask_ref[:][:, :, :, None]                # f32 [G,N,N,1]

    msg_l = _edge_side_chain(e, x, tvals, wl, g_sz, n, 1, dt)["msg"]
    de_out = msg_l.shape[-1]
    # Mosaic: a sublane-axis reduction result feeding broadcasts/matmuls
    # carries a replicated layout it can't relayout — round-trip through a
    # VMEM scratch to reset to the native layout (same trick as the
    # PosUpdate backward, docs/PERFORMANCE.md Mosaic notes).
    t_sc[:] = (msg_l.reshape(g_sz, n, n, de_out) * mask4).sum(
        axis=1).reshape(g_sz * n, de_out)
    t_per = t_sc[:].reshape(g_sz, n, de_out).astype(dt)  # [G,N,De]
    msg_r = _edge_side_chain(e, x, tvals, wr, g_sz, n, 2, dt)["msg"]
    u_sc[:] = (msg_r.reshape(g_sz, n, n, de_out) * mask4).sum(
        axis=2).reshape(g_sz * n, de_out)
    u_per = u_sc[:].reshape(g_sz, n, de_out).astype(dt)
    tail = _edge_block_tail_fwd(e, x, wt, t_per, u_per, g_sz, n, dt)
    out_ref[:] = tail["delta"].reshape(g_sz, n * n, de_out).astype(
        out_ref.dtype)


def _edge_block_full_bwd_kernel(e_ref, x_ref, mask_ref, t_ref, dct_ref,
                                *refs):
    wl = [r[:] for r in refs[:14]]
    wr = [r[:] for r in refs[14:28]]
    wt = [r[:] for r in refs[28:38]]
    de_ref, dx_ref, dtm_ref, dmask_ref = refs[38:42]
    accl = refs[42:58]
    accr = refs[58:74]
    acct = refs[74:84]
    t_sc, u_sc, s1_sc, s2_sc = refs[84:88]  # VMEM layout-reset scratch
    g_sz, n, dn = x_ref.shape
    de_in = e_ref.shape[-1]
    dt = x_ref.dtype
    e = e_ref[:].reshape(g_sz * n * n, de_in)
    x = x_ref[:].reshape(g_sz * n, dn)
    tvals = t_ref[:, 0, :].astype(jnp.float32)
    mask4 = mask_ref[:][:, :, :, None]
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    rsum = lambda a: a.sum(axis=0, keepdims=True)
    e_f = e.astype(jnp.float32)
    x_f = x.astype(jnp.float32)
    (wnl, bnl, wnr, bnr, wsf, bsf, sle, cle, woe, boe) = wt
    (dwnl_r, dbnl_r, dwnr_r, dbnr_r, dwsf_r, dbsf_r,
     dsle_r, dcle_r, dwo_r, dbo_r) = acct

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in list(accl) + list(accr) + list(acct):
            ref[:] = jnp.zeros_like(ref)

    # ---- forward recompute (chains via _edge_side_bwd below; reductions +
    # tail here). Reduction results round-trip through VMEM scratch to reset
    # Mosaic's replicated layout before feeding broadcasts/matmuls. ----------
    msg_l = _edge_side_chain(e, x, tvals, wl, g_sz, n, 1, dt)["msg"]
    de_out = msg_l.shape[-1]
    t_sc[:] = (msg_l.reshape(g_sz, n, n, de_out) * mask4).sum(
        axis=1).reshape(g_sz * n, de_out)
    t_per = t_sc[:].reshape(g_sz, n, de_out).astype(dt)
    msg_r = _edge_side_chain(e, x, tvals, wr, g_sz, n, 2, dt)["msg"]
    u_sc[:] = (msg_r.reshape(g_sz, n, n, de_out) * mask4).sum(
        axis=2).reshape(g_sz * n, de_out)
    u_per = u_sc[:].reshape(g_sz, n, de_out).astype(dt)
    tail = _edge_block_tail_fwd(e, x, wt, t_per, u_per, g_sz, n, dt)

    # ---- tail backward ------------------------------------------------------
    d_delta = dct_ref[:].astype(jnp.float32).reshape(g_sz * n * n, de_out)
    d_r = dot(d_delta.astype(dt), woe.T)
    dwo_r[:] += dot(tail["r"].astype(jnp.float32).T, d_delta)
    dbo_r[:] += rsum(d_delta)
    d_ln = d_r * (tail["ln_out"] > 0)
    d_h, ds_rows, dc_rows = _ln_bwd(d_ln, tail["xhat"], tail["inv"], sle)
    dsle_r[:] += rsum(ds_rows)
    dcle_r[:] += rsum(dc_rows)

    # self-FFN path
    d_e_self = dot(d_h.astype(dt), wsf.T)              # f32 [GNN, De_in]
    dwsf_r[:] += dot(e_f.T, d_h)
    dbsf_r[:] += rsum(d_h)

    # node-FFN broadcast paths: left by ROW index (broadcast over axis 2),
    # right by COL index (broadcast over axis 1). The two axis sums are
    # shared with the reduction cotangents below; each round-trips through
    # scratch once to reset the layout.
    d_h4 = d_h.reshape(g_sz, n, n, de_out)
    s2_sc[:] = d_h4.sum(axis=2).reshape(g_sz * n, de_out)
    s1_sc[:] = d_h4.sum(axis=1).reshape(g_sz * n, de_out)
    d_projl = s2_sc[:]
    d_projr = s1_sc[:]
    d_x_projl = dot(d_projl.astype(dt), wnl.T)
    d_x_projr = dot(d_projr.astype(dt), wnr.T)
    dwnl_r[:] += dot(x_f.T, d_projl)
    dbnl_r[:] += rsum(d_projl)
    dwnr_r[:] += dot(x_f.T, d_projr)
    dbnr_r[:] += rsum(d_projr)

    # reduction cotangents: t_b[g,i,j] = t_per[g,i] and t = sum over axis 1
    # -> d_red_l broadcasts over axis 1 of the pair grid; u symmetric.
    d_red_l = d_projl.reshape(g_sz, 1, n, de_out)
    d_red_r = d_projr.reshape(g_sz, n, 1, de_out)
    de_l, dx_l, dtm_l, dm_l = _edge_side_bwd(
        wl, accl, d_red_l, 1, e, x, e_f, x_f, tvals, mask4, g_sz, n, dt)
    de_r, dx_r, dtm_r, dm_r = _edge_side_bwd(
        wr, accr, d_red_r, 2, e, x, e_f, x_f, tvals, mask4, g_sz, n, dt)

    de_ref[:] = (d_e_self + de_l + de_r).reshape(
        g_sz, n * n, de_in).astype(de_ref.dtype)
    dx_ref[:] = (d_x_projl + d_x_projr + dx_l + dx_r).reshape(
        g_sz, n, dn).astype(dx_ref.dtype)
    dtm_ref[:] = (dtm_l + dtm_r).reshape(g_sz, 1, 1).astype(dtm_ref.dtype)
    dmask_ref[:] = (dm_l + dm_r).astype(dmask_ref.dtype)


def _xla_edge_block_full(params, h_bond, h_node, bond_time, pair_mask):
    """XLA reference composition (exactly models/denoiser.py edge_block
    minus the residual add); CPU fallback + parity target."""
    from ..models.denoiser import edge_block

    return edge_block(params, h_bond, h_node, bond_time, pair_mask)


def _edge_full_weights(params, dt):
    return (_edge_side_weights(params["bond_ffn_left"], dt)
            + _edge_side_weights(params["bond_ffn_right"], dt)
            + _edge_tail_weights(params, dt))


def _edge_full_dims(params, h_bond, h_node):
    de_in = h_bond.shape[-1]
    dn = h_node.shape[-1]
    i_dim = params["bond_ffn_left"]["bond_linear"]["w"].shape[1]
    gh = params["bond_ffn_left"]["gate"]["layers"][0]["lin"]["w"].shape[1]
    de_out = params["out"]["w"].shape[1]
    return de_in, dn, i_dim, gh, de_out


def _pallas_edge_block_full(params, h_bond, h_node, bond_time, pair_mask,
                            interpret=False, group: int = 4):
    b, n, dn = h_node.shape
    de_in, _, i_dim, gh, de_out = _edge_full_dims(params, h_bond, h_node)
    dt = h_bond.dtype
    while b % group:
        group //= 2
    g_sz = max(group, 1)

    e_flat = h_bond.reshape(b, n * n, de_in)
    tcol = jnp.broadcast_to(
        bond_time.reshape(-1, 1, 1).astype(jnp.float32), (b, n * n, 1))
    mask = pair_mask.astype(jnp.float32)
    weights = _edge_full_weights(params, dt)

    grid = (b // g_sz,)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    cell = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    in_specs = [
        cell((g_sz, n * n, de_in)), cell((g_sz, n, dn)), cell((g_sz, n, n)),
        cell((g_sz, n * n, 1)),
    ] + [const(w.shape) for w in weights]

    out = pl.pallas_call(
        _edge_block_full_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[cell((g_sz, n * n, de_out))],
        out_shape=[jax.ShapeDtypeStruct((b, n * n, de_out), dt)],
        scratch_shapes=[pltpu.VMEM((g_sz * n, de_out), jnp.float32)] * 2,
        interpret=interpret or INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(e_flat, h_node, mask, tcol, *weights)[0]
    return out.reshape(b, n, n, de_out)


def _pallas_edge_block_full_bwd(params, h_bond, h_node, bond_time, pair_mask,
                                ct, interpret=False, group: int = 1):
    """Run the full-EdgeBlock backward kernel; returns cotangents matching
    the primal signature (params, h_bond, h_node, bond_time, pair_mask)."""
    b, n, dn = h_node.shape
    de_in, _, i_dim, gh, de_out = _edge_full_dims(params, h_bond, h_node)
    dt = h_bond.dtype
    while b % group:
        group //= 2
    g_sz = max(group, 1)

    e_flat = h_bond.reshape(b, n * n, de_in)
    tcol = jnp.broadcast_to(
        bond_time.reshape(-1, 1, 1).astype(jnp.float32), (b, n * n, 1))
    mask = pair_mask.astype(jnp.float32)
    weights = _edge_full_weights(params, dt)
    ct_flat = ct.reshape(b, n * n, de_out)

    grid = (b // g_sz,)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    cell = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    in_specs = [
        cell((g_sz, n * n, de_in)), cell((g_sz, n, dn)), cell((g_sz, n, n)),
        cell((g_sz, n * n, 1)), cell((g_sz, n * n, de_out)),
    ] + [const(w.shape) for w in weights]

    f32s = jnp.float32
    acc_shapes = (_edge_acc_shapes(de_in, dn, i_dim, gh, de_out)
                  + _edge_acc_shapes(de_in, dn, i_dim, gh, de_out)
                  + _edge_tail_acc_shapes(dn, de_in, de_out))
    out_shape = [
        jax.ShapeDtypeStruct((b, n * n, de_in), dt),   # d_bond
        jax.ShapeDtypeStruct((b, n, dn), dt),          # d_node
        jax.ShapeDtypeStruct((b, 1, 1), f32s),         # d_time (rank-3)
        jax.ShapeDtypeStruct((b, n, n), f32s),         # d_mask
    ] + [jax.ShapeDtypeStruct(s, f32s) for s in acc_shapes]
    out_specs = [
        cell((g_sz, n * n, de_in)), cell((g_sz, n, dn)), cell((g_sz, 1, 1)),
        cell((g_sz, n, n)),
    ] + [const(s) for s in acc_shapes]

    outs = pl.pallas_call(
        _edge_block_full_bwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((g_sz * n, de_out), jnp.float32)] * 4,
        interpret=interpret or INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(e_flat, h_node, mask, tcol, ct_flat, *weights)

    d_bond, d_node, d_time, d_mask = outs[:4]
    n_acc = len(_edge_acc_shapes(de_in, dn, i_dim, gh, de_out))

    def _side_tree(acc):
        (dwb, dwn, dw1, db1, ds1, db1n, dw2, db2,
         dwg1e, dwg1x, dwg1t, dbg1, dsg1, dbg1n, dwg2, dbg2) = acc
        dwg1 = jnp.concatenate([dwg1e, dwg1x, dwg1t], axis=0)
        row = lambda a: a.reshape(-1)
        return {
            "bond_linear": {"w": dwb},
            "node_linear": {"w": dwn},
            "inter": {"layers": [
                {"lin": {"w": dw1, "b": row(db1)},
                 "ln": {"scale": row(ds1), "bias": row(db1n)}},
                {"lin": {"w": dw2, "b": row(db2)}},
            ]},
            "gate": {"layers": [
                {"lin": {"w": dwg1, "b": row(dbg1)},
                 "ln": {"scale": row(dsg1), "bias": row(dbg1n)}},
                {"lin": {"w": dwg2, "b": row(dbg2)}},
            ]},
        }

    (dwnl, dbnl, dwnr, dbnr, dwsf, dbsf,
     dsle, dcle, dwo, dbo) = outs[4 + 2 * n_acc:]
    row = lambda a: a.reshape(-1)
    d_params = {
        "bond_ffn_left": _side_tree(outs[4:4 + n_acc]),
        "bond_ffn_right": _side_tree(outs[4 + n_acc:4 + 2 * n_acc]),
        "node_ffn_left": {"w": dwnl, "b": row(dbnl)},
        "node_ffn_right": {"w": dwnr, "b": row(dbnr)},
        "self_ffn": {"w": dwsf, "b": row(dbsf)},
        "ln": {"scale": row(dsle), "bias": row(dcle)},
        "out": {"w": dwo, "b": row(dbo)},
    }
    # custom_vjp contract: cotangent dtypes must match the primals (f32
    # accumulation inside the kernel, cast only at the boundary).
    d_params = jax.tree.map(lambda g, prm: g.astype(prm.dtype),
                            d_params, params)
    return (d_params, d_bond.reshape(h_bond.shape), d_node,
            d_time.reshape(bond_time.shape).astype(bond_time.dtype),
            d_mask.astype(pair_mask.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def edge_block_tpu_full_bwd(params, h_bond, h_node, bond_time, pair_mask):
    """The WHOLE EdgeBlock (both BondFFN chains + endpoint reductions +
    node/self FFNs + LayerNorm + relu + out projection) with the Pallas
    forward AND the fused Pallas backward — the forward writes only the
    [B,N,N,De] delta, the backward recomputes everything in VMEM. Wired in
    via models/denoiser.py edge_block(pallas_bwd=True)."""
    return _pallas_edge_block_full(params, h_bond, h_node, bond_time,
                                   pair_mask)


def _ebf_fwd(params, h_bond, h_node, bond_time, pair_mask):
    out = edge_block_tpu_full_bwd(params, h_bond, h_node, bond_time,
                                  pair_mask)
    return out, (params, h_bond, h_node, bond_time, pair_mask)


def _ebf_bwd(res, ct):
    params, h_bond, h_node, bond_time, pair_mask = res
    return _pallas_edge_block_full_bwd(params, h_bond, h_node, bond_time,
                                       pair_mask, ct)


edge_block_tpu_full_bwd.defvjp(_ebf_fwd, _ebf_bwd)


# ===========================================================================
# Fused Pallas kernels for PosUpdate (the widest pair chain: inter = Dn)
# ===========================================================================
#
# PosUpdate (reference graph.py:384-396; models/denoiser.py pos_update) runs
# a gated BondFFN over [B,N,N,De] whose INTERIOR width is node_dim (256 on
# the flagship) — the widest pair tensors in the whole network: ~6
# [B,N,N,Dn] intermediates per block (134 MB each at B=256, N=32, bf16)
# stream through HBM under XLA, in the forward AND again in the remat
# backward. On top, the "node features" entering the FFN are themselves a
# pair-shaped product mlp_L(h_node)[i] * mlp_R(h_node)[j]. These kernels
# compute the two node MLPs, the pairwise product, the full gated chain,
# and the f32 force reduction per molecule group entirely in VMEM: the
# forward writes only the [B,N,3] force; the backward recomputes the chain
# and emits input grads plus f32 parameter-grad accumulators.


def _xla_pos_update(params, h_node, h_edge, rel_vec, distance, edge_time,
                    pair_mask):
    """Reference XLA implementation (exactly models/denoiser.py pos_update
    without the fuse_edge variant; CPU fallback + parity target)."""
    from ..models.denoiser import pos_update

    return pos_update(params, h_node, h_edge, rel_vec, distance, edge_time,
                      pair_mask)


def _mlp_weights(p, dt):
    """Flatten one 2-layer MLP's params into the kernel operand list (6)."""
    cast = lambda w: w.astype(dt)
    f32 = lambda w: w.astype(jnp.float32)
    l0, l1 = p["layers"]
    return [
        cast(l0["lin"]["w"]), f32(_prep(l0["lin"]["b"])),
        f32(_prep(l0["ln"]["scale"])), f32(_prep(l0["ln"]["bias"])),
        cast(l1["lin"]["w"]), f32(_prep(l1["lin"]["b"])),
    ]


_MLP_ACC = lambda din, hid, dout: [
    (din, hid), (1, hid), (1, hid), (1, hid), (hid, dout), (1, dout)]


def _mlp_chain(x, w, dt):
    """Forward of one 2-layer MLP (lin -> LN -> relu -> lin) in VMEM,
    keeping the intermediates the backward needs."""
    w1, b1, s1, b1n, w2, b2 = w
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    h1 = dot(x, w1) + b1
    ln1, xhat1, inv1 = _ln_fwd_stats(h1, s1, b1n)
    r1 = jax.nn.relu(ln1).astype(dt)
    out = (dot(r1, w2) + b2).astype(dt)
    return dict(h1=h1, ln1=ln1, xhat1=xhat1, inv1=inv1, r1=r1, out=out)


def _mlp_bwd(c, x_f, d_out, w, acc, dt):
    """Backward of _mlp_chain given f32 d_out; accumulates param grads into
    ``acc`` and returns d_x (f32)."""
    w1, b1, s1, b1n, w2, b2 = w
    dw1_r, db1_r, ds1_r, db1n_r, dw2_r, db2_r = acc
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    rsum = lambda a: a.sum(axis=0, keepdims=True)
    d_r1 = dot(d_out.astype(dt), w2.T)
    d_ln1 = d_r1 * (c["ln1"] > 0)
    d_h1, ds_rows, db_rows = _ln_bwd(d_ln1, c["xhat1"], c["inv1"], s1)
    d_x = dot(d_h1.astype(dt), w1.T)
    dw1_r[:] += dot(x_f.T, d_h1)
    db1_r[:] += rsum(d_h1)
    ds1_r[:] += rsum(ds_rows)
    db1n_r[:] += rsum(db_rows)
    dw2_r[:] += dot(c["r1"].astype(jnp.float32).T, d_out)
    db2_r[:] += rsum(d_out)
    return d_x


def _pos_ffn_chain(e, xp, tvals, w, g_sz, n, dt):
    """Forward of PosUpdate's gated BondFFN in VMEM. Unlike the EdgeBlock
    chains, the node features ``xp`` are already pair-shaped [GNN, De]
    (the left*right MLP product), so nothing broadcasts."""
    (wb, wn, w1, b1, s1, b1n, w2, b2,
     wg1, bg1, sg1, bg1n, wg2, bg2) = w
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    de_in = e.shape[-1]
    dxp = xp.shape[-1]
    gh = wg1.shape[1]

    bp = dot(e, wb)                                   # f32 [GNN, I]
    np_ = dot(xp, wn)                                 # f32 [GNN, I]
    inter0 = bp * np_
    h1 = dot(inter0.astype(dt), w1) + b1
    ln1, xhat1, inv1 = _ln_fwd_stats(h1, s1, b1n)
    r1 = jax.nn.relu(ln1).astype(dt)
    out_i = dot(r1, w2) + b2                          # f32 [GNN, 1]

    ge = dot(e, wg1[:de_in])                          # [GNN, gh]
    gx = dot(xp, wg1[de_in:de_in + dxp])              # [GNN, gh]
    gt = dot(tvals, wg1[de_in + dxp:de_in + dxp + 1])  # [G, gh]
    g1 = (
        ge.reshape(g_sz, n, n, gh)
        + gx.reshape(g_sz, n, n, gh)
        + gt.reshape(g_sz, 1, 1, gh)
        + bg1
    ).reshape(g_sz * n * n, gh)
    lng, xhatg, invg = _ln_fwd_stats(g1, sg1, bg1n)
    rg = jax.nn.relu(lng).astype(dt)
    g2 = dot(rg, wg2) + bg2                           # f32 [GNN, 1]
    sig = jax.nn.sigmoid(g2)
    msg = out_i * sig                                 # f32 [GNN, 1]
    return dict(bp=bp, np_=np_, inter0=inter0, xhat1=xhat1, inv1=inv1,
                ln1=ln1, r1=r1, out_i=out_i, xhatg=xhatg, invg=invg,
                lng=lng, rg=rg, sig=sig, msg=msg)


def _pair_product(lout, rout, g_sz, n, de, dt):
    """xp[g,i,j] = L[g,i] * R[g,j] at pair-flat rank, Mosaic-safely: a
    two-broadcast product ([G,N,1,De] x [G,1,N,De]) hits an 'invalid
    relayout' in Mosaic layout inference, and bf16 mid-unit-dim shape casts
    don't lower at all — materialize the right side full-rank in f32 first,
    then multiply with the single middle-unit broadcast (the pattern the
    Edge/NodeBlock kernels already lower). bf16(a)*bf16(b) rounded back to
    bf16 equals the f32 product rounded, so this matches the XLA path."""
    lf = lout.astype(jnp.float32).reshape(g_sz, n, 1, de)
    rfull = jnp.broadcast_to(
        rout.astype(jnp.float32).reshape(g_sz, 1, n, de), (g_sz, n, n, de))
    return (rfull * lf).astype(dt).reshape(g_sz * n * n, de)


def _pos_force_terms(dist, mask4):
    """d_safe-based force factors, f32: q = 1/d_safe, r = 1/(d_safe+1)."""
    d4 = dist[:, :, :, None]
    d_safe = jnp.where(mask4 > 0, d4, 1.0)
    q = 1.0 / d_safe
    r_ = 1.0 / (d_safe + 1.0)
    return d_safe, q, r_


def _pos_update_kernel(x_ref, e_ref, rv_ref, dist_ref, mask_ref, t_ref,
                       *refs):
    wl = [r[:] for r in refs[0:6]]
    wr = [r[:] for r in refs[6:12]]
    wf = [r[:] for r in refs[12:26]]
    out_ref = refs[26]
    g_sz, n, dn = x_ref.shape
    de_in = e_ref.shape[-1]
    dt = x_ref.dtype
    x = x_ref[:].reshape(g_sz * n, dn)
    e = e_ref[:].reshape(g_sz * n * n, de_in)
    tvals = t_ref[:, 0, :].astype(jnp.float32)        # [G, 1]
    mask4 = mask_ref[:][:, :, :, None]                # f32 [G,N,N,1]

    lout = _mlp_chain(x, wl, dt)["out"]               # [GN, De] dt
    rout = _mlp_chain(x, wr, dt)["out"]
    de = lout.shape[-1]
    xp = _pair_product(lout, rout, g_sz, n, de, dt)
    w4 = _pos_ffn_chain(e, xp, tvals, wf, g_sz, n, dt)["msg"].reshape(
        g_sz, n, n, 1)                                # f32 weight

    rv4 = rv_ref[:].reshape(g_sz, n, n, 3)
    _, q, r_ = _pos_force_terms(dist_ref[:], mask4)
    force4 = w4 * rv4 * q * r_ * mask4
    out_ref[:] = force4.sum(axis=2).astype(out_ref.dtype)


def _pos_update_bwd_kernel(x_ref, e_ref, rv_ref, dist_ref, mask_ref, t_ref,
                           ct_ref, *refs):
    wl = [r[:] for r in refs[0:6]]
    wr = [r[:] for r in refs[6:12]]
    wf = [r[:] for r in refs[12:26]]
    (dx_ref, de_ref, drv_ref, ddist_ref, dtm_ref, dmask_ref) = refs[26:32]
    accl = refs[32:38]
    accr = refs[38:44]
    accf = refs[44:60]
    dl_scratch = refs[60]
    g_sz, n, dn = x_ref.shape
    de_in = e_ref.shape[-1]
    dt = x_ref.dtype
    x = x_ref[:].reshape(g_sz * n, dn)
    e = e_ref[:].reshape(g_sz * n * n, de_in)
    tvals = t_ref[:, 0, :].astype(jnp.float32)
    mask4 = mask_ref[:][:, :, :, None]
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    rsum = lambda a: a.sum(axis=0, keepdims=True)
    x_f = x.astype(jnp.float32)
    e_f = e.astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in tuple(accl) + tuple(accr) + tuple(accf):
            ref[:] = jnp.zeros_like(ref)

    # ---- forward recompute, all in VMEM ------------------------------------
    cl = _mlp_chain(x, wl, dt)
    cr = _mlp_chain(x, wr, dt)
    lout, rout = cl["out"], cr["out"]
    de = lout.shape[-1]
    xp = _pair_product(lout, rout, g_sz, n, de, dt)
    lout4 = lout.astype(jnp.float32).reshape(g_sz, n, 1, de)
    rout4 = jnp.broadcast_to(
        rout.astype(jnp.float32).reshape(g_sz, 1, n, de), (g_sz, n, n, de))
    cf = _pos_ffn_chain(e, xp, tvals, wf, g_sz, n, dt)
    w4 = cf["msg"].reshape(g_sz, n, n, 1)

    # ---- force backward -----------------------------------------------------
    rv4 = rv_ref[:].reshape(g_sz, n, n, 3)
    _, q, r_ = _pos_force_terms(dist_ref[:], mask4)
    qr = q * r_
    ct4 = ct_ref[:].astype(jnp.float32).reshape(g_sz, n, 1, 3)
    ct_dot_rv = (ct4 * rv4).sum(-1, keepdims=True)     # [G,N,N,1]
    d_w4 = ct_dot_rv * qr * mask4
    drv_ref[:] = (ct4 * w4 * qr * mask4).reshape(
        g_sz, n * n, 3).astype(drv_ref.dtype)
    dmask_ref[:] = (ct_dot_rv * w4 * qr)[..., 0].astype(dmask_ref.dtype)
    ddist_ref[:] = (
        ct_dot_rv * w4 * mask4 * (-qr) * (q + r_)
    )[..., 0].astype(ddist_ref.dtype)

    # ---- gated BondFFN backward ---------------------------------------------
    (wb, wn, w1, b1, s1, b1n, w2, b2,
     wg1, bg1, sg1, bg1n, wg2, bg2) = wf
    (dwb_r, dwn_r, dw1_r, db1_r, ds1_r, db1n_r, dw2_r, db2_r,
     dwg1e_r, dwg1x_r, dwg1t_r, dbg1_r, dsg1_r, dbg1n_r,
     dwg2_r, dbg2_r) = accf
    i_dim = wb.shape[1]
    gh = wg1.shape[1]
    xp_f = xp.astype(jnp.float32)

    d_msg = d_w4.reshape(g_sz * n * n, 1)              # f32 [GNN, 1]
    d_out_i = d_msg * cf["sig"]
    d_sig = d_msg * cf["out_i"]
    d_g2 = d_sig * cf["sig"] * (1.0 - cf["sig"])
    d_rg = dot(d_g2.astype(dt), wg2.T)
    d_lng = d_rg * (cf["lng"] > 0)
    d_g1, dsg_rows, dbg_rows = _ln_bwd(d_lng, cf["xhatg"], cf["invg"], sg1)
    d_e_gate = dot(d_g1.astype(dt), wg1[:de_in].T)
    d_xp_gate = dot(d_g1.astype(dt), wg1[de_in:de_in + de].T)
    d_g1_tot = d_g1.reshape(g_sz, n * n, gh).sum(axis=1)  # [G, gh]
    d_time = dot(d_g1_tot, wg1[de_in + de:de_in + de + 1].T)  # [G, 1]

    d_r1 = dot(d_out_i.astype(dt), w2.T)
    d_ln1 = d_r1 * (cf["ln1"] > 0)
    d_h1, ds_rows, db_rows = _ln_bwd(d_ln1, cf["xhat1"], cf["inv1"], s1)
    d_inter0 = dot(d_h1.astype(dt), w1.T)              # f32 [GNN, I]
    d_bp = d_inter0 * cf["np_"]
    d_np = d_inter0 * cf["bp"]
    d_e_inter = dot(d_bp.astype(dt), wb.T)
    d_xp_inter = dot(d_np.astype(dt), wn.T)

    dwb_r[:] += dot(e_f.T, d_bp)
    dwn_r[:] += dot(xp_f.T, d_np)
    dw1_r[:] += dot(cf["inter0"].astype(jnp.float32).T, d_h1)
    db1_r[:] += rsum(d_h1)
    ds1_r[:] += rsum(ds_rows)
    db1n_r[:] += rsum(db_rows)
    dw2_r[:] += dot(cf["r1"].astype(jnp.float32).T, d_out_i)
    db2_r[:] += rsum(d_out_i)
    dwg1e_r[:] += dot(e_f.T, d_g1)
    dwg1x_r[:] += dot(xp_f.T, d_g1)
    dwg1t_r[:] += dot(tvals.T, d_g1_tot)
    dbg1_r[:] += rsum(d_g1)
    dsg1_r[:] += rsum(dsg_rows)
    dbg1n_r[:] += rsum(dbg_rows)
    dwg2_r[:] += dot(cf["rg"].astype(jnp.float32).T, d_g2)
    dbg2_r[:] += rsum(d_g2)

    # ---- pairwise-product + node-MLP backward -------------------------------
    d_xp4 = (d_xp_gate + d_xp_inter).reshape(g_sz, n, n, de)
    # the axis-2 (sublane) reduction result feeds matmuls in _mlp_bwd;
    # Mosaic's layout inference rejects that relayout ("non-singleton
    # logical dimension is replicated in destination but not in source") —
    # round-trip it through a VMEM scratch to reset to the native layout.
    dl_scratch[:] = (d_xp4 * rout4).sum(axis=2).reshape(g_sz * n, de)
    d_lout = dl_scratch[:]
    d_rout = (d_xp4 * lout4).sum(axis=1).reshape(g_sz * n, de)
    d_x_left = _mlp_bwd(cl, x_f, d_lout, wl, accl, dt)
    d_x_right = _mlp_bwd(cr, x_f, d_rout, wr, accr, dt)

    dx_ref[:] = (d_x_left + d_x_right).reshape(g_sz, n, dn).astype(
        dx_ref.dtype)
    de_ref[:] = (d_e_gate + d_e_inter).reshape(g_sz, n * n, de_in).astype(
        de_ref.dtype)
    dtm_ref[:] = d_time.reshape(g_sz, 1, 1).astype(dtm_ref.dtype)


def _pos_dims(params, h_node, h_edge):
    dn = h_node.shape[-1]
    de_in = h_edge.shape[-1]
    hd = params["left_lin_edge"]["layers"][0]["lin"]["w"].shape[1]
    de = params["left_lin_edge"]["layers"][1]["lin"]["w"].shape[1]
    el = params["edge_lin"]
    i_dim = el["bond_linear"]["w"].shape[1]
    gh = el["gate"]["layers"][0]["lin"]["w"].shape[1]
    return dn, de_in, hd, de, i_dim, gh


def _pos_kernel_operands(params, h_node, h_edge, rel_vec, distance,
                         edge_time, pair_mask):
    b, n, _ = h_node.shape
    dt = h_node.dtype
    e_flat = h_edge.reshape(b, n * n, -1)
    rv_flat = rel_vec.astype(jnp.float32).reshape(b, n * n, 3)
    dist = distance.astype(jnp.float32)
    mask = pair_mask.astype(jnp.float32)
    tcol = jnp.broadcast_to(
        edge_time.reshape(-1, 1, 1).astype(jnp.float32), (b, n * n, 1))
    weights = (_mlp_weights(params["left_lin_edge"], dt)
               + _mlp_weights(params["right_lin_edge"], dt)
               + _edge_side_weights(params["edge_lin"], dt))
    return e_flat, rv_flat, dist, mask, tcol, weights


def _pallas_pos_update(params, h_node, h_edge, rel_vec, distance, edge_time,
                       pair_mask, interpret=False, group: int = 4):
    b, n, dn = h_node.shape
    de_in = h_edge.shape[-1]
    dt = h_node.dtype
    while b % group:
        group //= 2
    g_sz = max(group, 1)
    e_flat, rv_flat, dist, mask, tcol, weights = _pos_kernel_operands(
        params, h_node, h_edge, rel_vec, distance, edge_time, pair_mask)

    grid = (b // g_sz,)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    cell = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    in_specs = [
        cell((g_sz, n, dn)), cell((g_sz, n * n, de_in)),
        cell((g_sz, n * n, 3)), cell((g_sz, n, n)), cell((g_sz, n, n)),
        cell((g_sz, n * n, 1)),
    ] + [const(w.shape) for w in weights]

    out = pl.pallas_call(
        _pos_update_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[cell((g_sz, n, 3))],
        out_shape=[jax.ShapeDtypeStruct((b, n, 3), jnp.float32)],
        interpret=interpret or INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(h_node, e_flat, rv_flat, dist, mask, tcol, *weights)
    return out[0]


def _pallas_pos_update_bwd(params, h_node, h_edge, rel_vec, distance,
                           edge_time, pair_mask, ct, interpret=False,
                           group: int = 1):
    """Run the fused PosUpdate backward kernel; returns cotangents matching
    the primal signature (params, h_node, h_edge, rel_vec, distance,
    edge_time, pair_mask)."""
    b, n, dn = h_node.shape
    de_in = h_edge.shape[-1]
    dt = h_node.dtype
    while b % group:
        group //= 2
    g_sz = max(group, 1)
    e_flat, rv_flat, dist, mask, tcol, weights = _pos_kernel_operands(
        params, h_node, h_edge, rel_vec, distance, edge_time, pair_mask)
    _, _, hd, de, i_dim, gh = _pos_dims(params, h_node, h_edge)

    grid = (b // g_sz,)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    cell = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    in_specs = [
        cell((g_sz, n, dn)), cell((g_sz, n * n, de_in)),
        cell((g_sz, n * n, 3)), cell((g_sz, n, n)), cell((g_sz, n, n)),
        cell((g_sz, n * n, 1)), cell((g_sz, n, 3)),
    ] + [const(w.shape) for w in weights]

    f32s = jnp.float32
    acc_shapes = (_MLP_ACC(dn, hd, de) + _MLP_ACC(dn, hd, de)
                  + _edge_acc_shapes(de_in, de, i_dim, gh, 1))
    out_shape = [
        jax.ShapeDtypeStruct((b, n, dn), dt),          # d_node
        jax.ShapeDtypeStruct((b, n * n, de_in), dt),   # d_edge
        jax.ShapeDtypeStruct((b, n * n, 3), f32s),     # d_rel_vec
        jax.ShapeDtypeStruct((b, n, n), f32s),         # d_distance
        jax.ShapeDtypeStruct((b, 1, 1), f32s),         # d_time (rank-3)
        jax.ShapeDtypeStruct((b, n, n), f32s),         # d_mask
    ] + [jax.ShapeDtypeStruct(s, f32s) for s in acc_shapes]
    out_specs = [
        cell((g_sz, n, dn)), cell((g_sz, n * n, de_in)),
        cell((g_sz, n * n, 3)), cell((g_sz, n, n)), cell((g_sz, 1, 1)),
        cell((g_sz, n, n)),
    ] + [const(s) for s in acc_shapes]

    outs = pl.pallas_call(
        _pos_update_bwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret or INTERPRET,
        scratch_shapes=[pltpu.VMEM((g_sz * n, de), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(h_node, e_flat, rv_flat, dist, mask, tcol, ct, *weights)

    d_node, d_edge, d_rv, d_dist, d_time, d_mask = outs[:6]
    n_mlp = len(_MLP_ACC(dn, hd, de))
    accl = outs[6:6 + n_mlp]
    accr = outs[6 + n_mlp:6 + 2 * n_mlp]
    accf = outs[6 + 2 * n_mlp:]

    row = lambda a: a.reshape(-1)

    def _mlp_tree(acc):
        dw1, db1, ds1, db1n, dw2, db2 = acc
        return {"layers": [
            {"lin": {"w": dw1, "b": row(db1)},
             "ln": {"scale": row(ds1), "bias": row(db1n)}},
            {"lin": {"w": dw2, "b": row(db2)}},
        ]}

    (dwb, dwn, dw1, db1, ds1, db1n, dw2, db2,
     dwg1e, dwg1x, dwg1t, dbg1, dsg1, dbg1n, dwg2, dbg2) = accf
    dwg1 = jnp.concatenate([dwg1e, dwg1x, dwg1t], axis=0)
    d_params = {
        "left_lin_edge": _mlp_tree(accl),
        "right_lin_edge": _mlp_tree(accr),
        "edge_lin": {
            "bond_linear": {"w": dwb},
            "node_linear": {"w": dwn},
            "inter": {"layers": [
                {"lin": {"w": dw1, "b": row(db1)},
                 "ln": {"scale": row(ds1), "bias": row(db1n)}},
                {"lin": {"w": dw2, "b": row(db2)}},
            ]},
            "gate": {"layers": [
                {"lin": {"w": dwg1, "b": row(dbg1)},
                 "ln": {"scale": row(dsg1), "bias": row(dbg1n)}},
                {"lin": {"w": dwg2, "b": row(dbg2)}},
            ]},
        },
    }
    # custom_vjp contract: cotangent dtypes must match the primals (f32
    # accumulation inside the kernel, cast only at the boundary).
    d_params = jax.tree.map(lambda g, prm: g.astype(prm.dtype),
                            d_params, params)
    return (d_params, d_node, d_edge.reshape(h_edge.shape),
            d_rv.reshape(rel_vec.shape).astype(rel_vec.dtype),
            d_dist.astype(distance.dtype),
            d_time.reshape(edge_time.shape).astype(edge_time.dtype),
            d_mask.astype(pair_mask.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def pos_update_tpu_fused_bwd(params, h_node, h_edge, rel_vec, distance,
                             edge_time, pair_mask):
    """PosUpdate (left/right node MLPs + pairwise product + gated BondFFN +
    f32 force reduction) with the Pallas forward AND the fused Pallas
    backward — none of the [B,N,N,Dn]-wide intermediates touch HBM in
    either direction. Wired in via models/denoiser.py
    pos_update(pallas_bwd=True)."""
    return _pallas_pos_update(params, h_node, h_edge, rel_vec, distance,
                              edge_time, pair_mask)


def _pu_fwd(params, h_node, h_edge, rel_vec, distance, edge_time, pair_mask):
    out = pos_update_tpu_fused_bwd(params, h_node, h_edge, rel_vec, distance,
                                   edge_time, pair_mask)
    return out, (params, h_node, h_edge, rel_vec, distance, edge_time,
                 pair_mask)


def _pu_bwd(res, ct):
    (params, h_node, h_edge, rel_vec, distance, edge_time, pair_mask) = res
    return _pallas_pos_update_bwd(params, h_node, h_edge, rel_vec, distance,
                                  edge_time, pair_mask, ct)


pos_update_tpu_fused_bwd.defvjp(_pu_fwd, _pu_bwd)
