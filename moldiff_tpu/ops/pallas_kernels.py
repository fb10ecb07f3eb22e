"""Pallas TPU kernels for the hot message-passing paths.

The dense-graph NodeBlock (reference semantics: models/graph.py:29-55)
materializes four [B, N, N, H] intermediates in HBM under XLA:
edge-MLP output, bilinear message, gate input, gated message. For H=256,
B=128, N=32 that's ~1.6 GB of HBM traffic per block. This kernel computes
the whole chain for one molecule per grid cell with every intermediate
resident in VMEM ([N*N, H] at N=32, H=256 is 512 KB bf16), writing only the
[N, H] aggregated output.

Forward-only: training and CPU paths use the XLA implementation (the
kernel wires in through `node_block_aggregate`, which falls back outside
TPU); gradients flow through a custom_vjp whose backward recomputes via the
XLA reference implementation.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas import is TPU/CPU-interpret safe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


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
        interpret=interpret,
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
