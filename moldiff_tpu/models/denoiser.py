"""NodeEdgeNet denoiser on dense padded complete graphs.

TPU-first redesign of the reference NodeEdgeNet
(`/root/reference/models/graph.py:10-396`). The reference operates on a flat
ragged edge list with torch_scatter segment sums; molecules are *complete
graphs* (all atom pairs are edges), so here edges live in a dense
``[B, N, N, H]`` tensor where (i, j) is the directed edge i <- j:

  * gather ``x[col]``            -> broadcast over axis 1,
  * ``scatter_sum(msg, row)``    -> ``msg.sum(axis=2)``,
  * edge symmetrization          -> ``h + h.transpose(0, 2, 1, 3)``.

Every op is a batched matmul, broadcast, or reduction — no scatter/gather —
which maps directly onto the MXU/VPU and lets XLA fuse the elementwise
chains. Padding is handled by a pair mask (both endpoints real and i != j);
masked pairs contribute exactly zero to every reduction, so real outputs are
invariant to padding (tested in tests/test_padding.py).

Blocks (parity with reference):
  NodeBlock  graph.py:10-55    gated edge->node messages + centroid linear
  EdgeBlock  graph.py:251-295  two BondFFNs aggregated through shared endpoints
  BondFFN    graph.py:122-141  bilinear bond-node fuse with sigmoid gate
  PosUpdate  graph.py:377-396  E(3)-equivariant position update
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .moe import normalize_moe_cfg
from .nn import (
    GaussianSmearing,
    init_layernorm,
    init_linear,
    init_mlp,
    layernorm,
    linear,
    linear_parts,
    mlp,
    mlp_parts,
    safe_distance,
)


# ---------------------------------------------------------------------------
# sub-blocks
# ---------------------------------------------------------------------------

def init_node_block(key, node_dim, edge_dim, hidden_dim, use_gate, moe=None):
    ks = jax.random.split(key, 6)
    if moe:
        from .moe import init_moe_mlp

        node_net = init_moe_mlp(
            ks[0], node_dim, hidden_dim, hidden_dim, moe["num_experts"]
        )
    else:
        node_net = init_mlp(ks[0], node_dim, hidden_dim, hidden_dim)
    p = {
        "node_net": node_net,
        "edge_net": init_mlp(ks[1], edge_dim, hidden_dim, hidden_dim),
        "msg_net": init_linear(ks[2], hidden_dim, hidden_dim),
        "centroid_lin": init_linear(ks[3], node_dim, hidden_dim),
        "ln": init_layernorm(hidden_dim),
        "out": init_linear(ks[4], hidden_dim, node_dim),
    }
    if use_gate:
        p["gate"] = init_mlp(ks[5], edge_dim + node_dim + 1, hidden_dim, hidden_dim)
    return p


def node_block(p, x, edge_attr, node_time, pair_mask, use_pallas: bool = False,
               edge_pre: Optional[dict] = None, node_mask=None, moe_cfg=None,
               pallas_bwd: bool = False):
    """x: [B,N,Dn], edge_attr: [B,N,N,De], node_time: [B,1,1], pair_mask: [B,N,N].

    Reference graph.py:29-55. Row (receiver) = axis 1, col (sender) = axis 2.
    Mask/time are cast to the compute dtype; the sender reduction
    accumulates in float32. With ``use_pallas`` (gated variant, TPU) the
    message+gate+sum pipeline runs as one fused Pallas kernel
    (ops/pallas_kernels.py) keeping the [N,N,H] intermediates in VMEM.

    ``edge_pre``: precomputed first-layer products of ``edge_attr`` from the
    block-level fused edge-side matmul (:func:`fused_edge_products`) — keys
    ``edge_net`` (and ``gate`` when gated), each bias-free [B,N,N,H]. Exact
    same per-column math as computing them here.
    """
    dt = x.dtype
    moe_aux = None
    if moe_cfg is not None and "experts" in p["node_net"]:
        # routed expert bank in place of the per-atom MLP (models/moe.py);
        # the return value becomes (out, moe_aux). Requires node_mask so
        # padded atoms never consume expert capacity. Exclusive with the
        # fused Pallas kernel.
        from .moe import moe_mlp

        assert node_mask is not None, "MoE node_block needs node_mask"
        assert not use_pallas, "MoE is exclusive with use_pallas"
        h_moe, moe_aux = moe_mlp(p["node_net"], x, node_mask, moe_cfg)
    if use_pallas and "gate" in p:
        from ..ops.pallas_kernels import (
            node_block_aggregate_tpu,
            node_block_aggregate_tpu_fused_bwd,
        )

        fn = (node_block_aggregate_tpu_fused_bwd if pallas_bwd
              else node_block_aggregate_tpu)
        aggr = fn(
            {k: p[k] for k in ("node_net", "edge_net", "msg_net", "gate")},
            x, edge_attr, node_time, pair_mask,
        )
    else:
        h_node = (h_moe if moe_aux is not None
                  else mlp(p["node_net"], x))               # [B,N,H]
        if edge_pre is not None:
            h_edge = mlp_parts(p["edge_net"], (), (edge_attr.shape[-1],),
                               pre=edge_pre["edge_net"])    # [B,N,N,H]
        else:
            h_edge = mlp(p["edge_net"], edge_attr)          # [B,N,N,H]
        msg = linear(p["msg_net"], h_edge * h_node[:, None, :, :])
        if "gate" in p:
            # gate MLP over implicit concat [edge_attr ‖ x[col] ‖ time]: the
            # node and time parts are constant along the receiver axis, so
            # mlp_parts runs them at O(N)/O(1) instead of O(N^2) and never
            # materializes the [B,N,N,De+Dn+1] concat.
            if edge_pre is not None:
                gate = mlp_parts(
                    p["gate"],
                    (x[:, None, :, :], node_time.astype(dt)[:, :, :, None]),
                    (edge_attr.shape[-1], x.shape[-1], 1),
                    pre=edge_pre["gate"],
                )
            else:
                gate = mlp_parts(
                    p["gate"],
                    (edge_attr, x[:, None, :, :], node_time.astype(dt)[:, :, :, None]),
                    (edge_attr.shape[-1], x.shape[-1], 1),
                )
            msg = msg * jax.nn.sigmoid(gate)
        msg = msg * pair_mask.astype(dt)[..., None]
        aggr = jnp.sum(msg, axis=2, dtype=jnp.float32).astype(dt)
    out = linear(p["centroid_lin"], x) + aggr
    out = layernorm(p["ln"], out)
    out = linear(p["out"], jax.nn.relu(out))
    return out if moe_aux is None else (out, moe_aux)


def init_bond_ffn(key, bond_dim, node_dim, inter_dim, use_gate, out_dim=None):
    out_dim = bond_dim if out_dim is None else out_dim
    ks = jax.random.split(key, 4)
    p = {
        "bond_linear": init_linear(ks[0], bond_dim, inter_dim, bias=False),
        "node_linear": init_linear(ks[1], node_dim, inter_dim, bias=False),
        "inter": init_mlp(ks[2], inter_dim, out_dim, inter_dim),
    }
    if use_gate:
        p["gate"] = init_mlp(ks[3], bond_dim + node_dim + 1, out_dim, 32)
    return p


def bond_ffn(p, bond_feat_in, node_feat_in, time,
             bond_pre: Optional[jnp.ndarray] = None,
             gate_pre: Optional[jnp.ndarray] = None):
    """Bilinear bond-node fuse (reference graph.py:133-141).

    bond_feat_in: [B,N,N,Db]; node_feat_in broadcastable to [B,N,N,Dn];
    time broadcastable to [B,N,N,1]. ``bond_pre`` / ``gate_pre`` are optional
    precomputed bond-side first-layer products (bias-free) from the fused
    edge-side matmul.
    """
    while time.ndim < bond_feat_in.ndim:
        time = time[..., None]
    bond_proj = bond_pre if bond_pre is not None else linear(p["bond_linear"], bond_feat_in)
    inter = bond_proj * linear(p["node_linear"], node_feat_in)
    inter = mlp(p["inter"], inter)
    if "gate" in p:
        # implicit concat [bond ‖ node ‖ time]: broadcast node/time parts are
        # matmul'd at their own shape (O(N) / O(1)), no concat materialized.
        if gate_pre is not None:
            gate = mlp_parts(
                p["gate"],
                (node_feat_in, time.astype(bond_feat_in.dtype)),
                (bond_feat_in.shape[-1], node_feat_in.shape[-1], 1),
                pre=gate_pre,
            )
        else:
            gate = mlp_parts(
                p["gate"],
                (bond_feat_in, node_feat_in, time.astype(bond_feat_in.dtype)),
                (bond_feat_in.shape[-1], node_feat_in.shape[-1], 1),
            )
        inter = inter * jax.nn.sigmoid(gate)
    return inter


def init_edge_block(key, edge_dim, node_dim, use_gate):
    inter_dim = edge_dim * 2
    ks = jax.random.split(key, 7)
    return {
        "bond_ffn_left": init_bond_ffn(ks[0], edge_dim, node_dim, inter_dim, use_gate),
        "bond_ffn_right": init_bond_ffn(ks[1], edge_dim, node_dim, inter_dim, use_gate),
        "node_ffn_left": init_linear(ks[2], node_dim, edge_dim),
        "node_ffn_right": init_linear(ks[3], node_dim, edge_dim),
        "self_ffn": init_linear(ks[4], edge_dim, edge_dim),
        "ln": init_layernorm(edge_dim),
        "out": init_linear(ks[5], edge_dim, edge_dim),
    }


def edge_block(p, h_bond, h_node, bond_time, pair_mask,
               edge_pre: Optional[dict] = None, pallas_bwd: bool = False,
               edge_full: bool = False):
    """h_bond: [B,N,N,De] directed edge (i<-j is [b,i,j]); h_node: [B,N,Dn].

    Reference graph.py:268-295: edge<->edge interaction through shared
    endpoints. For edge e=(left=i, right=j):
      msg_left  = BondFFN(h_bond, h_node[left]);  T[k] = sum_{e: right=k} msg_left[e];
                  out[e] = T[left(e)]   -> dense: T = sum over axis1, out[i,j] = T[i]
      msg_right = BondFFN(h_bond, h_node[right]); U[k] = sum_{e: left=k} msg_right[e];
                  out[e] = U[right(e)]  -> dense: U = sum over axis2, out[i,j] = U[j]

    ``edge_pre``: precomputed bond-side first-layer products of ``h_bond``
    (bias-free) from :func:`fused_edge_products` — keys ``bond_left``,
    ``bond_right``, ``self_ffn`` and (gated) ``gate_left``, ``gate_right``.
    """
    dt = h_bond.dtype
    mask = pair_mask.astype(dt)[..., None]
    h_left = h_node[:, :, None, :]   # node at left/row index i
    h_right = h_node[:, None, :, :]  # node at right/col index j
    pre = edge_pre or {}

    if pallas_bwd and "gate" in p["bond_ffn_left"] and edge_pre is None \
            and edge_full:
        # FULL-EdgeBlock fused Pallas forward+backward: both chains +
        # reductions + the tail (node/self FFNs, LN, relu, out) in one
        # VMEM-resident kernel — the forward writes only the [B,N,N,De]
        # delta and the backward recomputes everything in VMEM
        # (ops/pallas_kernels.py, docs/PERFORMANCE.md train-MFU analysis)
        from ..ops.pallas_kernels import edge_block_tpu_full_bwd

        return edge_block_tpu_full_bwd(p, h_bond, h_node, bond_time,
                                       pair_mask)
    if pallas_bwd and "gate" in p["bond_ffn_left"] and edge_pre is None:
        # partial variant (edge_full=False): fused chains + reductions
        # only, XLA tail — kept for A/B measurement
        from ..ops.pallas_kernels import edge_pair_aggregate_tpu_fused_bwd

        t_pn, u_pn = edge_pair_aggregate_tpu_fused_bwd(
            {"left": p["bond_ffn_left"], "right": p["bond_ffn_right"]},
            h_bond, h_node, bond_time, pair_mask)
        h = (t_pn[:, :, None, :] + u_pn[:, None, :, :]
             + linear(p["node_ffn_left"], h_left)
             + linear(p["node_ffn_right"], h_right)
             + linear(p["self_ffn"], h_bond))
        h = layernorm(p["ln"], h)
        return linear(p["out"], jax.nn.relu(h))
    msg_left = bond_ffn(p["bond_ffn_left"], h_bond, h_left, bond_time,
                        bond_pre=pre.get("bond_left"),
                        gate_pre=pre.get("gate_left")) * mask
    t_per_node = jnp.sum(msg_left, axis=1, dtype=jnp.float32).astype(dt)
    msg_left_out = t_per_node[:, :, None, :]           # gather back by left index

    msg_right = bond_ffn(p["bond_ffn_right"], h_bond, h_right, bond_time,
                         bond_pre=pre.get("bond_right"),
                         gate_pre=pre.get("gate_right")) * mask
    u_per_node = jnp.sum(msg_right, axis=2, dtype=jnp.float32).astype(dt)
    msg_right_out = u_per_node[:, None, :, :]          # gather back by right index

    if "self_ffn" in pre:
        self_term = pre["self_ffn"] + p["self_ffn"]["b"]
    else:
        self_term = linear(p["self_ffn"], h_bond)
    h = (
        msg_left_out
        + msg_right_out
        + linear(p["node_ffn_left"], h_left)
        + linear(p["node_ffn_right"], h_right)
        + self_term
    )
    h = layernorm(p["ln"], h)
    return linear(p["out"], jax.nn.relu(h))


def fused_edge_products(blk, h_edge, update_edge: bool) -> dict:
    """All bond-side first-layer matmuls over the (pre-residual) edge tensor
    as ONE ``[*,De] @ [De, sum(widths)]`` matmul.

    NodeBlock's edge MLP + gate and EdgeBlock's two bond_linears, two gates
    and self_ffn each read the same ``h_edge`` [B,N,N,De]; concatenating
    their weight columns reads it once instead of up to seven times and
    replaces seven narrow matmuls with one wide MXU pass. Per output column
    the accumulation is identical to the separate matmuls (bias-free — each
    consumer adds its own bias exactly where it did before).

    MEASURED NEGATIVE on v5e (2026-08): the fused [B,N,N,896] intermediate
    forces materialization + non-128-aligned slices, and the e2e sampler ran
    ~2x SLOWER (18.9s vs 9.8s per 1000-step chain, B=128 N=32) than letting
    XLA fuse each narrow matmul into its consumer's epilogue. Kept (default
    OFF, `fuse_edge` static flag) as tested infrastructure / documentation
    of the result.
    """
    nb = blk["node_block"]
    de = h_edge.shape[-1]
    segs = [("nb_edge", nb["edge_net"]["layers"][0]["lin"]["w"])]
    if "gate" in nb:
        segs.append(("nb_gate", nb["gate"]["layers"][0]["lin"]["w"][:de]))
    if update_edge:
        eb = blk["edge_block"]
        segs.append(("self_ffn", eb["self_ffn"]["w"]))
        segs.append(("bond_left", eb["bond_ffn_left"]["bond_linear"]["w"]))
        segs.append(("bond_right", eb["bond_ffn_right"]["bond_linear"]["w"]))
        if "gate" in eb["bond_ffn_left"]:
            segs.append(("gate_left", eb["bond_ffn_left"]["gate"]["layers"][0]["lin"]["w"][:de]))
            segs.append(("gate_right", eb["bond_ffn_right"]["gate"]["layers"][0]["lin"]["w"][:de]))
    wcat = jnp.concatenate([w for _, w in segs], axis=1)
    fused = h_edge @ wcat
    out, off = {}, 0
    for name, w in segs:
        out[name] = fused[..., off:off + w.shape[1]]
        off += w.shape[1]
    return out


def init_pos_update(key, node_dim, edge_dim, hidden_dim, use_gate):
    ks = jax.random.split(key, 3)
    return {
        "left_lin_edge": init_mlp(ks[0], node_dim, edge_dim, hidden_dim),
        "right_lin_edge": init_mlp(ks[1], node_dim, edge_dim, hidden_dim),
        "edge_lin": init_bond_ffn(ks[2], edge_dim, edge_dim, node_dim, use_gate, out_dim=1),
    }


def pos_update(p, h_node, h_edge, rel_vec, distance, edge_time, pair_mask,
               fuse_edge: bool = False, pallas_bwd: bool = False):
    """E(3)-equivariant position delta (reference graph.py:384-396).

    rel_vec[b,i,j] = pos[i] - pos[j]; per-edge scalar weight * unit-ish vector,
    aggregated over senders j for each receiver i. With ``fuse_edge`` the
    bond_linear and gate first-layer products of ``h_edge`` run as one
    concatenated-weight matmul (one read of the [B,N,N,De] tensor).
    """
    if pallas_bwd and "gate" in p["edge_lin"] and not fuse_edge:
        # fused Pallas forward+backward: node MLPs, pairwise product, gated
        # BondFFN (interior width Dn — the widest pair chain) and the f32
        # force reduction all stay in VMEM (ops/pallas_kernels.py).
        from ..ops.pallas_kernels import pos_update_tpu_fused_bwd

        return pos_update_tpu_fused_bwd(p, h_node, h_edge, rel_vec,
                                        distance, edge_time, pair_mask)
    left_feat = mlp(p["left_lin_edge"], h_node)[:, :, None, :]
    right_feat = mlp(p["right_lin_edge"], h_node)[:, None, :, :]
    el = p["edge_lin"]
    bond_pre = gate_pre = None
    if fuse_edge and "gate" in el:
        de = h_edge.shape[-1]
        w_bond = el["bond_linear"]["w"]
        w_gate = el["gate"]["layers"][0]["lin"]["w"][:de]
        fused = h_edge @ jnp.concatenate([w_bond, w_gate], axis=1)
        bond_pre = fused[..., : w_bond.shape[1]]
        gate_pre = fused[..., w_bond.shape[1]:]
    weight = bond_ffn(el, h_edge, left_feat * right_feat, edge_time,
                      bond_pre=bond_pre, gate_pre=gate_pre)  # [B,N,N,1]

    # position force in float32 regardless of compute dtype
    d = distance[..., None]
    d_safe = jnp.where(pair_mask[..., None] > 0, d, 1.0)
    force = weight.astype(jnp.float32) * rel_vec / d_safe / (d_safe + 1.0)
    force = force * pair_mask.astype(jnp.float32)[..., None]
    return jnp.sum(force, axis=2)  # scatter_sum over left index i


# ---------------------------------------------------------------------------
# NodeEdgeNet
# ---------------------------------------------------------------------------

def denoiser_static_config(
    num_blocks: int,
    cutoff: float,
    use_gate: bool,
    update_edge: bool = True,
    update_pos: bool = True,
    num_gaussians: int = 16,
    start: float = 0.0,
    dtype: str = "float32",
    remat: bool = True,
    remat_policy: str = "none",
    use_pallas: bool = False,
    pallas_bwd: bool = False,
    # full-EdgeBlock kernel is a measured LOSS vs the partial kernel on
    # real v5e: 7.32 vs 8.33 steps/s (remat) and 7.97 vs 8.93 (remat off),
    # results/bench_train_{full,partial}_{remat,off}.log — default off
    edge_full: bool = False,
    fuse_block: bool = False,
    fuse_edge: bool = False,
    moe=None,
    **_unused,
) -> dict:
    """Static (non-trainable) architecture config; defaults mirror the
    reference kwargs handling (graph.py:308-327). ``dtype`` is the mixed-
    precision compute dtype for node/edge features ('float32' or
    'bfloat16'); positions, distances, LayerNorm statistics, and mask
    reductions always run in float32."""
    return {
        "num_blocks": num_blocks,
        "cutoff": float(cutoff),
        "use_gate": use_gate,
        "update_edge": update_edge,
        "update_pos": update_pos,
        "num_gaussians": num_gaussians,
        "start": float(start),
        "dtype": dtype,
        "remat": remat,
        "remat_policy": remat_policy,
        "use_pallas": use_pallas,
        # with use_pallas: route gradients through the FUSED Pallas backward
        # (ops/pallas_kernels.py:_node_block_bwd_kernel) instead of the
        # XLA-recompute vjp — the pair chain recomputes in VMEM per molecule
        "pallas_bwd": pallas_bwd,
        # with pallas_bwd: True routes EdgeBlock through the FULL fused
        # kernel (chains + reductions + tail); False keeps the round-3
        # partial kernel (fused chains, XLA tail) for A/B
        "edge_full": edge_full,
        "fuse_block": fuse_block,
        "fuse_edge": fuse_edge,
        # optional mixture-of-experts node MLP (models/moe.py); None keeps
        # the reference-exact dense MLP. Dict: {num_experts, top_k,
        # capacity_factor, aux_weight}.
        "moe": normalize_moe_cfg(moe),
    }


def init_node_edge_net(key, node_dim: int, edge_dim: int, **denoiser_cfg):
    """Reference graph.py:298-346. Returns (params, static_config).

    The per-block params are STACKED along a leading ``num_blocks`` axis so
    the forward pass is a single ``lax.scan`` over blocks — one compiled
    block body instead of ``num_blocks`` inlined copies, which cuts XLA
    compile time ~num_blocks-fold for the 1000-step sampler scan.
    """
    static = denoiser_static_config(**denoiser_cfg)
    num_blocks = static["num_blocks"]
    use_gate = static["use_gate"]
    update_edge, update_pos = static["update_edge"], static["update_pos"]
    num_gaussians = static["num_gaussians"]
    input_edge_dim = edge_dim + num_gaussians if update_edge else num_gaussians
    blocks = []
    for bk in jax.random.split(key, num_blocks):
        ks = jax.random.split(bk, 4)
        blk = {
            "node_block": init_node_block(ks[0], node_dim, edge_dim, node_dim,
                                          use_gate, moe=static["moe"]),
            "edge_emb": init_linear(ks[1], input_edge_dim, edge_dim),
        }
        if update_edge:
            blk["edge_block"] = init_edge_block(ks[2], edge_dim, node_dim, use_gate)
        if update_pos:
            blk["pos_block"] = init_pos_update(ks[3], node_dim, edge_dim, edge_dim, use_gate)
        blocks.append(blk)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {"blocks": stacked}, static


def dist_features(pos_node, static, compute_dtype, pair_sharding=None):
    """(smeared distances, rel vectors, distances) for a position tensor.

    Reference graph.py:351-357 (distance recompute + Gaussian smearing)."""
    smearing = GaussianSmearing(
        start=static["start"], stop=static["cutoff"],
        num_gaussians=static["num_gaussians"], type_="exp",
    )
    rel = pos_node[:, :, None, :] - pos_node[:, None, :, :]
    dist = safe_distance(rel)
    h_dist = smearing(dist).astype(compute_dtype)
    if pair_sharding is not None:
        h_dist = jax.lax.with_sharding_constraint(h_dist, pair_sharding)
    return h_dist, rel, dist


def apply_block(
    blk,
    static,
    h_node: jnp.ndarray,     # [B, N, Dn] (compute dtype)
    pos_node: jnp.ndarray,   # [B, N, 3] float32
    h_edge: jnp.ndarray,     # [B, N, N, De] (compute dtype)
    node_time: jnp.ndarray,  # [B, 1, 1]
    edge_time: jnp.ndarray,  # [B, 1, 1]
    pair_mask: jnp.ndarray,  # [B, N, N]
    dist0=None,              # precomputed (h_dist, rel, dist) when positions
                             # are frozen (update_pos=False)
    pair_sharding=None,
    node_mask=None,          # [B, N]; required when static['moe'] is set
):
    """ONE NodeEdgeNet block (the loop body of reference graph.py:348-367):
    edge embed -> NodeBlock -> EdgeBlock -> PosUpdate, all residual.

    Module-level so both the sequential scan (:func:`node_edge_net`) and the
    pipeline-parallel executor (parallel/pipeline.py) share the exact same
    math. Inputs must already be in the compute dtype (the callers cast).
    Returns ``(h_node, pos_node, h_edge)`` — plus a trailing ``moe_aux``
    scalar when ``static['moe']`` is set.
    """
    update_edge = static["update_edge"]
    update_pos = static["update_pos"]

    def constrain(arr):
        if pair_sharding is not None and arr.ndim >= 3:
            return jax.lax.with_sharding_constraint(arr, pair_sharding)
        return arr

    if update_pos or dist0 is None:
        h_dist, rel_vec, distance = dist_features(
            pos_node, static, h_edge.dtype, pair_sharding
        )
    else:
        h_dist, rel_vec, distance = dist0

    # whole-block fused Pallas kernel (TPU): edge_emb + NodeBlock +
    # EdgeBlock + PosUpdate per molecule group, intermediates in VMEM
    fuse_block = (
        static.get("fuse_block", False)
        and update_edge and update_pos and static["use_gate"]
        and pair_sharding is None
        and static.get("moe") is None  # kernel inlines the dense node MLP
    )
    if fuse_block:
        from ..ops.pallas_kernels import fused_block_tpu

        h_node, h_edge_i, pos_delta = fused_block_tpu(
            blk, h_node, h_edge, h_dist, rel_vec, distance,
            node_time, pair_mask,
        )
        return h_node, pos_node + pos_delta, h_edge_i

    if update_edge:
        # implicit concat [h_edge ‖ h_dist] (both O(N^2); split matmul
        # just avoids materializing the concat copy)
        h_edge_i = constrain(linear_parts(
            blk["edge_emb"], (h_edge, h_dist),
            (h_edge.shape[-1], h_dist.shape[-1]),
        ))
    else:
        h_edge_i = constrain(linear(blk["edge_emb"], h_dist))

    use_pallas = static.get("use_pallas", False) and pair_sharding is None
    fuse_edge = (
        static.get("fuse_edge", False)
        and not use_pallas
        and pair_sharding is None
    )
    if fuse_edge:
        pre = fused_edge_products(blk, h_edge_i, update_edge)
        node_pre = {"edge_net": pre["nb_edge"]}
        if "nb_gate" in pre:
            node_pre["gate"] = pre["nb_gate"]
    else:
        pre, node_pre = {}, None

    moe_cfg = static.get("moe")
    h_node_delta = node_block(
        blk["node_block"], h_node, h_edge_i, node_time, pair_mask,
        # pallas kernel and GSPMD pair-sharding are mutually exclusive
        use_pallas=use_pallas and moe_cfg is None,
        edge_pre=node_pre,
        node_mask=node_mask, moe_cfg=moe_cfg,
        pallas_bwd=static.get("pallas_bwd", False),
    )
    moe_aux = None
    if moe_cfg is not None:
        h_node_delta, moe_aux = h_node_delta
    if update_edge:
        h_edge_i = h_edge_i + edge_block(
            blk["edge_block"], h_edge_i, h_node, edge_time, pair_mask,
            edge_pre=pre if fuse_edge else None,
            pallas_bwd=use_pallas and static.get("pallas_bwd", False),
            edge_full=static.get("edge_full", False),
        )
    h_node = h_node + h_node_delta
    if update_pos:
        pos_node = pos_node + pos_update(
            blk["pos_block"], h_node, h_edge_i, rel_vec, distance,
            edge_time, pair_mask,
            fuse_edge=fuse_edge,
            pallas_bwd=use_pallas and static.get("pallas_bwd", False),
        )
    if moe_cfg is not None:
        return h_node, pos_node, h_edge_i, moe_aux
    return h_node, pos_node, h_edge_i


def node_edge_net(
    params,
    static,
    h_node: jnp.ndarray,     # [B, N, Dn]
    pos_node: jnp.ndarray,   # [B, N, 3]
    h_edge: jnp.ndarray,     # [B, N, N, De]
    node_time: jnp.ndarray,  # [B, 1, 1]  (t / T per graph)
    edge_time: jnp.ndarray,  # [B, 1, 1]
    pair_mask: jnp.ndarray,  # [B, N, N] float (1 = real directed edge)
    remat: "bool | None" = None,  # None -> static['remat']; only needed
                                  # under autodiff (training); disable for
                                  # forward-only sampling to cut compile time
    pair_sharding=None,           # NamedSharding hint for [B,N,N,H] pair
                                  # tensors (parallel.mesh.pair_sharding);
                                  # GSPMD inserts the cross-shard reductions
    node_mask=None,               # [B, N]; required when static['moe'] set
):
    """Forward pass; returns (h_node, pos_node, h_edge), plus a trailing
    ``moe_aux`` load-balance scalar (mean over blocks) when
    ``static['moe']`` is set.

    Reference graph.py:348-367, as ONE ``lax.scan`` over the stacked block
    params (compile-time: one block body, not num_blocks inlined copies),
    with jax.checkpoint per block to bound activation memory of the O(N^2)
    edge tensors under autodiff.
    """
    update_pos = static["update_pos"]
    compute_dtype = jnp.dtype(static.get("dtype", "float32"))
    in_dtype = h_node.dtype

    if compute_dtype != in_dtype:
        cast = lambda x: x.astype(compute_dtype) if x.dtype == in_dtype else x
        h_node = h_node.astype(compute_dtype)
        h_edge = h_edge.astype(compute_dtype)
        params = jax.tree.map(cast, params)

    # distances are recomputed per block only when positions move
    # (reference graph.py:351-357); otherwise computed once up front.
    dist0 = (None if update_pos else
             dist_features(pos_node, static, compute_dtype, pair_sharding))

    moe_on = static.get("moe") is not None

    def block_fn(carry, blk):
        h_node, pos_node, h_edge = carry
        out = apply_block(
            blk, static, h_node, pos_node, h_edge,
            node_time, edge_time, pair_mask,
            dist0=dist0, pair_sharding=pair_sharding, node_mask=node_mask,
        )
        if moe_on:
            return out[:3], out[3]
        return out, None

    if remat is None:
        remat = static.get("remat", True)
    if remat:
        # remat_policy trades the full-recompute backward (policy 'none',
        # lowest memory, ~4/3x forward FLOPs) against saving matmul outputs
        # ('dots': XLA keeps dot results, recomputes only cheap elementwise
        # ops — near no-remat speed at a fraction of no-remat memory)
        policy = {
            "none": None,
            "dots": jax.checkpoint_policies.checkpoint_dots,
            "dots_no_batch": jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
        }[static.get("remat_policy", "none")]
        block_fn = jax.checkpoint(block_fn, static_argnums=(), policy=policy)

    (h_node, pos_node, h_edge), aux_ys = jax.lax.scan(
        block_fn, (h_node, pos_node, h_edge), params["blocks"]
    )
    if moe_on:
        return (h_node.astype(in_dtype), pos_node,
                h_edge.astype(in_dtype), jnp.mean(aux_ys))
    return h_node.astype(in_dtype), pos_node, h_edge.astype(in_dtype)
