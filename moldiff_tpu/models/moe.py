"""Mixture-of-Experts MLP with token-choice routing (framework addition).

The reference network is dense (no MoE anywhere in /root/reference); this
module exists to give the framework a real expert-parallel (EP) axis: the
NodeBlock's per-atom MLP can be swapped for a routed expert bank via
``model.denoiser.moe: {num_experts: E, ...}`` (off by default — reference
configs are untouched and reference-exact).

TPU-first design — the GShard/Switch dense-dispatch pattern, not a
scatter/gather translation:

  * routing, ranking, and capacity masks are fixed-shape one-hot tensors;
  * dispatch/combine are einsums (``[S,E,C] x [S,D] -> [E,C,D]``), which the
    MXU executes directly and GSPMD shards over an 'expert' mesh axis when
    the expert-stacked weights are sharded there
    (parallel/mesh.py:ep_param_sharding) — the all-to-all falls out of the
    einsum sharding, no hand-written collectives;
  * every shape is static: capacity C derives from token count and
    ``capacity_factor`` at trace time.

Padded atoms are excluded from routing (their gate and dispatch are zero and
they never consume expert capacity), preserving the repo-wide padding
invariant: masked elements contribute exactly zero to every reduction.
Over-capacity tokens are dropped (zero delta); the NodeBlock's residual
connection carries them through unchanged.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .nn import init_linear, init_mlp, mlp


def normalize_moe_cfg(moe) -> "dict | None":
    """Normalize a config ``moe:`` block to a plain dict with defaults."""
    if not moe:
        return None
    get = moe.get if hasattr(moe, "get") else lambda k, d=None: d
    cfg = {
        "num_experts": int(get("num_experts", 4)),
        "top_k": int(get("top_k", 1)),
        "capacity_factor": float(get("capacity_factor", 1.25)),
        "aux_weight": float(get("aux_weight", 0.01)),
    }
    if cfg["top_k"] not in (1, 2):
        raise ValueError(f"moe.top_k must be 1 or 2, got {cfg['top_k']}")
    if cfg["num_experts"] < 2:
        raise ValueError("moe.num_experts must be >= 2")
    return cfg


def init_moe_mlp(key, din: int, dout: int, hidden: int, num_experts: int) -> dict:
    """Expert bank replacing one ``init_mlp``: a bias-free router Linear
    (din -> E) plus E independently-initialized expert MLPs stacked on a
    leading expert axis (so the per-expert apply is one vmap and EP sharding
    is a leading-dim partition)."""
    k_router, k_experts = jax.random.split(key)
    experts = [
        init_mlp(k, din, dout, hidden)
        for k in jax.random.split(k_experts, num_experts)
    ]
    return {
        "router": init_linear(k_router, din, num_experts, bias=False),
        "experts": jax.tree.map(lambda *xs: jnp.stack(xs), *experts),
    }


def moe_mlp(p: dict, x: jnp.ndarray, node_mask: jnp.ndarray, cfg: dict):
    """Routed expert MLP. x: [B, N, D]; node_mask: [B, N] (1 = real atom).

    Returns ``(y [B, N, dout], aux)`` where ``aux`` is the Switch
    load-balance loss E * sum_e f_e * P_e (f_e = fraction of real tokens
    whose FIRST choice is expert e, P_e = mean router probability) — 1.0 at
    perfect balance.
    """
    b, n, d = x.shape
    s = b * n
    num_experts = p["router"]["w"].shape[-1]
    top_k = cfg["top_k"]
    capacity = max(
        1, int(math.ceil(cfg["capacity_factor"] * top_k * s / num_experts))
    )

    tokens = x.reshape(s, d)
    mask = node_mask.reshape(s).astype(jnp.float32)

    # routing in float32 regardless of compute dtype
    logits = tokens.astype(jnp.float32) @ p["router"]["w"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)  # [S, E]

    idx1 = jnp.argmax(probs, axis=-1)
    sel1 = jax.nn.one_hot(idx1, num_experts, dtype=jnp.float32) * mask[:, None]
    gate1 = jnp.sum(probs * sel1, axis=-1)

    sels, gates = [sel1], [gate1]
    if top_k == 2:
        probs2 = probs * (
            1.0 - jax.nn.one_hot(idx1, num_experts, dtype=jnp.float32)
        )
        idx2 = jnp.argmax(probs2, axis=-1)
        sel2 = (
            jax.nn.one_hot(idx2, num_experts, dtype=jnp.float32) * mask[:, None]
        )
        gate2 = jnp.sum(probs * sel2, axis=-1)
        denom = gate1 + gate2 + 1e-9
        gates = [gate1 / denom, gate2 / denom]
        sels = [sel1, sel2]

    # capacity ranking: first choices take priority over second choices
    # (GShard semantics); over-capacity tokens are dropped.
    dispatch = jnp.zeros((s, num_experts, capacity), jnp.float32)
    combine = jnp.zeros((s, num_experts, capacity), jnp.float32)
    offset = jnp.zeros((num_experts,), jnp.float32)
    for sel, gate in zip(sels, gates):
        position = jnp.cumsum(sel, axis=0) - 1.0 + offset[None, :]
        offset = offset + jnp.sum(sel, axis=0)
        pos_int = jnp.sum(position * sel, axis=-1).astype(jnp.int32)  # [S]
        within = jax.nn.one_hot(pos_int, capacity, dtype=jnp.float32)
        keep = (pos_int < capacity).astype(jnp.float32)
        d_k = sel[:, :, None] * within[:, None, :] * keep[:, None, None]
        dispatch = dispatch + d_k
        combine = combine + d_k * gate[:, None, None]

    dt = x.dtype
    expert_in = jnp.einsum(
        "sec,sd->ecd", dispatch.astype(dt), tokens
    )  # [E, C, D]
    expert_out = jax.vmap(mlp)(p["experts"], expert_in)  # [E, C, dout]
    y = jnp.einsum("sec,ech->sh", combine.astype(dt), expert_out)

    # Switch load-balance loss over REAL tokens only
    n_real = jnp.maximum(jnp.sum(mask), 1.0)
    f = jnp.sum(sel1, axis=0) / n_real
    pbar = jnp.sum(probs * mask[:, None], axis=0) / n_real
    aux = num_experts * jnp.sum(f * pbar)

    return y.reshape(b, n, -1), aux
