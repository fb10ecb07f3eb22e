"""Minimal functional NN building blocks on plain pytree params.

Design: params are nested dicts of jnp arrays; every module is an
``init_*(key, ...) -> params`` plus a pure ``apply`` function. No module
framework — everything is explicitly jit/pjit/shard-friendly and params map
1:1 onto checkpoint trees.

Initialization follows torch ``nn.Linear`` defaults
(U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias) so training
dynamics are comparable to the reference (/root/reference/models/common.py:181).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def init_linear(key: jax.Array, din: int, dout: int, bias: bool = True) -> dict:
    bound = 1.0 / math.sqrt(din)
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (din, dout), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (dout,), jnp.float32, -bound, bound)
    return p


def linear(p: dict, x: jnp.ndarray, *, dtype=None) -> jnp.ndarray:
    w = p["w"].astype(dtype) if dtype is not None else p["w"]
    y = x @ w
    if "b" in p:
        b = p["b"].astype(y.dtype) if dtype is not None else p["b"]
        y = y + b
    return y


def linear_parts(p: dict, parts, sizes, pre: jnp.ndarray | None = None) -> jnp.ndarray:
    """Linear over an implicit ``concat(parts, axis=-1)`` WITHOUT materializing
    the concat: ``concat(parts) @ W == sum_i parts[i] @ W[rows_i]``.

    Each part is matmul'd at its own (possibly broadcast-reduced) shape and
    the results broadcast-added, so a part that is constant along a pair axis
    (e.g. node features broadcast over the O(N^2) edge grid, or a per-graph
    time scalar) costs O(N) / O(1) FLOPs instead of O(N^2). Exact same math
    as the concat (per-part summation order differs only in float rounding).

    ``sizes[i]`` = feature width of ``parts[i]``; must sum to W's fan-in.

    ``pre``: precomputed leading contribution (already multiplied by its W
    rows, no bias) — used by the denoiser's fused edge-side matmul, where the
    first part's product comes out of one big concatenated-weight matmul.
    When given, the leading ``len(pre_sizes) = len(sizes) - len(parts)``
    weight rows are skipped.
    """
    w = p["w"]
    assert sum(sizes) == w.shape[0], (sizes, w.shape)
    y = pre
    off = sum(sizes[: len(sizes) - len(parts)])
    for x, sz in zip(parts, sizes[len(sizes) - len(parts):]):
        term = x @ w[off:off + sz]
        y = term if y is None else y + term
        off += sz
    if "b" in p:
        y = y + p["b"]
    return y


def mlp_parts(p: dict, parts, sizes, pre: jnp.ndarray | None = None) -> jnp.ndarray:
    """``mlp`` whose first Linear runs via :func:`linear_parts` (implicit
    concat of ``parts``, optional precomputed ``pre`` contribution). Layers
    after the first are unchanged."""
    first = p["layers"][0]
    x = linear_parts(first["lin"], parts, sizes, pre=pre)
    if "ln" in first:
        x = jax.nn.relu(layernorm(first["ln"], x))
    for lp in p["layers"][1:]:
        x = linear(lp["lin"], x)
        if "ln" in lp:
            x = jax.nn.relu(layernorm(lp["ln"], x))
    return x


def init_layernorm(dim: int) -> dict:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layernorm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # Normalize in float32 for stability regardless of compute dtype.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def init_mlp(
    key: jax.Array,
    din: int,
    dout: int,
    hidden: int,
    num_layer: int = 2,
    norm: bool = True,
    act_last: bool = False,
) -> dict:
    """2-layer MLP with LayerNorm+ReLU between layers.

    Mirrors reference ``MLP`` (models/common.py:181-201): Linear(in,h) ->
    [LN, ReLU] -> ... -> Linear(h,out), with optional trailing LN+act.
    """
    keys = jax.random.split(key, num_layer)
    layers = []
    for i in range(num_layer):
        d_in = din if i == 0 else hidden
        d_out = dout if i == num_layer - 1 else hidden
        lp = {"lin": init_linear(keys[i], d_in, d_out)}
        # LN presence encodes "normalize + activate after this layer" so the
        # param pytree stays bool-free (jittable / checkpointable).
        if (i < num_layer - 1 or act_last) and norm:
            lp["ln"] = init_layernorm(d_out)
        layers.append(lp)
    return {"layers": layers}


def mlp(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    for lp in p["layers"]:
        x = linear(lp["lin"], x)
        if "ln" in lp:
            x = jax.nn.relu(layernorm(lp["ln"], x))
    return x


class GaussianSmearing:
    """RBF expansion of scalars (distances or timesteps).

    Matches reference models/common.py:216-237: offsets are exp-spaced
    ('exp') or linear ('linear'); per-offset widths derive from consecutive
    offset differences; inputs are clamped to [start, stop].
    Constants only — not trainable params.
    """

    def __init__(self, start: float = 0.0, stop: float = 10.0, num_gaussians: int = 50,
                 type_: str = "exp"):
        self.start = float(start)
        self.stop = float(stop)
        if type_ == "exp":
            offset = np.exp(np.linspace(np.log(start + 1), np.log(stop + 1), num_gaussians)) - 1
        elif type_ == "linear":
            offset = np.linspace(start, stop, num_gaussians)
        else:
            raise NotImplementedError("type_ must be either exp or linear")
        diff = np.diff(offset)
        diff = np.concatenate([diff[:1], diff])
        self.offset = jnp.asarray(offset, dtype=jnp.float32)
        self.coeff = jnp.asarray(-0.5 / diff**2, dtype=jnp.float32)

    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        """dist [...] -> [..., num_gaussians]."""
        d = jnp.clip(dist, self.start, self.stop)
        delta = d[..., None] - self.offset
        return jnp.exp(self.coeff * delta**2)


def safe_distance(rel_vec: jnp.ndarray) -> jnp.ndarray:
    """Norm over the last axis with zero (not NaN) gradient at zero input.

    Needed because the dense pair layout includes i==j diagonal entries with
    rel_vec == 0; sqrt'(0) = inf would otherwise poison masked gradients.
    """
    sq = jnp.sum(rel_vec**2, axis=-1)
    positive = sq > 0
    sq_safe = jnp.where(positive, sq, 1.0)
    return jnp.where(positive, jnp.sqrt(sq_safe), 0.0)
