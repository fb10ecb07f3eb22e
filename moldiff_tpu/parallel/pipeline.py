"""GPipe-style pipeline parallelism over the denoiser's stacked blocks.

The reference is single-device (SURVEY.md section 2.3); this is a framework
addition for scale-out. The NodeEdgeNet stores its per-block params STACKED
along a leading ``num_blocks`` axis (models/denoiser.py:init_node_edge_net),
which is exactly the layout pipeline parallelism wants: shard that axis over
a 'pipe' mesh axis so each device holds ``num_blocks / P`` contiguous blocks,
then stream microbatches through the stages with ``jax.lax.ppermute`` — the
classic GPipe schedule, expressed as a ``jax.shard_map`` whose inner loop is
a ``lax.scan`` over pipeline ticks:

  tick t:  stage 0 injects microbatch t (while t < M);
           every stage runs its local blocks on its in-flight microbatch;
           the last stage emits the finished microbatch t-(P-1);
           all stages ppermute their carry to the next stage over ICI.

Total ticks = M + P - 1 (M microbatches, P stages); bubble fraction
(P-1)/(M+P-1) shrinks as M grows. Everything is reverse-differentiable
(scan + ppermute + psum all have transpose rules), so the same executor
serves training: the block params' gradients come out 'pipe'-sharded, giving
true per-stage parameter/optimizer memory scaling.

At MolDiff's ~5.5M params pipeline parallelism is capability breadth (DP is
the profitable axis at this scale); the mechanism is what transfers to
deeper models.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def make_mesh_pipe(n_data: int, n_pipe: int, devices=None) -> Mesh:
    """2-D mesh ('data', 'pipe'): batch over 'data', denoiser block (layer)
    axis over 'pipe' (pipeline parallelism)."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[: n_data * n_pipe]).reshape(n_data, n_pipe)
    return Mesh(devices, (DATA_AXIS, PIPE_AXIS))


def pipe_enabled(mesh: Mesh) -> bool:
    return PIPE_AXIS in mesh.axis_names and mesh.shape[PIPE_AXIS] > 1


def pipe_param_sharding(mesh: Mesh, tree):
    """Placement pytree for pipeline parallelism: every array leaf inside a
    ``{"blocks": ...}`` subtree (the denoiser's stacked per-block params —
    models/denoiser.py:init_node_edge_net) is sharded on its leading
    (num_blocks) axis over 'pipe'; every other leaf is replicated.

    Works on any pytree embedding param subtrees (params, EMA copies, optax
    moment states), same contract as mesh.py:tp_param_sharding.
    """
    rep = NamedSharding(mesh, P())
    n_pipe = mesh.shape[PIPE_AXIS] if PIPE_AXIS in mesh.axis_names else 1

    def shard_blocks(node):
        def leaf(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n_pipe == 0:
                return NamedSharding(mesh, P(PIPE_AXIS))
            return rep

        return jax.tree.map(leaf, node)

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                out[k] = shard_blocks(v) if k == "blocks" and n_pipe > 1 else walk(v)
            return out
        if hasattr(node, "_fields"):  # NamedTuple (optax states)
            return type(node)(*(walk(v) for v in node))
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        if node is None:
            return None
        return rep

    return walk(tree)


def _choose_microbatches(batch_local: int, requested: int | None, n_pipe: int) -> int:
    """Largest divisor of the per-data-shard batch <= requested (default P,
    the canonical GPipe choice). Shapes are static under jit, so this runs
    at trace time."""
    target = requested if requested else n_pipe
    m = max(1, min(int(target), batch_local))
    while batch_local % m != 0:
        m -= 1
    return m


def pipeline_denoiser(
    params: dict,
    static: dict,
    h_node: jnp.ndarray,     # [B, N, Dn]
    pos_node: jnp.ndarray,   # [B, N, 3]
    h_edge: jnp.ndarray,     # [B, N, N, De]
    node_time: jnp.ndarray,  # [B, 1, 1]
    edge_time: jnp.ndarray,  # [B, 1, 1]
    pair_mask: jnp.ndarray,  # [B, N, N]
    mesh: Mesh,
    num_microbatches: int | None = None,
    remat: "bool | None" = None,
):
    """Pipeline-parallel NodeEdgeNet forward; numerically identical to
    models/denoiser.py:node_edge_net (tests/test_pipeline_parallel.py).

    ``params`` is the denoiser tree ``{"blocks": stacked}``; the mesh must
    carry ('data', 'pipe') axes with num_blocks % pipe == 0. The batch is
    sharded over 'data' and split into microbatches inside each data shard.
    """
    from ..models.denoiser import apply_block

    if static.get("moe") is not None:
        raise ValueError(
            "pipeline parallelism does not support MoE denoisers (the "
            "tick loop carries no aux scalar); use the 'expert' mesh axis"
        )
    assert PIPE_AXIS in mesh.axis_names, "mesh has no 'pipe' axis"
    n_pipe = mesh.shape[PIPE_AXIS]
    blocks = params["blocks"]
    num_blocks = jax.tree.leaves(blocks)[0].shape[0]
    assert num_blocks % n_pipe == 0, (
        f"num_blocks={num_blocks} not divisible by pipe={n_pipe}"
    )

    compute_dtype = jnp.dtype(static.get("dtype", "float32"))
    in_dtype = h_node.dtype
    if compute_dtype != in_dtype:
        cast = lambda x: x.astype(compute_dtype) if x.dtype == in_dtype else x
        h_node = h_node.astype(compute_dtype)
        h_edge = h_edge.astype(compute_dtype)
        blocks = jax.tree.map(cast, blocks)

    n_data = mesh.shape.get(DATA_AXIS, 1)
    batch = h_node.shape[0]
    assert batch % n_data == 0, f"batch={batch} not divisible by data={n_data}"
    n_micro = _choose_microbatches(batch // n_data, num_microbatches, n_pipe)
    if remat is None:
        remat = static.get("remat", True)

    def body(blocks, h_node, pos_node, h_edge, node_time, edge_time, pair_mask):
        # local shapes: blocks [num_blocks/P, ...]; arrays [b_local, ...]
        stage = jax.lax.axis_index(PIPE_AXIS)
        b_local = h_node.shape[0]
        mb = b_local // n_micro

        split = lambda x: x.reshape((n_micro, mb) + x.shape[1:])
        ticks = n_micro + n_pipe - 1
        # pad the microbatch stream with P-1 dummy entries so one scan xs
        # covers every tick (dummies are never injected: inject flag is off)
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros((n_pipe - 1,) + x.shape[1:], x.dtype)], axis=0
        )
        stream = jax.tree.map(
            lambda x: pad(split(x)),
            (h_node, pos_node, h_edge, node_time, edge_time, pair_mask),
        )
        state = jax.tree.map(lambda x: jnp.zeros_like(x[0]), stream)

        def run_local_blocks(state):
            h_n, pos, h_e, nt, et, pm = state

            def blk_fn(carry, blk):
                out = apply_block(blk, static, *carry, nt, et, pm)
                return out, None

            if remat:
                blk_fn = jax.checkpoint(blk_fn)
            (h_n, pos, h_e), _ = jax.lax.scan(blk_fn, (h_n, pos, h_e), blocks)
            return (h_n, pos, h_e, nt, et, pm)

        def tick(state, xs):
            fresh, injecting = xs
            take_fresh = jnp.logical_and(stage == 0, injecting)
            state = jax.tree.map(
                lambda f, c: jnp.where(take_fresh, f, c), fresh, state
            )
            state = run_local_blocks(state)
            emit = state
            # hand the carry to the next stage; stage 0 receives zeros,
            # which the inject select overwrites while microbatches remain
            perm = [(i, i + 1) for i in range(n_pipe - 1)]
            state = jax.tree.map(
                lambda x: jax.lax.ppermute(x, PIPE_AXIS, perm), state
            )
            return state, emit

        injecting = jnp.arange(ticks) < n_micro
        _, emitted = jax.lax.scan(tick, state, (stream, injecting))
        # the last stage finished microbatch m at tick m + P - 1; every
        # other stage's emissions are partial — zero them and psum so the
        # result is replicated over 'pipe'
        is_last = stage == n_pipe - 1
        out = jax.tree.map(
            lambda y: jax.lax.psum(
                jnp.where(is_last, y[n_pipe - 1:], jnp.zeros_like(y[n_pipe - 1:])),
                PIPE_AXIS,
            ),
            emitted,
        )
        h_n, pos, h_e = out[0], out[1], out[2]
        unsplit = lambda x: x.reshape((b_local,) + x.shape[2:])
        return unsplit(h_n), unsplit(pos), unsplit(h_e)

    data_spec = P(DATA_AXIS)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(PIPE_AXIS),) + (data_spec,) * 6,
        out_specs=(data_spec,) * 3,
        check_vma=False,
    )
    h_node, pos_node, h_edge = fn(
        blocks, h_node, pos_node, h_edge, node_time, edge_time, pair_mask
    )
    return h_node.astype(in_dtype), pos_node, h_edge.astype(in_dtype)
