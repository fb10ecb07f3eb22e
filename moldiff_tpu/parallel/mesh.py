"""Device mesh + sharding helpers for data-parallel training/sampling.

The reference is single-device (`SURVEY.md` section 2.3); here every jitted
step runs under a `jax.sharding.Mesh` with the batch dimension sharded over
the 'data' axis and params replicated. XLA inserts the grad all-reduce over
ICI automatically — no hand-written collectives on the train path.

Multi-host entry (`initialize_distributed`) wires `jax.distributed` for pod
slices; on a single host it is a no-op.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GRAPH_AXIS = "graph"  # shards the O(N^2) pair tensors' receiver axis
MODEL_AXIS = "model"  # tensor parallelism: shards MLP hidden dims
EXPERT_AXIS = "expert"  # expert parallelism: shards MoE expert banks


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host (DCN) init; no-op in single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def make_mesh_2d(n_data: int, n_graph: int, devices=None) -> Mesh:
    """2-D mesh ('data', 'graph'): batch sharded over 'data', the dense
    [B, N, N, H] pair tensors' receiver axis sharded over 'graph' — the
    within-graph scaling axis (SURVEY.md section 2.3: the analogue of
    sequence/context parallelism for the O(N^2) edge dimension)."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[: n_data * n_graph]).reshape(n_data, n_graph)
    return Mesh(devices, (DATA_AXIS, GRAPH_AXIS))


def make_mesh_3d(n_data: int, n_graph: int, n_model: int, devices=None) -> Mesh:
    """3-D mesh ('data', 'graph', 'model'): batch over 'data', pair-tensor
    receiver axis over 'graph', and MLP hidden dims over 'model' (tensor
    parallelism — see :func:`tp_param_sharding`)."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[: n_data * n_graph * n_model]).reshape(
        n_data, n_graph, n_model
    )
    return Mesh(devices, (DATA_AXIS, GRAPH_AXIS, MODEL_AXIS))


def tp_enabled(mesh: Mesh) -> bool:
    return MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1


def make_mesh_expert(n_data: int, n_expert: int, devices=None) -> Mesh:
    """2-D mesh ('data', 'expert'): batch sharded over 'data', MoE expert
    banks sharded over 'expert' (:func:`ep_param_sharding`). The GShard
    dispatch/combine einsums (models/moe.py) pick up the expert sharding
    through GSPMD propagation — the token all-to-all falls out of the
    einsum partitioning."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[: n_data * n_expert]).reshape(n_data, n_expert)
    return Mesh(devices, (DATA_AXIS, EXPERT_AXIS))


def ep_enabled(mesh: Mesh) -> bool:
    return EXPERT_AXIS in mesh.axis_names and mesh.shape[EXPERT_AXIS] > 1


def ep_param_sharding(mesh: Mesh, tree):
    """Expert-parallel sharding pytree: every leaf under an expert bank's
    ``experts`` subtree (models/moe.py:init_moe_mlp — a dict holding both
    ``router`` and ``experts``) is sharded over the 'expert' axis on its
    expert dimension; routers and all non-MoE leaves stay replicated.

    Expert leaves carry the expert count E at dim 0 as initialized and at
    dim 1 once the denoiser stacks blocks ([num_blocks, E, ...]); the
    walker reads E from the sibling router's fan-out and shards the last
    matching leading dim. Works on params, grads, optax moments and EMA
    alike (same contract as :func:`tp_param_sharding`).
    """
    rep = NamedSharding(mesh, P())
    n_exp = mesh.shape[EXPERT_AXIS] if EXPERT_AXIS in mesh.axis_names else 1

    def shard_expert_leaf(leaf, num_experts):
        if n_exp <= 1 or num_experts % n_exp != 0:
            return rep
        if not hasattr(leaf, "ndim") or leaf.ndim < 1:
            return rep
        dims = [d for d in range(min(2, leaf.ndim))
                if leaf.shape[d] == num_experts]
        if not dims:
            return rep
        spec = [None] * leaf.ndim
        spec[dims[-1]] = EXPERT_AXIS
        return NamedSharding(mesh, P(*spec))

    def all_rep(node):
        return jax.tree.map(lambda _: rep, node)

    def walk(node):
        if isinstance(node, dict):
            if "router" in node and "experts" in node:
                num_experts = node["router"]["w"].shape[-1]
                out = {k: walk(v) for k, v in node.items()
                       if k not in ("router", "experts")}
                out["router"] = all_rep(node["router"])
                out["experts"] = jax.tree.map(
                    lambda leaf: shard_expert_leaf(leaf, num_experts),
                    node["experts"],
                )
                return out
            return {k: walk(v) for k, v in node.items()}
        if hasattr(node, "_fields"):  # NamedTuple (optax states)
            return type(node)(*(walk(v) for v in node))
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        if node is None:
            return None
        return rep

    return walk(tree)


def make_mesh_from_config(parallel_cfg, devices=None) -> Mesh:
    """Mesh from a config ``parallel:`` block.

    Keys (all optional): ``num_devices`` (total; null = all visible),
    ``graph`` (within-graph axis size, default 1), ``model`` (tensor-
    parallel axis size, default 1), ``pipe`` (pipeline-parallel axis size,
    default 1; exclusive with graph/model), ``expert`` (expert-parallel
    axis size, default 1; exclusive with the other axes). The data axis
    takes the rest: ``data = num_devices // (graph * model * pipe *
    expert)``. A ``fsdp: true`` key does not change the mesh — it makes
    the Trainer shard params/moments over 'data' at rest
    (:func:`fsdp_param_sharding`); the CLIs pass it to ``Trainer(fsdp=...)``.
    """
    cfg = parallel_cfg or {}
    get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: d
    if devices is None:
        devices = jax.devices()
    total = get("num_devices") or len(devices)
    n_graph = int(get("graph", 1) or 1)
    n_model = int(get("model", 1) or 1)
    n_pipe = int(get("pipe", 1) or 1)
    n_expert = int(get("expert", 1) or 1)
    if n_pipe > 1 and (n_graph > 1 or n_model > 1):
        raise ValueError("pipe is exclusive with graph/model axes")
    if n_expert > 1 and (n_graph > 1 or n_model > 1 or n_pipe > 1):
        raise ValueError("expert is exclusive with graph/model/pipe axes")
    if total % (n_graph * n_model * n_pipe * n_expert) != 0:
        raise ValueError(
            f"num_devices={total} not divisible by graph*model*pipe*expert="
            f"{n_graph * n_model * n_pipe * n_expert}"
        )
    if n_expert > 1:
        return make_mesh_expert(total // n_expert, n_expert, devices=devices)
    if n_pipe > 1:
        from .pipeline import make_mesh_pipe

        return make_mesh_pipe(total // n_pipe, n_pipe, devices=devices)
    n_data = total // (n_graph * n_model)
    if n_model > 1:
        return make_mesh_3d(n_data, n_graph, n_model, devices=devices)
    if n_graph > 1:
        return make_mesh_2d(n_data, n_graph, devices=devices)
    return make_mesh(total, devices=devices)


def tp_param_sharding(mesh: Mesh, tree):
    """Megatron-style tensor-parallel sharding pytree for a param tree.

    Every 2+-layer MLP in this codebase is ``init_mlp``'s
    ``{"layers": [{"lin": {w,b}, "ln"?}, ...]}`` (models/nn.py:98-124); its
    hidden dim is the tensor-parallel axis:

      * layer 0 ("column-parallel"): ``w`` sharded on its LAST dim, its bias
        and the inter-layer LayerNorm params sharded likewise — the hidden
        activation lives sharded over 'model';
      * final layer ("row-parallel"): ``w`` sharded on its CONTRACTING dim;
        the matmul produces partial sums and GSPMD inserts the all-reduce
        (the single collective of the Megatron pattern). Bias replicated.

    Stacked per-block params ([num_blocks, din, dout] leaves from the
    denoiser's scan-over-blocks layout) shard the same trailing dims. MLPs
    whose hidden dim does not divide the 'model' axis — and every non-MLP
    leaf (plain linears, LayerNorms, embeddings) — are replicated; GSPMD
    resolves any mixture with resharding, so correctness never depends on
    which leaves qualify. Works on any pytree whose structure embeds param
    subtrees (params, EMA copies, optax m/v states alike).

    The same pytree serves as ``device_put`` placement for TrainState leaves
    and as ``with_sharding_constraint`` spec inside the jitted train step.
    """
    rep = NamedSharding(mesh, P())
    n_model = mesh.shape[MODEL_AXIS] if MODEL_AXIS in mesh.axis_names else 1

    def col(arr):  # shard last dim
        spec = [None] * (arr.ndim - 1) + [MODEL_AXIS]
        return NamedSharding(mesh, P(*spec))

    def row(arr):  # shard second-to-last (contracting) dim
        spec = [None] * (arr.ndim - 2) + [MODEL_AXIS, None]
        return NamedSharding(mesh, P(*spec))

    def all_rep(node):
        return jax.tree.map(lambda _: rep, node)

    def walk_mlp(layers):
        hidden = layers[0]["lin"]["w"].shape[-1]
        if n_model <= 1 or hidden % n_model != 0:
            return [all_rep(l) for l in layers]
        out = []
        last = len(layers) - 1
        for i, layer in enumerate(layers):
            lspec = {}
            for k, v in layer.items():
                if k == "lin" and i == 0:
                    lspec[k] = {kk: col(vv) for kk, vv in v.items()}
                elif k == "lin" and i == last:
                    lspec[k] = {
                        kk: (row(vv) if kk == "w" else rep)
                        for kk, vv in v.items()
                    }
                elif k == "ln" and i == 0:
                    lspec[k] = {kk: col(vv) for kk, vv in v.items()}
                else:  # middle layers / trailing LN: replicated
                    lspec[k] = all_rep(v)
            out.append(lspec)
        return out

    def walk(node):
        if isinstance(node, dict):
            if (
                "layers" in node
                and isinstance(node["layers"], (list, tuple))
                and len(node["layers"]) >= 2
                and all(
                    isinstance(l, dict) and "lin" in l for l in node["layers"]
                )
            ):
                out = {k: walk(v) for k, v in node.items() if k != "layers"}
                out["layers"] = walk_mlp(node["layers"])
                return out
            return {k: walk(v) for k, v in node.items()}
        if hasattr(node, "_fields"):  # NamedTuple (optax states)
            return type(node)(*(walk(v) for v in node))
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        if node is None:
            return None
        return rep

    return walk(tree)


def fsdp_param_sharding(mesh: Mesh, tree):
    """ZeRO-3-style fully-sharded-data-parallel placement pytree.

    Every array leaf (params, grads, optax m/v moments, EMA copies alike)
    is sharded over the 'data' axis on its LARGEST divisible dimension, so
    parameter + optimizer memory per device drops ~linearly with the data
    axis; GSPMD all-gathers each leaf just-in-time for the matmul that
    consumes it and reduce-scatters the corresponding grad. The reference
    has no distributed support at all (SURVEY.md section 2.3); at MolDiff's
    5.5M params FSDP is capability breadth — the mechanism is what scales.

    Scalars and leaves with no dimension divisible by the axis size stay
    replicated; GSPMD resolves mixtures, so correctness never depends on
    which leaves qualify (same contract as :func:`tp_param_sharding`).
    """
    rep = NamedSharding(mesh, P())
    n_data = mesh.shape[DATA_AXIS] if DATA_AXIS in mesh.axis_names else 1

    def place(leaf):
        if n_data <= 1 or not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return rep
        divisible = [d for d in range(leaf.ndim) if leaf.shape[d] % n_data == 0
                     and leaf.shape[d] >= n_data]
        if not divisible:
            return rep
        dim = max(divisible, key=lambda d: leaf.shape[d])
        spec = [None] * leaf.ndim
        spec[dim] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(place, tree)


def pair_sharding(mesh: Mesh) -> Optional[NamedSharding]:
    """Sharding hint for [B, N, N, H] pair tensors: batch over 'data',
    receivers over 'graph' (when present). GSPMD propagates this through
    the denoiser's matmuls and inserts the cross-shard collectives for
    sender/receiver reductions."""
    if GRAPH_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, GRAPH_AXIS))
    return None


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, batch-dim sharded."""
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def pad_batch_to_multiple(batch: dict, multiple: int) -> dict:
    """Pad the leading dim so it divides the mesh size; padded rows get
    node_mask == 0 so they contribute nothing to any masked reduction."""
    b = next(iter(batch.values())).shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return batch
    out = {}
    for k, v in batch.items():
        pad_width = [(0, rem)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(np.asarray(v), pad_width)
    return out
