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
