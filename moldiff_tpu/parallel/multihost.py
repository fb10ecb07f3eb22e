"""Multi-host sampling orchestration over DCN.

The reference samples on a single device (`/root/reference/scripts/
sample_drug3d.py:40,76`). Generation is embarrassingly parallel across the
molecule pool, so the multi-pod scaling path (SURVEY.md section 5
"Distributed communication backend") shards the pool over processes:

  * each process initializes `jax.distributed` (parallel.mesh.
    initialize_distributed), takes a disjoint slice of the requested pool,
    and folds its process id into the PRNG key so shards draw independent
    (and deterministically reproducible) chains;
  * each process writes its results into ``<outdir>/shard_<pid>``;
  * light cross-host aggregation (pool counts for the until-N stopping
    decision) rides a tiny jnp all-gather over DCN via
    ``multihost_utils.process_allgather`` — the heavy molecule data never
    crosses hosts;
  * ``merge_shards`` (also exposed as `scripts/sample_drug3d.py --merge`)
    combines shard dirs on a shared filesystem into the single-host layout.
"""
from __future__ import annotations

import json
import os
import pickle
import shutil

import jax
import numpy as np


def shard_range(num_mols: int, process_id: int, num_processes: int):
    """Disjoint [start, stop) slice of the pool for this process; the first
    ``num_mols % num_processes`` shards take one extra molecule."""
    base, extra = divmod(num_mols, num_processes)
    start = process_id * base + min(process_id, extra)
    stop = start + base + (1 if process_id < extra else 0)
    return start, stop


def shard_key(key: jax.Array, process_id: int) -> jax.Array:
    """Per-process PRNG stream: fold the process id into the key, so shard
    results are independent and reproducible regardless of host count."""
    return jax.random.fold_in(key, process_id)


def allgather_counts(finished: int, failed: int) -> np.ndarray:
    """All-gather per-process (finished, failed) pool counts across hosts.

    Returns [num_processes, 2]. Uses a jnp collective over DCN so every
    host can apply the same stopping rule without a coordinator.
    """
    from jax.experimental import multihost_utils

    local = np.array([finished, failed], dtype=np.int32)
    return np.asarray(multihost_utils.process_allgather(local))


def shard_dir(outdir: str, process_id: int) -> str:
    return os.path.join(outdir, f"shard_{process_id}")


def _sdf_sort_key(name: str):
    """Numeric order for <idx>.sdf files; non-numeric names sort after, by
    string, so traj/aux files can't scramble the molecule numbering."""
    stem = os.path.splitext(name)[0]
    try:
        return (0, int(stem), "")
    except ValueError:
        return (1, 0, stem)


def merge_shards(outdir: str, remove: bool = False) -> dict:
    """Merge ``shard_*`` subdirectories (the per-process sampling outputs)
    into the single-host output layout:

      SMILES.txt           concatenated (shard order, then line order)
      SDF/<idx>.sdf        renumbered globally (uppercase: matches the
                           sample CLI layout that scripts/evaluate_all.py
                           globs)
      samples_all.pkl      pools concatenated
      meta.json            per-shard provenance

    Shard dirs and sdf files are ordered NUMERICALLY (shard_10 after
    shard_2; 10.sdf after 2.sdf) so the renumbered SDFs line up with the
    concatenated SMILES.txt line order.

    Returns the merged pool dict.
    """
    shards = sorted(
        (d for d in os.listdir(outdir)
         if d.startswith("shard_") and os.path.isdir(os.path.join(outdir, d))),
        key=lambda d: int(d.split("_")[1]),
    )
    if not shards:
        raise FileNotFoundError(f"no shard_* dirs under {outdir}")

    merged = {"finished": [], "failed": []}
    smiles_lines = []
    sdf_out = os.path.join(outdir, "SDF")
    os.makedirs(sdf_out, exist_ok=True)
    idx = 0
    meta = []
    for sh in shards:
        sdir = os.path.join(outdir, sh)
        pool_path = os.path.join(sdir, "samples_all.pkl")
        with open(pool_path, "rb") as f:
            pool = pickle.load(f)
        merged["finished"].extend(pool.get("finished", []))
        merged["failed"].extend(pool.get("failed", []))
        sm_path = os.path.join(sdir, "SMILES.txt")
        if os.path.exists(sm_path):
            with open(sm_path) as f:
                smiles_lines.extend(f.read().splitlines())
        shard_sdf = os.path.join(sdir, "sdf")
        if not os.path.isdir(shard_sdf):
            shard_sdf = os.path.join(sdir, "SDF")  # sample CLI layout
        if os.path.isdir(shard_sdf):
            names = [n for n in os.listdir(shard_sdf) if n.endswith(".sdf")]
            for name in sorted(names, key=_sdf_sort_key):
                shutil.copyfile(
                    os.path.join(shard_sdf, name),
                    os.path.join(sdf_out, f"{idx}.sdf"),
                )
                idx += 1
        meta.append({
            "shard": sh,
            "finished": len(pool.get("finished", [])),
            "failed": len(pool.get("failed", [])),
        })

    with open(os.path.join(outdir, "SMILES.txt"), "w") as f:
        f.write("\n".join(smiles_lines) + ("\n" if smiles_lines else ""))
    with open(os.path.join(outdir, "samples_all.pkl"), "wb") as f:
        pickle.dump(merged, f)
    with open(os.path.join(outdir, "meta.json"), "w") as f:
        json.dump({"shards": meta}, f, indent=1)
    if remove:
        for sh in shards:
            shutil.rmtree(os.path.join(outdir, sh))
    return merged
