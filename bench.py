"""Sampling throughput benchmark: mols/sec/chip on GEOM-Drug-sized molecules.

Runs the full 1000-step reverse sampler (the reference's hot path,
`/root/reference/models/model.py:236-378`) as one jitted lax.scan on the
flagship model config (node_dim 256, 6 blocks) at bucket N=32 (covers the
GEOM-Drug size distribution N(24.9, 5.5)).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (SURVEY.md section 6).
We use an estimated 0.5 mols/sec for the PyTorch/A100 reference (batch-512
x 1000-step sampling runs reported ~15-20 min per batch for models of this
size); the north-star target is >= 10x that per v5e-8, i.e. ~0.63
mols/sec/chip. vs_baseline is value / 0.5.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the 1000-step sampler scan is a ~500s cold
# compile on the axon tunnel; warm runs load it in seconds
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

REFERENCE_MOLS_PER_SEC = 0.5  # estimated PyTorch/A100 single-GPU throughput


def bench_train(batch: int, n: int):
    """Secondary metric: train steps/sec at full model size (invoke as
    `python bench.py train [batch] [n]`)."""
    import numpy as np

    from __graft_entry__ import _model_config
    from moldiff_tpu.models.moldiff import MolDiff
    from moldiff_tpu.ops import graph_ops
    from moldiff_tpu.train.trainer import Trainer
    from moldiff_tpu.utils.config import Config

    cfg = _model_config()
    cfg["denoiser"]["dtype"] = "bfloat16"
    model = MolDiff(cfg, 8, 6)
    trainer = Trainer(model, Config({
        "pos_noise_std": 0.05, "max_grad_norm": 50.0,
        "optimizer": {"type": "adamw", "lr": 1e-4, "weight_decay": 1e-8,
                      "beta1": 0.99, "beta2": 0.999},
        "scheduler": {"type": "plateau", "factor": 0.8, "patience": 1000,
                      "min_lr": 1e-5},
    }))
    state = trainer.init_state(jax.random.key(0))
    rng = np.random.default_rng(0)
    e = graph_ops.num_halfedges(n)
    batch_data = {
        "node_type": rng.integers(0, 7, (batch, n)).astype(np.int32),
        "pos": rng.normal(size=(batch, n, 3)).astype(np.float32),
        "halfedge_type": rng.integers(0, 5, (batch, e)).astype(np.int32),
        "node_mask": np.ones((batch, n), np.float32),
    }
    state, aux = trainer.train_step(state, batch_data, jax.random.key(1))
    jax.block_until_ready(aux["loss"])
    t0 = time.time()
    steps = 20
    for i in range(steps):
        state, aux = trainer.train_step(state, batch_data, jax.random.key(i))
    jax.block_until_ready(aux["loss"])
    sps = steps / (time.time() - t0)
    print(json.dumps({
        "metric": "train_steps_per_sec", "value": round(sps, 2),
        "unit": f"steps/sec (batch {batch})", "vs_baseline": None,
    }))


def main():
    from __graft_entry__ import _model_config
    from moldiff_tpu.models.moldiff import MolDiff

    mode = "sample"
    argv = sys.argv[1:]
    if argv and argv[0] in ("train", "guided"):
        mode = argv[0]
        argv = argv[1:]
    batch = int(argv[0]) if len(argv) > 0 else (256 if mode == "train" else 128)
    n = int(argv[1]) if len(argv) > 1 else 32
    if mode == "train":
        return bench_train(batch, n)

    cfg = _model_config()
    cfg["denoiser"]["dtype"] = "bfloat16"  # mixed-precision denoiser
    cfg["denoiser"]["remat"] = False       # no autodiff in sampling
    model = MolDiff(cfg, num_node_types=8, num_edge_types=6)
    params = model.init_params(jax.random.key(0))

    guidance = None
    bond_predictor = None
    if mode == "guided":
        # headline reference config: bond-predictor uncertainty guidance
        # (configs/sample/sample_MolDiff.yml); predictor has no mask class
        from moldiff_tpu.models.bond_predictor import BondPredictor
        from moldiff_tpu.utils.config import Config

        bp = BondPredictor(Config({
            "node_dim": 256, "edge_dim": 64,
            # remat=True: guidance backward recompute beats HBM activation
            # saves (52 vs 72 ms/step measured on v5e)
            "encoder": {"num_blocks": 8, "cutoff": 20, "use_gate": True,
                        "update_edge": True, "update_pos": False,
                        "dtype": "bfloat16", "remat": True},
            "diff": cfg["diff"],
        }), 8, 5)
        bond_predictor = (bp, bp.init_params(jax.random.key(5)))
        guidance = ("uncertainty", 1e-4)

    node_mask = jnp.ones((batch, n), jnp.float32)

    if mode == "guided":
        # chunked: one full guided chain exceeds device-execution deadlines
        def run(params, node_mask, key):
            res = model.sample_chunked(
                params, node_mask, key, chunk_size=100,
                guidance=guidance, bond_predictor=bond_predictor,
            )
            return res.pred_node, res.pred_pos, res.pred_halfedge
    else:
        @jax.jit
        def run(params, node_mask, key):
            res = model.sample(params, node_mask, key)
            return res.pred_node, res.pred_pos, res.pred_halfedge

    # compile
    t0 = time.time()
    out = run(params, node_mask, jax.random.key(1))
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # timed runs
    times = []
    for i in range(3):
        t0 = time.time()
        out = run(params, node_mask, jax.random.key(2 + i))
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    mols_per_sec = batch / best

    n_chips = jax.device_count()
    suffix = "_guided" if mode == "guided" else ""
    result = {
        "metric": f"mols_per_sec_per_chip{suffix}",
        "value": round(mols_per_sec / max(n_chips, 1), 3),
        "unit": "mols/sec/chip",
        "vs_baseline": round(mols_per_sec / max(n_chips, 1) / REFERENCE_MOLS_PER_SEC, 2),
    }
    print(json.dumps(result))
    print(
        f"# mode={mode} batch={batch} n_atoms={n} T=1000 compile={compile_s:.1f}s "
        f"best_run={best:.2f}s device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
