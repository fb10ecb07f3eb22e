"""Capture an on-device jax.profiler trace of the three hot workloads and
emit a per-op attribution JSON (VERDICT r3 item 6: replace the analytic
MFU-ceiling argument with measured per-op time).

  python scripts/capture_profile.py sample [batch] [n] [--steps S]
  python scripts/capture_profile.py train  [batch] [n] [tokens]
  python scripts/capture_profile.py guided [batch] [n] [tokens] [--steps S]

Writes the raw trace under results/traces/<mode>/ and the parsed top-op
report to results/profile_<mode>[_tokens].json (scripts/trace_report.py —
a first-party XSpace wire-format decoder; the image has no tensorboard).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    mode = argv.pop(0) if argv else "sample"
    steps = None
    if "--steps" in argv:
        i = argv.index("--steps")
        steps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    batch = int(argv[0]) if len(argv) > 0 else (256 if mode == "train" else 128)
    n = int(argv[1]) if len(argv) > 1 else 32
    tokens = argv[2] if len(argv) > 2 else ("pallas_bwd" if mode == "train"
                                            else "")

    from __graft_entry__ import _model_config
    from moldiff_tpu.models.moldiff import MolDiff
    from moldiff_tpu.ops import graph_ops
    from moldiff_tpu.utils.config import Config
    from moldiff_tpu.utils.profiling import trace

    cfg = _model_config()
    cfg["denoiser"]["dtype"] = "bfloat16"
    model = MolDiff(cfg, 8, 6)
    tag = f"{mode}{'_' + tokens.replace(',', '-') if tokens else ''}"
    trace_dir = os.path.join("results", "traces", tag)
    os.makedirs(trace_dir, exist_ok=True)

    if mode == "train":
        import numpy as np

        from moldiff_tpu.train.trainer import Trainer

        toks = set(tokens.split(","))
        if toks & {"pallas", "pallas_bwd"}:
            cfg["denoiser"]["use_pallas"] = True
            cfg["denoiser"]["pallas_bwd"] = "pallas_bwd" in toks
        cfg["denoiser"]["remat"] = "remat" in toks  # default OFF (fastest)
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
        with trace(trace_dir):
            for i in range(3):
                state, aux = trainer.train_step(state, batch_data,
                                                jax.random.key(2 + i))
            jax.block_until_ready(aux["loss"])
    else:
        params = model.init_params(jax.random.key(0))
        node_mask = jnp.ones((batch, n), jnp.float32)
        s = steps or (100 if mode == "guided" else 100)
        if mode == "guided":
            from moldiff_tpu.models.bond_predictor import BondPredictor

            toks = set(tokens.split(","))
            bp = BondPredictor(Config({
                "node_dim": cfg["node_dim"], "edge_dim": cfg["edge_dim"],
                "encoder": {"num_blocks": 8, "cutoff": 20, "use_gate": True,
                            "update_edge": True, "update_pos": False,
                            "dtype": "bfloat16",
                            "remat": "noremat" not in toks,
                            "use_pallas": "pallas_bwd" in toks,
                            "pallas_bwd": "pallas_bwd" in toks},
                "diff": cfg["diff"],
            }), 8, 5)
            bp_pair = (bp, bp.init_params(jax.random.key(5)))
            chunk = max(c for c in (100, 50, 25, 20, 10, 5, 1) if s % c == 0)

            def run(key):
                return model.sample_chunked(
                    params, node_mask, key, chunk_size=chunk,
                    guidance=("uncertainty", 1e-4), bond_predictor=bp_pair,
                    num_steps=s).pred_pos
        else:
            f = jax.jit(lambda p, m, k: model.sample(
                p, m, k, num_steps=s).pred_pos)
            g = f.lower(params, node_mask, jax.random.key(1)).compile()
            run = lambda key: g(params, node_mask, key)

        jax.block_until_ready(run(jax.random.key(1)))  # warm/compile
        with trace(trace_dir):
            jax.block_until_ready(run(jax.random.key(2)))

    # parse + write the per-op report
    from scripts.trace_report import report as trace_report

    import glob

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    rep = trace_report(paths, top=40)
    rep["mode"] = mode
    rep["tokens"] = tokens
    rep["batch"], rep["n_atoms"], rep["num_steps"] = batch, n, steps
    rep["planes"] = [p for p in rep["planes"] if p["device"]] or rep["planes"]
    out = os.path.join("results", f"profile_{tag}.json")
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)
    print(f"wrote {out}")
    for plane in rep["planes"]:
        print(f"== {plane['plane']} busy={plane['busy_ms']}ms")
        for op in plane["top_ops"][:15]:
            print(f"  {op['frac']:7.2%} {op['ms']:9.3f}ms  {op['op'][:90]}")


if __name__ == "__main__":
    main()
