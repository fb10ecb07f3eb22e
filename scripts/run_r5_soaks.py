"""Round-5 evidence sequence AFTER the v0-CE fine-tune (one process where
compiles can be shared; the axon tunnel caches compiles per process only).

Legs, ordered by evidence value:
  1. 1k gate, v0ce ckpt, commit=none   -> results/gate_r5_v0ce_none.json
     (does the MODEL-side fix alone recover the reference-exact sampler?)
  2. 1k gate, v0ce ckpt, commit=nodes  -> results/gate_r5_v0ce_nodes.json
     (combined levers)
  3. guided 1k, model bonds, winner commit mode
                                       -> results/gate_r5_v0ce_guided.json
     (VERDICT r4 item 4: the v2 bond predictor measured in the aromatic
     regime with the model's own bonds)
  4. 10k soak at the winner configuration
                                       -> results/soak_r5_10k.json
     (headline pool size, Wilson CI)
Each step is skipped if its evidence file already exists, so the script is
safe to re-run after interruptions.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.quality_soak import main as soak_main

COMMON = [
    "--logdir", ".",
    "--denoiser_prefix", "logs_r5/v2_v0ce",
    "--bp_prefix", "logs_r4_bp/bondpred_v2",
    "--dataset_root", "./data/synthetic_xl2",
    "--outdir", "./outputs_r5",
    "--recon_workers", "8",
]


def _success(path):
    try:
        with open(path) as f:
            runs = json.load(f).get("runs", {})
        return next(iter(runs.values())).get("success_rate", 0.0)
    except Exception:
        return 0.0


def main():
    legs = [
        ("results/gate_r5_v0ce_none.json", ["--num_mols", "1000",
                                            "--no_guided"]),
        ("results/gate_r5_v0ce_nodes.json", ["--num_mols", "1000",
                                             "--no_guided",
                                             "--commit", "nodes"]),
    ]
    for path, extra in legs:
        if not os.path.exists(path):
            soak_main(COMMON + extra + ["--evidence", path])

    s_none = _success("results/gate_r5_v0ce_none.json")
    s_nodes = _success("results/gate_r5_v0ce_nodes.json")
    winner = [] if s_none >= s_nodes else ["--commit", "nodes"]
    print(f"[r5] v0ce gates: none={s_none:.4f} nodes={s_nodes:.4f} "
          f"-> winner {'none' if not winner else 'nodes'}")

    # guided leg with the model's own bonds (no add_edge): does the v2 bond
    # predictor help/hurt in the aromatic regime?
    if not os.path.exists("results/gate_r5_v0ce_guided.json"):
        soak_main(COMMON + winner + [
            "--num_mols", "1000", "--no_unguided",
            "--evidence", "results/gate_r5_v0ce_guided.json",
        ])

    # headline pool
    if not os.path.exists("results/soak_r5_10k.json"):
        soak_main(COMMON + winner + [
            "--num_mols", "10000", "--no_guided",
            "--evidence", "results/soak_r5_10k.json",
        ])


if __name__ == "__main__":
    main()
