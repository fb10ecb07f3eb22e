"""Round-4 evidence soaks in ONE process so the cold chain compiles are
shared (the axon tunnel caches compiles per process only; a fresh process
pays ~8-10 min per bucket again).

Runs, in order (after the 1k gate has passed separately):
  1. 10k unguided, reference acceptance  -> results/soak_v2_10k.json
  2. 1k unguided+guided in the EDM (add_edge distance) regime — the
     guided-win evidence -> results/soak_v2_1k_edm.json
The unguided EDM run reuses the unguided bucket compiles from (1):
add_edge/sanitize_mode are host-side classification knobs only.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.quality_soak import main as soak_main

COMMON = [
    "--logdir", ".",
    "--denoiser_prefix", "logs_r4/v2_xlft2",
    "--bp_prefix", "logs_r4_bp/bondpred_v2",
    "--dataset_root", "./data/synthetic_xl2",
    "--outdir", "./outputs_r4",
    "--recon_workers", "8",
]

def main():
    # 1k gates first (EMA vs raw weights) — pick the better for the 10k
    # 1k raw/EMA gates already recorded (results/soak_v2x2_1k{,_ema}.json);
    # re-run them only if the evidence files are missing
    for n, extra in (("results/soak_v2x2_1k.json", []),
                     ("results/soak_v2x2_1k_ema.json", ["--use_ema"])):
        if not os.path.exists(n):
            soak_main(COMMON + extra + [
                "--num_mols", "1000", "--no_guided", "--evidence", n,
            ])

    # pick EMA vs raw for the committed-headline legs from the 1k gates
    import json

    def gate_success(path):
        try:
            with open(path) as f:
                ev = json.load(f)
            runs = ev.get("runs", {})
            return next(iter(runs.values())).get("success_rate", 0.0)
        except Exception:
            return 0.0

    raw_s = gate_success("results/soak_v2x2_1k.json")
    ema_s = gate_success("results/soak_v2x2_1k_ema.json")
    ema_flag = ["--use_ema"] if ema_s > raw_s else []
    print(f"[r4] 1k gates: raw={raw_s:.4f} ema={ema_s:.4f} "
          f"-> headline uses {'EMA' if ema_flag else 'raw'} weights")

    soak_main(COMMON + ema_flag + [
        "--num_mols", "5000", "--no_guided",
        "--evidence", "results/soak_v2_5k.json",
    ])
    soak_main(COMMON + ema_flag + [
        "--num_mols", "1000", "--add_edge", "distance",
        "--evidence", "results/soak_v2_1k_edm.json",
    ])

    # acceptance-parity delta on the headline pool (host-side, VERDICT r3 #2)
    import glob
    import subprocess

    runs = [d for d in glob.glob("outputs_r4/soak_unguided*")
            if os.path.exists(os.path.join(d, "samples_all.pkl"))]
    # the 10k run = the biggest pool on disk
    big = max(runs, key=lambda d: os.path.getsize(
        os.path.join(d, "samples_all.pkl"))) if runs else None
    if big:
        subprocess.run([sys.executable, "scripts/reclassify_pool.py", big,
                        "--workers", "8",
                        "--json", "results/acceptance_parity_10k.json"])


if __name__ == "__main__":
    main()
