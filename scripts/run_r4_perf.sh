#!/bin/bash
# Round-4 perf evidence sequence (run AFTER the soaks release the TPU),
# ordered by evidence value in case the round clock cuts it short.
# Each step appends to results/; safe to interrupt between steps.
set -x
cd /root/repo

# 1. same-session train A/B: full-EdgeBlock kernel vs round-3 partial
#    (both full remat, B=256 N=32) — VERDICT r3 item 5.
#    NOTE (post-run token flip): these commands ran under the old bench
#    semantics where bare 'pallas_bwd' meant edge_full=True. After the A/B
#    (full loses: 7.32 vs 8.33 remat / 7.97 vs 8.93 off) the default and
#    the token flipped: 'edge_full' now opts IN, bare 'pallas_bwd' is the
#    partial winner. Re-runs should use the commands below.
timeout 900 python bench.py train 256 32 pallas_bwd,edge_full \
  > results/bench_train_full_remat.log 2>&1
timeout 900 python bench.py train 256 32 pallas_bwd \
  > results/bench_train_partial_remat.log 2>&1

# 2. per-op device traces: train step + respaced sampler — VERDICT r3 item 6
timeout 900 python scripts/capture_profile.py train 256 32 pallas_bwd \
  > results/profile_train.log 2>&1
timeout 900 python scripts/capture_profile.py sample 128 32 --steps 100 \
  > results/profile_sample.log 2>&1

# 3. guided A/B: XLA VJP vs fused Pallas backwards (respaced S=100) —
#    VERDICT r3 item 4
timeout 1500 python bench.py guided 128 32 --steps 100 \
  > results/bench_guided_xla.log 2>&1
timeout 1500 python bench.py guided 128 32 pallas_bwd,noremat --steps 100 \
  > results/bench_guided_pallas.log 2>&1

# 4. remat-off A/B with a budget that survives slow server-side compiles
timeout 1500 python bench.py train 256 32 pallas_bwd,edge_full,off \
  > results/bench_train_full_off.log 2>&1
timeout 1500 python bench.py train 256 32 pallas_bwd,off \
  > results/bench_train_partial_off.log 2>&1

# 5. guided per-op trace
timeout 1200 python scripts/capture_profile.py guided 128 32 "" --steps 100 \
  > results/profile_guided.log 2>&1

echo DONE
