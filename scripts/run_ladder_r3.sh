#!/bin/bash
# Round-3 quality ladder (VERDICT r2 item 1): runs AFTER the flagship
# 110k-iter supervisor run completes, chaining the BASELINE.md
# "quality-lever ladder" stages so the TPU never idles:
#   flagship 110k  ->  [train-MFU benches: fused Pallas backward, item 5]
#   -> bond_len ft (110k->130k @ lr 1e-5)
#   -> xl ft on synthetic_xl (130k->160k @ lr 5e-5)
#   -> bond predictor 40k (for the guided sweep)
# Each stage uses the stall-watchdog supervisor; --resume_latest picks the
# previous stage's newest checkpoint in ./logs_r3 (sequential mtimes).
set -u
cd /root/repo
mkdir -p results

echo "[ladder] waiting for flagship 110000.ckpt"
while [ -z "$(ls logs_r3/flagship_*/checkpoints/110000.ckpt 2>/dev/null)" ]; do
  sleep 60
done
sleep 120  # let the flagship supervisor save + exit (one TPU process rule)
echo "[ladder] flagship done; train-MFU benches (bench.py train)"

for policy in none pallas_bwd pallas_bwd,dots pallas; do
  out="results/bench_train_b256_$(echo "$policy" | tr ',' '+').json"
  timeout 2400 python bench.py train 256 32 "$policy" > "$out" 2> "${out%.json}.err" \
    && echo "[ladder] bench $policy: $(cat "$out")" \
    || echo "[ladder] bench $policy FAILED (see ${out%.json}.err)"
done

echo "[ladder] stage 2: bond_len fine-tune (110k -> 130k @ lr 1e-5)"
python scripts/train_supervisor.py --resume_latest \
  --supervisor_log sup_bondlen.log -- \
  scripts/train_drug3d.py --config configs/train/train_full_synthetic_bondlen.yml \
  --logdir ./logs_r3 --name bondlen_ft --override_lr 1e-5

echo "[ladder] stage 3: xl fine-tune (130k -> 160k @ lr 5e-5)"
python scripts/train_supervisor.py --resume_latest \
  --supervisor_log sup_xlft.log -- \
  scripts/train_drug3d.py --config configs/train/train_full_synthetic_xl.yml \
  --logdir ./logs_r3 --name xl_ft --override_lr 5e-5

echo "[ladder] stage 4: bond predictor 40k"
python scripts/train_supervisor.py \
  --supervisor_log sup_bondpred.log -- \
  scripts/train_bond.py --config configs/train/train_bondpred_synthetic.yml \
  --logdir ./logs_r3_bp --name bondpred

echo "[ladder] ALL STAGES DONE"
