#!/bin/bash
# Round-3 headline evidence (VERDICT r2 items 1-2): after the quality ladder
# (scripts/run_ladder_r3.sh) finishes, strip + publish the flagship
# checkpoints into ckpts/, then reproduce the headline claims FROM THE
# COMMITTED WEIGHTS and drop the JSONs into results/:
#   (a) 1000-mol unguided soak  -> results/soak_flagship_1000_validity.json
#   (b) 10k-mol unguided soak   -> results/soak_flagship_10k_validity.json
#   (c) guided --add_edge distance sweep -> results/sweep_xlft_addedge_r3.json
set -u
cd /root/repo
mkdir -p results outputs_r3

echo "[eval] waiting for xl_ft 160000.ckpt + bondpred 40000.ckpt"
while [ -z "$(ls logs_r3/xl_ft_*/checkpoints/160000.ckpt 2>/dev/null)" ] || \
      [ -z "$(ls logs_r3_bp/bondpred_*/checkpoints/40000.ckpt 2>/dev/null)" ]; do
  sleep 60
done
sleep 120  # let the last supervisor exit (one TPU process at a time)

python scripts/strip_checkpoint.py \
  "$(ls -t logs_r3/xl_ft_*/checkpoints/160000.ckpt | head -1)" \
  ckpts/flagship_xlft.ckpt --f16
python scripts/strip_checkpoint.py \
  "$(ls -t logs_r3_bp/bondpred_*/checkpoints/40000.ckpt | head -1)" \
  ckpts/bondpred_40k.ckpt --f16

echo "[eval] (a) 1000-mol unguided soak from committed config"
python scripts/sample_drug3d.py --config configs/sample/sample_flagship.yml \
  --outdir outputs_r3 --run_name soak1k \
  && python scripts/evaluate_all.py --root outputs_r3/soak1k \
  && cp outputs_r3/soak1k/metrics/validity.json \
        results/soak_flagship_1000_validity.json

echo "[eval] (b) 10k-mol unguided soak"
python scripts/sample_drug3d.py --config configs/sample/sample_flagship.yml \
  --num_mols 10000 --outdir outputs_r3 --run_name soak10k \
  && python scripts/evaluate_all.py --root outputs_r3/soak10k \
  && cp outputs_r3/soak10k/metrics/validity.json \
        results/soak_flagship_10k_validity.json

echo "[eval] (c) guided sweep, distance-perceived-bond regime"
python scripts/guidance_sweep.py --ckpt ckpts/flagship_xlft.ckpt \
  --bp_ckpt ckpts/bondpred_40k.ckpt --scales 3e-5,1e-4 --num_mols 1000 \
  --add_edge distance --dataset_root ./data/synthetic_full \
  --out results/sweep_xlft_addedge_r3.json

echo "[eval] DONE"
