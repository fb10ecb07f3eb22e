#!/bin/bash
set -x
cd /root/repo
CKPT=$(ls -d logs_demo/full_*/checkpoints/*.ckpt | sort -V | tail -1)
cat > /tmp/sample_full.yml <<YAML
model:
  checkpoint: $CKPT
sample:
  seed: 2023
  batch_size: 128
  num_mols: 300
  save_traj_prob: 0.02
  size_mean: 18.0
  size_std: 5.0
YAML
python scripts/sample_drug3d.py --config /tmp/sample_full.yml \
  --outdir ./outputs_demo/full > /tmp/sample_full.txt 2>&1
D=$(ls -d outputs_demo/full/sample_full_* | tail -1)
python scripts/evaluate_all.py --from_where generated --root "$D" \
  --dataset_root ./data/synthetic > /tmp/eval_full.txt 2>&1
echo FINAL_EVAL_DONE
