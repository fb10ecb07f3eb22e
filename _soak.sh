#!/bin/bash
# Quality soak: long train -> bond predictor -> guided + unguided sampling -> eval
set -x
cd /root/repo
CKPT=$(ls -d logs_demo/*/checkpoints/4000.ckpt | tail -1)
python scripts/train_drug3d.py --config configs/train/train_demo_synthetic.yml \
  --logdir ./logs_demo --name long --max_iters 50000 --resume "$CKPT" \
  > /tmp/soak_train.txt 2>&1
LONG=$(ls -d logs_demo/long_*/checkpoints/50000.ckpt | tail -1)
python scripts/train_bond.py --config configs/train/train_bondpred_demo.yml \
  --logdir ./logs_demo --name bond > /tmp/soak_bond.txt 2>&1
BOND=$(ls -d logs_demo/bond_*/checkpoints/20000.ckpt | tail -1)
cat > /tmp/sample_long.yml <<YAML
model:
  checkpoint: $LONG
sample:
  seed: 2023
  batch_size: 128
  num_mols: 300
  save_traj_prob: 0.0
YAML
python scripts/sample_drug3d.py --config /tmp/sample_long.yml \
  --outdir ./outputs_demo/long > /tmp/soak_sample.txt 2>&1
cat > /tmp/sample_guided.yml <<YAML
model:
  checkpoint: $LONG
bond_predictor: $BOND
sample:
  seed: 2023
  batch_size: 128
  num_mols: 300
  save_traj_prob: 0.0
  guidance:
    - uncertainty
    - 1.e-4
YAML
python scripts/sample_drug3d.py --config /tmp/sample_guided.yml \
  --outdir ./outputs_demo/guided > /tmp/soak_sample_guided.txt 2>&1
for d in outputs_demo/long/sample_long_* outputs_demo/guided/sample_guided_*; do
  python scripts/evaluate_all.py --from_where generated --root "$d" \
    --dataset_root ./data/synthetic >> /tmp/soak_eval.txt 2>&1
done
echo SOAK_DONE
