#!/usr/bin/env bash
# Seed-sweep driver (reference scripts/ptq/minmax.sh analog): runs a PTQ
# config for seeds 1..3, skipping finished runs (coarse job-level resume).
set -euo pipefail
CFG=${1:-configs/runners/ptq/minmax/ptq_rn18_w8a8_synthetic.yaml}
OUT=${2:-results/ptq/minmax/sweep}
for SEED in 1 2 3; do
  DIR="$OUT/seed$SEED"
  if [ -f "$DIR/ckpt_last.pkl" ]; then
    echo "skip seed $SEED (finished)"
    continue
  fi
  python main.py --cfg "$CFG" --output-dir "$DIR" --opts seed=$SEED
done
