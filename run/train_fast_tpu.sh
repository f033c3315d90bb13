#!/usr/bin/env bash
# TPU-optimal training configuration: everything train_eval_* runs, plus
# the throughput features that deviate from reference-parity batching —
# length buckets + token-budget per-bucket batch sizing (quality-validated
# in QUALITY.md: it matches or improves F1 on the smoke split).
set -euo pipefail
DATAROOT=${1:?usage: $0 <dataroot> [seed]}
SEED=${2:-999}

python -m nbest_asr_tpu.cli \
  --dataset dstc2 \
  --dataroot "${DATAROOT}" \
  --pre_trained_model bert \
  --add_segment_ids \
  --optim_choice bertadam \
  --lr 3e-5 --bert_lr 3e-5 \
  --warmup_proportion 0.1 \
  --dropout 0.3 --bert_dropout 0.1 \
  --batchSize 32 --max_norm 5.0 \
  --max_epoch 50 \
  --random_seed "${SEED}" \
  --compute_dtype bfloat16 \
  --length_buckets 64,96,160,256 \
  --token_budget 8192
