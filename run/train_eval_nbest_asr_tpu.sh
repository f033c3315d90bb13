#!/usr/bin/env bash
# Canonical training run — parity surface with the reference's
# run/train_eval_N_Best_ASR_Transformer_STC.sh (same hyperparameters the
# paper's headline numbers use: bertadam, lr=bert_lr=3e-5, warmup 0.1,
# dropout 0.3/0.1, batch 16, max_norm 5.0, 50 epochs, seed 999,
# --add_segment_ids, coverage 1.0), plus the TPU-native flags.
set -euo pipefail

DATAROOT=${1:?usage: $0 <dataroot> [seed]}
SEED=${2:-999}

python -m nbest_asr_tpu.cli \
  --dataset dstc2 \
  --dataroot "${DATAROOT}" \
  --pre_trained_model bert \
  --add_segment_ids \
  --coverage 1.0 \
  --optim_choice bertadam \
  --lr 3e-5 --bert_lr 3e-5 \
  --warmup_proportion 0.1 \
  --dropout 0.3 --bert_dropout 0.1 \
  --batchSize 16 --max_norm 5.0 \
  --max_epoch 50 \
  --random_seed "${SEED}" \
  --compute_dtype bfloat16 \
  --length_buckets 64,96,160,256
