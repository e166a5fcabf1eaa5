#!/bin/bash
# Round-3 pretraining recipe (draft — tune after the round-2 TPU evals):
# scale the model and widen the feature budget with a curriculum.
#
# Differences vs v2:
#  - warm-start from the round-2 winner (checkpoints/DEFAULT pointer)
#  - feature-count curriculum 8 -> 24 active features over the first 10k
#    steps (traced schedule, zero recompiles) — v1/v2 trained mostly on
#    narrow tables, but eval tasks with embeddings use up to 24+dim_theta
#    columns
#  - profile the step once at the start (--profile_steps 20) to settle the
#    low-MXU-utilization question before committing the full budget
#
# Model scaling (d_model 192, 8 layers) is intentionally NOT enabled here:
# a warm start cannot cross a shape change, and D=16 batches still hang the
# remote compiler. Revisit from-scratch scaling only with a dedicated
# multi-day budget.
set -u
cd "$(dirname "$0")/.."
WINNER=$(cat checkpoints/DEFAULT 2>/dev/null || echo tabica_v2_best.npz)
TOTAL_SECS=${TOTAL_SECS:-25200} STALL_SECS=${STALL_SECS:-420} exec scripts/pretrain_watchdog.sh \
    --ckpt_every 500 \
    --ckpt checkpoints/tabica_v3.npz \
    --log checkpoints/train_log_v3.jsonl \
    --init_from "checkpoints/$WINNER" \
    --max_steps 45000 \
    --num_datasets 8 \
    --num_bars 1024 \
    --num_ctx 768 \
    --d_model 128 \
    --num_layers 6 \
    --lr 6e-5 \
    --lr_trunk 2e-5 \
    --warmup_steps 500 \
    --feat_curriculum_steps 10000 \
    --feat_curriculum_init 8 \
    --p_heteroscedastic 0.3 --p_heavy_tail 0.2 --p_categorical_feats 0.2 \
    --profile_steps 20 \
    "$@"
