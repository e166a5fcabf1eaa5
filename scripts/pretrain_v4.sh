#!/bin/bash
# Round-3/4 scaled pretraining: from-scratch d_model 256 / 8 layers (~8.7M
# params vs 1.88M for v1-v3), closing on the external TabPFNv2's ~7M+ that
# the reference gets for free (reference: pyproject.toml:15, npe_pfn.py:140).
#
# Why from scratch: a warm start cannot cross the d_model/num_layers shape
# change, and v1->v2 warm refinement only moved two-moons C2ST ~0.02 — the
# binding constraint is capacity (VERDICT r2 "What's missing" #1).
#
# Why this shape: the 500 ms step is HBM-bound on the row-attention score
# tensors [D, T, H, N, N] (results/train_step_ab.json), which scale with
# the head count H and NOT with d_model — so two 128-wide heads halve the
# dominant bandwidth term. Measured on-chip: d256/h2/L8 = 485 ms/step,
# the SAME cost as the shipped d128/h4/L6 (506 ms) with 4.6x the
# parameters (d256/h4/L8 would be 818 ms). num_datasets stays 8 (D>=16
# hangs the remote compiler). If quality stalls, the hedge is h4 at 1.7x
# step cost, not a width cut.
#
# Inherits every v2/v3 lesson: enriched prior, feature curriculum, averaged
# 4-batch validation, 500-step atomic checkpoints under the stall watchdog.
#
# scores_dtype bfloat16: halves the score-tensor traffic for another
# measured 16% step-time cut (402 vs 476 ms at these shapes) with loss
# curves identical to 4-5 decimals over 150 steps on the same data stream
# (results/train_step_ab.json; softmax still reduces in f32).
set -u
cd "$(dirname "$0")/.."
TOTAL_SECS=${TOTAL_SECS:-43200} STALL_SECS=${STALL_SECS:-420} exec scripts/pretrain_watchdog.sh \
    --ckpt_every 500 \
    --ckpt checkpoints/tabica_v4.npz \
    --log checkpoints/train_log_v4.jsonl \
    --max_steps 150000 \
    --num_datasets 8 \
    --num_bars 1024 \
    --num_ctx 768 \
    --d_model 256 \
    --num_heads 2 \
    --num_layers 8 \
    --lr 3e-4 \
    --warmup_steps 2000 \
    --feat_curriculum_steps 10000 \
    --feat_curriculum_init 8 \
    --scores_dtype bfloat16 \
    --p_heteroscedastic 0.3 --p_heavy_tail 0.2 --p_categorical_feats 0.2 \
    "$@"
