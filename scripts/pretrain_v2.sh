#!/bin/bash
# Round-2 pretraining recipe: 4x finer bar head (two-moons' crescent width is
# below the 256-bar resolution), longer training contexts, enriched prior.
#
# Warm-starts from the v1 checkpoint: the trunk (131k steps) is copied
# verbatim and the head is upsampled 256->1024 bars density-preservingly
# (npe_pfn_tpu/pretrain/warmstart.py), so step 0 is exactly v1 quality and
# every step after is refinement — far better use of a fixed wall-clock
# budget than the original from-scratch plan.
set -u
cd "$(dirname "$0")/.."
# ckpt_every 500: the remote TPU stream can stall mid-run (watchdog restarts
# it); frequent checkpoints bound the lost work to ~4 minutes.
# lr: partitioned warm-restart — the upsampled 1024-bar head trains at the
# peak lr, the converged trunk at 2e-5. A uniform 1.5e-4 restart DEGRADED the
# trunk (val NLL 0.097 @ step 500 -> 0.22+ by 7k; train_log_v2_badlr.jsonl),
# and even head-only 1.5e-4 showed an excursion (val 0.069 @ 2.5k -> 0.25 @
# 6k; train_log_v2.jsonl) — 8e-5 for the refinement phase. Best-val params
# are checkpointed separately (tabica_v2_best.npz) either way.
TOTAL_SECS=${TOTAL_SECS:-25200} STALL_SECS=${STALL_SECS:-420} exec scripts/pretrain_watchdog.sh \
    --ckpt_every 500 \
    --ckpt checkpoints/tabica_v2.npz \
    --log checkpoints/train_log_v2.jsonl \
    --init_from checkpoints/tabica_v1.npz \
    --max_steps 45000 \
    --num_datasets 8 \
    --num_bars 1024 \
    --num_ctx 768 \
    --d_model 128 \
    --num_layers 6 \
    --lr 8e-5 \
    --lr_trunk 2e-5 \
    --warmup_steps 500 \
    --p_heteroscedastic 0.3 --p_heavy_tail 0.2 --p_categorical_feats 0.2 \
    "$@"
