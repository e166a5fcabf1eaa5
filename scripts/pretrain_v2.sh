#!/bin/bash
# Round-2 pretraining recipe: bigger head (finer bar resolution for
# fine-structure posteriors like two moons), longer training contexts,
# enriched prior. Starts FRESH (num_bars change is head-shape-incompatible
# with the v1 checkpoint).
set -u
cd "$(dirname "$0")/.."
TOTAL_SECS=${TOTAL_SECS:-30000} STALL_SECS=480 exec scripts/pretrain_watchdog.sh \
    --ckpt checkpoints/tabica_v2.npz \
    --log checkpoints/train_log_v2.jsonl \
    --max_steps 150000 \
    --num_datasets 8 \
    --num_bars 1024 \
    --num_ctx 512 \
    --d_model 144 \
    --num_layers 7 \
    --p_heteroscedastic 0.3 --p_heavy_tail 0.2 --p_categorical_feats 0.2 \
    "$@"
