#!/bin/bash
# Capability-ceiling probe (VERDICT r3 item 1a): train a TINY TabICA from
# scratch PURELY on family-C mixture conditionals (p_multimodal=1.0) on
# CPU, then score it with the same exact-conditional probe as the v5
# snapshots. If even in-distribution the loss cannot drive family-C KL
# down at miniature scale, the architecture/normalization pipeline — not
# the prior mix — is the binding constraint and v5's recipe needs changing
# before the gate.
#
# CPU-only by design (the TPU is busy pretraining v5); ~1h at these shapes.
set -u
cd "$(dirname "$0")/.."
STEPS=${STEPS:-2500}
CKPT=${CKPT:-/tmp/famc_tiny.npz}

JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/pretrain_tabica.py \
    --ckpt "$CKPT" --log /tmp/famc_tiny_log.jsonl \
    --max_steps "$STEPS" --num_datasets 4 \
    --d_model 64 --num_heads 2 --num_layers 3 \
    --num_bars 256 --max_features 8 --max_active_features 8 \
    --num_ctx 256 --num_qry 64 \
    --lr 1e-3 --warmup_steps 100 --val_every 250 --ckpt_every 500 \
    --dtype float32 --p_multimodal 1.0 --no_resume \
    > /tmp/famc_tiny_train.log 2>&1

JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/probe_family_c.py \
    --ckpt "$CKPT" --num_tasks 16 --ctx 256 \
    --out results/learnability_family_c.jsonl
