#!/bin/bash
# Round-4 v5 pretraining: conditional-shape enrichment, warm-started.
#
# The round-4 diagnosis (results/DIAGNOSIS.md) falsified the capacity
# hypothesis: the bar head loses KL 0.001-0.005 projecting the exact
# two_moons/gaussian_mixture conditionals, the d256/h2/L8 architecture
# happily emits (spurious) multimodality — but the v4 pretraining prior
# produces 0% thin separated multimodal conditionals and <10% scale
# mixtures (results/diagnosis_prior_audit.json). The model was never shown
# the shapes the failing benchmarks demand.
#
# v5 therefore changes the DATA, not the architecture:
#   --p_multimodal 0.3   family C: explicit K-component mixture
#                        conditionals (thin separated location modes,
#                        spike+slab scale mixtures, x-dependent weights)
#   --p_sym_fold 0.5     |.|-folded theta combos in the inverse family —
#                        the exact non-injectivity behind two_moons/SLCP
#                        bimodality (tasks/registry.py:60)
#
# Warm start from the gate winner (tabica_v4_best, step 60k): the shape is
# unchanged, families A/B are already learned, and the fine-tune only has
# to add the new conditional shapes — a fresh cosine at half the peak lr.
# Fresh Adam state (init_from loads params only) — intended: the data
# distribution changed.
set -u
cd "$(dirname "$0")/.."
TOTAL_SECS=${TOTAL_SECS:-25200} STALL_SECS=${STALL_SECS:-420} exec scripts/pretrain_watchdog.sh \
    --ckpt_every 500 \
    --ckpt checkpoints/tabica_v5.npz \
    --log checkpoints/train_log_v5.jsonl \
    --init_from checkpoints/tabica_v4_best.npz \
    --max_steps ${MAX_STEPS:-60000} \
    --num_datasets 8 \
    --num_bars 1024 \
    --num_ctx 768 \
    --d_model 256 \
    --num_heads 2 \
    --num_layers 8 \
    --lr 1.5e-4 \
    --warmup_steps 1000 \
    --scores_dtype bfloat16 \
    --p_heteroscedastic 0.3 --p_heavy_tail 0.2 --p_categorical_feats 0.2 \
    --p_multimodal 0.3 --p_sym_fold 0.5 \
    "$@"
