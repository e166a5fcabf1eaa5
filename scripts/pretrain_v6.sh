#!/bin/bash
# Round-5 v6 pretraining: make the enriched conditional shapes LEARNABLE.
#
# v5 added multimodal conditionals to the data (family C + sign-folded
# inverse tasks) and the gate moved: composite |C2ST-0.5| 0.2541 -> 0.2387,
# two_moons 0.856 -> 0.845, slcp 0.891 -> 0.850 (results/
# select_checkpoint.log). But the round-4 addendum to results/DIAGNOSIS.md
# measured v5's family-C regime as largely IRREDUCIBLE in-context (unit-
# scale MLP mode-location fields, sigma to 0.003z: a kNN-KDE baseline
# scores KL 2.4 — no estimator can locate those modes from ~500 rows), so
# most of the new data taught hedging rather than shape.
#
# v6 changes only the data knobs, against the measured constraints:
#   --mm_mu_input_scale 0.3  smooth mode-location fields (learnable regime;
#                            kNN-KDE gap halves at lambda=0.3)
#   --mm_sig_lo -1.7         sigma floor 0.02z: modes resolvable at 1024
#                            bars and from ~hundreds of context rows
#   --p_sym_fold 0.7         weight the inverse sign-fold family UP — it is
#                            the exact mechanism behind two_moons/SLCP
#                            bimodality and needs no smoothness caveat
#   --p_multimodal 0.3       family C share unchanged, now learnable
#
# GATE BEFORE LAUNCH (round-5, first thing): the tiny-model probe
# scripts/learnability_family_c_v6.sh must show the v6 regime is learnable
# (frac_beats_knn >> 0.5, kl_excess well under the v5-regime ~2.6;
# results/learnability_family_c.jsonl). If it fails, fix the knobs first.
#
# Warm start from the round-4 gate winner (tabica_v5_best): families A/B
# and v5's learnable fraction are kept; fresh Adam + fresh cosine at the
# same peak lr as v5's fine-tune (the data distribution changed).
set -u
cd "$(dirname "$0")/.."
TOTAL_SECS=${TOTAL_SECS:-25200} STALL_SECS=${STALL_SECS:-420} exec scripts/pretrain_watchdog.sh \
    --ckpt_every 500 \
    --ckpt checkpoints/tabica_v6.npz \
    --log checkpoints/train_log_v6.jsonl \
    --init_from checkpoints/tabica_v5_best.npz \
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
    --p_multimodal 0.3 --p_sym_fold 0.7 \
    --mm_mu_input_scale 0.3 --mm_sig_lo -1.7 \
    "$@"
