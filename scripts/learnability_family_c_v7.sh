#!/bin/bash
# Learnability probe of the ROUND-5-final (v7) family-C regime, before any
# chip budget is spent on it (VERDICT r4 item 3).
#
# v6 measured frac_beats_knn 0.28 on family_c and 0.00 on the canonical
# spike+slab (results/learnability_family_c.jsonl rows 2-3): with
# x-dependent mean/weight fields the tiny model attributes residual
# y-variation to x and hedges — it never learns plain in-context density
# estimation, which is exactly what gaussian_mixture's posterior demands.
#
# v7 keeps the v6 knobs (smooth mode fields mm_mu_input_scale=0.3, sigma
# floor mm_sig_lo=-1.7) and adds the marginal-mixture branch:
#   --p_marginal_mixture 0.5   half of family-C tasks are pure marginal
#                              mixtures (y independent of x, row-constant
#                              means/weights; mean-collapse prob 0.5 within
#                              the branch -> spike+slab shapes)
#
# Same tiny-model protocol as scripts/learnability_family_c{,_v6}.sh so the
# JSONL rows are directly comparable. Gate (strict, VERDICT r4 item 3):
# accept the v7 recipe iff frac_beats_knn > 0.5 on family_c AND family_c_2d
# AND spike_slab. The probe config matches the training regime
# (p_marginal_mixture included) — the sections score what the recipe
# actually trains on.
set -u
cd "$(dirname "$0")/.."
STEPS=${STEPS:-2500}
CKPT=${CKPT:-/tmp/famc_tiny_v7.npz}

JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/pretrain_tabica.py \
    --ckpt "$CKPT" --log /tmp/famc_tiny_v7_log.jsonl \
    --max_steps "$STEPS" --num_datasets 4 \
    --d_model 64 --num_heads 2 --num_layers 3 \
    --num_bars 256 --max_features 8 --max_active_features 8 \
    --num_ctx 256 --num_qry 64 \
    --lr 1e-3 --warmup_steps 100 --val_every 250 --ckpt_every 500 \
    --dtype float32 --p_multimodal 1.0 \
    --mm_mu_input_scale 0.3 --mm_sig_lo -1.7 \
    --p_marginal_mixture 0.5 --no_resume \
    > /tmp/famc_tiny_v7_train.log 2>&1

JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/probe_family_c.py \
    --ckpt "$CKPT" --num_tasks 16 --ctx 256 \
    --mm_mu_input_scale 0.3 --mm_sig_lo -1.7 \
    --p_marginal_mixture 0.5 \
    --out results/learnability_family_c.jsonl
