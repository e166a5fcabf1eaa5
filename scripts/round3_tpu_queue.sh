#!/bin/bash
# End-of-round TPU measurement queue, round 3. Waits for pretraining to
# release the chip (one TPU process at a time), then runs every measurement
# serially in priority order (VERDICT r2 "Next round" items 1-6). Stages are
# stall-watchdogged where the remote-compile drop failure mode applies, save
# incrementally, and commit after each stage so a partial run still lands
# its artifacts.
#
#   scripts/round3_tpu_queue.sh [checkpoint]   # default checkpoints/tabica_v2_best.npz
set -u
cd "$(dirname "$0")/.."
if [ $# -ge 1 ]; then
    CKPT=$1
elif [ -f checkpoints/tabica_v2_best.npz ]; then
    CKPT=checkpoints/tabica_v2_best.npz
else
    CKPT=checkpoints/tabica_v2.npz
fi

LOG=checkpoints/pretrain_stdout.log
PIDFILE=${PRETRAIN_PIDFILE:-/tmp/pretrain.pid}
if [ -f "$PIDFILE" ]; then
    while kill -0 "$(cat "$PIDFILE")" 2>/dev/null; do
        echo "[queue] pretraining still running ($(tail -1 "$LOG" 2>/dev/null | cut -c1-90))"
        sleep 120
    done
fi
sleep 30  # let the TPU claim clear

commit_results() {
    git add results checkpoints 2>/dev/null
    git diff --cached --quiet 2>/dev/null || git commit -q -m "$1

No-Verification-Needed: measurement artifacts only"
}

echo "[queue] evaluating checkpoint $CKPT"

# 1. Quality + perf bundles, then the quality gate (served-config-only
#    comparison): DEFAULT points at the winner and every later stage serves
#    it. Three-way: v1 incumbent, v2 best-val, v2 final (end of the cosine
#    tail — val NLL alone must not decide the shipped checkpoint).
NPE_PFN_TPU_CHECKPOINT="$CKPT" bash scripts/run_with_watchdog.sh \
    /tmp/bundle_v2.log 1500 7200 -- python scripts/tpu_eval_bundle.py \
    --out=results/tpu_eval_v2.json
tail -5 /tmp/bundle_v2.log
SELECT_ARGS=("results/tpu_eval_v1.json=tabica_v1.npz"
             "results/tpu_eval_v2.json=$(basename "$CKPT")")
if [ "$CKPT" != "checkpoints/tabica_v2.npz" ] && [ -f checkpoints/tabica_v2.npz ]; then
    NPE_PFN_TPU_CHECKPOINT=checkpoints/tabica_v2.npz bash scripts/run_with_watchdog.sh \
        /tmp/bundle_v2f.log 1500 7200 -- python scripts/tpu_eval_bundle.py \
        --out=results/tpu_eval_v2final.json
    tail -3 /tmp/bundle_v2f.log
    SELECT_ARGS+=("results/tpu_eval_v2final.json=tabica_v2.npz")
fi
python scripts/select_checkpoint.py "${SELECT_ARGS[@]}" | tee results/select_checkpoint.log
WINNER=$(cat checkpoints/DEFAULT 2>/dev/null || echo tabica_v1.npz)
case "$WINNER" in
    "$(basename "$CKPT")") cp results/tpu_eval_v2.json results/tpu_eval.json ;;
    tabica_v2.npz) cp results/tpu_eval_v2final.json results/tpu_eval.json ;;
    *) cp results/tpu_eval_v1.json results/tpu_eval.json ;;
esac
echo "[queue] running remaining stages on winner: $WINNER"
commit_results "TPU bundle for v2 candidate + quality-gate selection (round 3)"

# 2. Headline bench on the selected checkpoint (VERDICT item 3: batch now
#    aligned to qry_chunk — expect the honest number back at ~7.7k/s).
timeout 2400 python bench.py --out results/bench_round3.json
commit_results "Round-3 headline bench on selected checkpoint"

# 3. log_prob validation vs exact posterior densities (VERDICT item 5),
#    with a ratio-classifier context-budget sweep.
bash scripts/run_with_watchdog.sh /tmp/validate_lp.log 1500 4500 -- \
    python scripts/validate_log_prob.py \
    --ratio_context_sizes 512 1024 \
    --out results/log_prob_validation.json || true
tail -3 /tmp/validate_lp.log
commit_results "log_prob validation vs analytic posteriors"

# 4. Length generalization (VERDICT item 4).
bash scripts/run_with_watchdog.sh /tmp/lengen.log 1200 3600 -- \
    python scripts/length_generalization.py \
    --sizes 512 1024 2048 4096 8192 --num_train 16384 \
    --out results/length_generalization.jsonl || true
commit_results "Length-generalization curve"

# 5. Reference-scale eval grid, conditional tasks (VERDICT item 2). The
#    harness resumes from saved cells, so watchdog restarts lose nothing.
bash scripts/run_with_watchdog.sh /tmp/grid_cond.log 1800 10800 -- \
    python scripts/evaluate_tasks.py \
    --tasks gaussian_linear two_moons slcp gaussian_mixture bernoulli_glm high_dim_gaussian \
    --num_cal 10 50 200 1000 --seeds 0 1 2 3 4 \
    --num_test 1000 --num_posterior_samples 1024 --n_obs_eval 16 \
    --out results || true
commit_results "Reference-scale eval grid (conditional tasks)"

# 5b. Quantile-transform variant on the multimodal tasks.
bash scripts/run_with_watchdog.sh /tmp/grid_quant.log 1800 4500 -- \
    python scripts/evaluate_tasks.py \
    --tasks two_moons slcp \
    --num_cal 200 1000 --seeds 0 1 2 \
    --num_test 1000 --num_posterior_samples 1024 --n_obs_eval 16 \
    --target_transform quantile \
    --out results/quantile || true
commit_results "Quantile-transform grid variant"

# 6. Joint-metric tasks.
bash scripts/run_with_watchdog.sh /tmp/grid_joint.log 1800 5400 -- \
    python scripts/evaluate_tasks.py \
    --tasks lotka_volterra sir pendulum wind_tunnel \
    --num_cal 10 50 200 1000 --seeds 0 1 2 3 4 \
    --num_test 1000 --out results || true
commit_results "Joint-metric task grid"

# 7. Calibration (SBC) + classifier-calibration + predictive checks.
timeout 1800 python scripts/calibration_check.py --task gaussian_linear \
    > results/sbc_gaussian_linear.log 2>&1 || true
timeout 1800 python scripts/calibration_check.py --task two_moons --dim 2 \
    > results/sbc_two_moons.log 2>&1 || true
timeout 1500 python scripts/classifier_calibration_audit.py \
    > results/classifier_calibration.log 2>&1 || true
timeout 1500 python scripts/predictive_check.py \
    > results/predictive_check.log 2>&1 || true
commit_results "Calibration + predictive checks"

# 8. Plots + comparison table.
python scripts/plot_results.py --results results --out results/plots
python scripts/plot_comparison.py --results results --out results/plots
commit_results "Round-3 plots + comparison table"

echo "[queue] done"
