#!/bin/bash
# End-of-round TPU evaluation queue. Waits for pretraining to release the
# chip (one TPU process at a time), then runs every measurement serially in
# priority order. Each script pays the ~4-min axon claim once; results are
# written incrementally so a partial run still commits artifacts.
#
#   scripts/round2_tpu_queue.sh [checkpoint]   # default checkpoints/tabica_v2.npz
set -u
cd "$(dirname "$0")/.."
# Prefer the best-val checkpoint over the rolling one when no explicit
# argument is given — a stall can leave the rolling checkpoint on a bad step.
if [ $# -ge 1 ]; then
    CKPT=$1
elif [ -f checkpoints/tabica_v2_best.npz ]; then
    CKPT=checkpoints/tabica_v2_best.npz
else
    CKPT=checkpoints/tabica_v2.npz
fi

# Wait for the pretraining watchdog (PID recorded at launch) to finish —
# one TPU process at a time.
LOG=checkpoints/pretrain_stdout.log
PIDFILE=${PRETRAIN_PIDFILE:-/tmp/pretrain.pid}
if [ -f "$PIDFILE" ]; then
    while kill -0 "$(cat "$PIDFILE")" 2>/dev/null; do
        echo "[queue] pretraining still running ($(tail -1 "$LOG" 2>/dev/null | cut -c1-90))"
        sleep 120
    done
fi
sleep 30  # let the TPU claim clear

# Commit measurement artifacts after each stage so a partial queue run still
# lands its results even if the session ends mid-queue.
commit_results() {
    git add results checkpoints 2>/dev/null
    git diff --cached --quiet 2>/dev/null || git commit -q -m "$1

No-Verification-Needed: measurement artifacts only"
}

echo "[queue] evaluating checkpoint $CKPT"

# 1. Core quality + perf bundle for the v2 candidate (priority-ordered
#    sections, incremental saves), then the quality gate: DEFAULT points at
#    whichever of v1/v2 scores better on the ground-truth-gated C2ST cells.
#    Everything after runs on the winner (no env override → DEFAULT pointer).
#    The bundle saves incrementally and uses the persistent compile cache,
#    so the stall watchdog can safely restart it if the remote compile
#    service silently drops a request (known failure mode).
NPE_PFN_TPU_CHECKPOINT="$CKPT" bash scripts/run_with_watchdog.sh \
    /tmp/bundle_v2.log 1500 7200 -- python scripts/tpu_eval_bundle.py \
    --out=results/tpu_eval_v2.json
tail -5 /tmp/bundle_v2.log
python scripts/select_checkpoint.py \
    "results/tpu_eval_v1.json=tabica_v1.npz" \
    "results/tpu_eval_v2.json=$(basename "$CKPT")" | tee results/select_checkpoint.log
# Refresh the canonical bundle artifact with the winner's numbers.
WINNER=$(cat checkpoints/DEFAULT 2>/dev/null || echo tabica_v1.npz)
if [ "$WINNER" = "$(basename "$CKPT")" ]; then
    cp results/tpu_eval_v2.json results/tpu_eval.json
else
    cp results/tpu_eval_v1.json results/tpu_eval.json
fi
echo "[queue] running remaining sections on winner: $WINNER"
commit_results "TPU bundle for v2 checkpoint + quality-gate selection"

# 2. Headline bench with the selected checkpoint, early: same number the
#    driver records at round end; warms the winner's compile cache.
timeout 2400 python bench.py | tee results/bench_round2.json
commit_results "Round-2 headline bench on selected checkpoint"

# 3. Length generalization with the flash kernel at long contexts — ahead
#    of the long grids: it is an explicit round-2 deliverable and cheap.
timeout 2400 python scripts/length_generalization.py \
    --sizes 512 1024 2048 4096 8192 --num_train 16384 \
    --out results/length_generalization.jsonl
commit_results "Length-generalization curve"

# 4. Reference-scale eval grid (serial, one process).
timeout 5400 python scripts/evaluate_tasks.py \
    --tasks gaussian_linear two_moons slcp gaussian_mixture bernoulli_glm high_dim_gaussian \
    --num_cal 10 50 200 1000 --seeds 0 1 2 3 4 \
    --num_test 1000 --num_posterior_samples 1024 --n_obs_eval 16 \
    --out results
commit_results "Reference-scale eval grid (conditional tasks)"

# 3b. Quantile-transform variant on the multimodal tasks (zscore-vs-quantile
#     at grid scale; separate output dir keeps the files distinct).
timeout 2700 python scripts/evaluate_tasks.py \
    --tasks two_moons slcp \
    --num_cal 200 1000 --seeds 0 1 2 \
    --num_test 1000 --num_posterior_samples 1024 --n_obs_eval 16 \
    --target_transform quantile \
    --out results/quantile
commit_results "Quantile-transform grid variant"

# 4. Joint-metric tasks.
timeout 2700 python scripts/evaluate_tasks.py \
    --tasks lotka_volterra sir pendulum wind_tunnel \
    --num_cal 10 50 200 1000 --seeds 0 1 2 3 4 \
    --num_test 1000 --out results
commit_results "Joint-metric task grid"

# 6. Calibration (SBC) + classifier-calibration + predictive checks.
timeout 1800 python scripts/calibration_check.py --task gaussian_linear \
    > results/sbc_gaussian_linear.log 2>&1 || true
timeout 1800 python scripts/calibration_check.py --task two_moons --dim 2 \
    > results/sbc_two_moons.log 2>&1 || true
timeout 1500 python scripts/classifier_calibration_audit.py \
    > results/classifier_calibration.log 2>&1 || true
timeout 1500 python scripts/predictive_check.py \
    > results/predictive_check.log 2>&1 || true
commit_results "Calibration + predictive checks"

# 7. Plots + comparison table.
python scripts/plot_results.py --results results --out results/plots
python scripts/plot_comparison.py --results results --out results/plots
commit_results "Round-2 plots + comparison table"

echo "[queue] done"
