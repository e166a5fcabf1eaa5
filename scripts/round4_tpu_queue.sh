#!/bin/bash
# End-of-round TPU measurement queue, round 4: gate the scaled v4 model
# (from-scratch d256/h2/L8, scripts/pretrain_v4.sh) against the shipped
# incumbent, then re-measure everything on the winner. Same discipline as
# round 3: serial stages, stall watchdogs where the remote-compile drop
# failure mode applies, incremental saves, a commit after each stage.
#
#   scripts/round4_tpu_queue.sh                 # waits for pretraining to exit
#   QUEUE_STOP_TRAINING=1 scripts/round4_tpu_queue.sh   # stops training now
set -u
cd "$(dirname "$0")/.."

LOG=checkpoints/pretrain_stdout.log
PIDFILE=${PRETRAIN_PIDFILE:-/tmp/pretrain.pid}
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    if [ "${QUEUE_STOP_TRAINING:-0}" = "1" ]; then
        WD=$(cat "$PIDFILE")
        KIDS=$(ps -o pid= --ppid "$WD")
        echo "[queue] stopping pretrain watchdog $WD (kids: $KIDS)"
        kill "$WD" 2>/dev/null; sleep 1
        for k in $KIDS; do kill "$k" 2>/dev/null; done
        sleep 8
        for k in $KIDS; do kill -9 "$k" 2>/dev/null; done
    else
        while kill -0 "$(cat "$PIDFILE")" 2>/dev/null; do
            echo "[queue] pretraining running ($(tail -1 "$LOG" 2>/dev/null | cut -c1-90))"
            sleep 120
        done
    fi
fi
sleep 30  # let the TPU claim clear

# Training is over: stop the hourly checkpoint snapshotter and build the
# SWA candidate from its snapshots (host-side numpy; never claims the TPU).
if [ -f /tmp/snapshot.pid ] && kill -0 "$(cat /tmp/snapshot.pid)" 2>/dev/null; then
    kill "$(cat /tmp/snapshot.pid)" 2>/dev/null || true
fi
if ls checkpoints/snapshots/tabica_v4_s*.npz >/dev/null 2>&1; then
    python scripts/swa_checkpoint.py --last 4 \
        --out checkpoints/tabica_v4_swa.npz || true
fi

commit_results() {
    git add results checkpoints 2>/dev/null
    git diff --cached --quiet 2>/dev/null || git commit -q -m "$1

No-Verification-Needed: measurement artifacts only"
}

INCUMBENT=$(cat checkpoints/DEFAULT 2>/dev/null || echo tabica_v2.npz)
echo "[queue] incumbent: $INCUMBENT; candidates: tabica_v4_best.npz, tabica_v4.npz, tabica_v4_swa.npz"

# 1. Bundles for both v4 candidates (best-val and final), then the
#    served-config quality gate against the incumbent's round-3 bundle.
#    Re-measure the incumbent only if its committed bundle is missing.
SELECT_ARGS=()
if [ -f results/tpu_eval.json ]; then
    SELECT_ARGS+=("results/tpu_eval.json=$INCUMBENT")
else
    NPE_PFN_TPU_CHECKPOINT="checkpoints/$INCUMBENT" bash scripts/run_with_watchdog.sh \
        /tmp/bundle_inc.log 1500 7200 -- python scripts/tpu_eval_bundle.py \
        --out=results/tpu_eval_incumbent.json
    SELECT_ARGS+=("results/tpu_eval_incumbent.json=$INCUMBENT")
fi
# Bundle stages are idempotent: a queue re-armed after a VM restart skips
# candidates whose bundle JSON is already on disk (committed per stage).
if [ -f checkpoints/tabica_v4_best.npz ]; then
    [ -f results/tpu_eval_v4best.json ] || {
        NPE_PFN_TPU_CHECKPOINT=checkpoints/tabica_v4_best.npz bash scripts/run_with_watchdog.sh \
            /tmp/bundle_v4b.log 1500 7200 -- python scripts/tpu_eval_bundle.py \
            --out=results/tpu_eval_v4best.json
        tail -3 /tmp/bundle_v4b.log
    }
    [ -f results/tpu_eval_v4best.json ] && SELECT_ARGS+=("results/tpu_eval_v4best.json=tabica_v4_best.npz")
    commit_results "TPU bundle: v4 best-val candidate"
fi
if [ -f checkpoints/tabica_v4.npz ]; then
    [ -f results/tpu_eval_v4final.json ] || {
        NPE_PFN_TPU_CHECKPOINT=checkpoints/tabica_v4.npz bash scripts/run_with_watchdog.sh \
            /tmp/bundle_v4f.log 1500 7200 -- python scripts/tpu_eval_bundle.py \
            --out=results/tpu_eval_v4final.json
        tail -3 /tmp/bundle_v4f.log
    }
    [ -f results/tpu_eval_v4final.json ] && SELECT_ARGS+=("results/tpu_eval_v4final.json=tabica_v4.npz")
    commit_results "TPU bundle: v4 final candidate"
fi
if [ -f checkpoints/tabica_v4_swa.npz ]; then
    [ -f results/tpu_eval_v4swa.json ] || {
        NPE_PFN_TPU_CHECKPOINT=checkpoints/tabica_v4_swa.npz bash scripts/run_with_watchdog.sh \
            /tmp/bundle_v4s.log 1500 7200 -- python scripts/tpu_eval_bundle.py \
            --out=results/tpu_eval_v4swa.json
        tail -3 /tmp/bundle_v4s.log
    }
    [ -f results/tpu_eval_v4swa.json ] && SELECT_ARGS+=("results/tpu_eval_v4swa.json=tabica_v4_swa.npz")
    commit_results "TPU bundle: v4 SWA candidate"
fi
python scripts/select_checkpoint.py "${SELECT_ARGS[@]}" | tee results/select_checkpoint.log
WINNER=$(cat checkpoints/DEFAULT 2>/dev/null || echo "$INCUMBENT")
case "$WINNER" in
    tabica_v4_best.npz) cp results/tpu_eval_v4best.json results/tpu_eval.json ;;
    tabica_v4.npz)      cp results/tpu_eval_v4final.json results/tpu_eval.json ;;
    tabica_v4_swa.npz)  cp results/tpu_eval_v4swa.json results/tpu_eval.json ;;
esac
echo "[queue] running remaining stages on winner: $WINNER"
commit_results "TPU bundles for v4 candidates + quality-gate selection (round 4)"

# 2. Headline bench on the selected checkpoint.
timeout 2400 python bench.py --out results/bench_round4.json
commit_results "Round-4 headline bench on selected checkpoint"

# 3. Reference-scale eval grid on the winner (the harness caches cells per
#    results dir — use a fresh dir when the winner changed so stale-model
#    cells cannot leak into the round-4 summaries).
if [ "$WINNER" != "$INCUMBENT" ]; then
    GRID_OUT=results/round4
    mkdir -p "$GRID_OUT"
else
    GRID_OUT=results
fi
bash scripts/run_with_watchdog.sh /tmp/grid_cond4.log 1800 10800 -- \
    python scripts/evaluate_tasks.py \
    --tasks gaussian_linear two_moons slcp gaussian_mixture bernoulli_glm high_dim_gaussian \
    --num_cal 10 50 200 1000 --seeds 0 1 2 3 4 \
    --num_test 1000 --num_posterior_samples 1024 --n_obs_eval 16 \
    --out "$GRID_OUT" || true
commit_results "Round-4 eval grid (conditional tasks)"

bash scripts/run_with_watchdog.sh /tmp/grid_joint4.log 1800 7200 -- \
    python scripts/evaluate_tasks.py \
    --tasks lotka_volterra sir pendulum wind_tunnel gaussian_bump_image \
    --num_cal 10 50 200 1000 --seeds 0 1 2 3 4 \
    --num_test 1000 --out "$GRID_OUT" || true
commit_results "Round-4 eval grid (joint tasks incl. image task)"

# 4. Length generalization on the winner (the d256 model trains at 768 rows
#    too — the curve decides the serving filter_context_size default again).
bash scripts/run_with_watchdog.sh /tmp/lengen4.log 1200 3600 -- \
    python scripts/length_generalization.py \
    --sizes 512 1024 2048 4096 8192 --num_train 16384 \
    --out "$GRID_OUT/length_generalization.jsonl" || true
commit_results "Round-4 length-generalization curve"

# 4b. TSNPE simulation-efficiency: C2ST vs (budget × rounds) on the
#     ground-truth tasks — the reference's sequential headline
#     (tsnpe_pfn.py:14-119) measured quantitatively. Resumable (JSONL).
bash scripts/run_with_watchdog.sh /tmp/tsnpe_eff.log 1200 3600 -- \
    python scripts/tsnpe_efficiency.py \
    --tasks two_moons slcp --budgets 256 1024 --rounds 1 2 4 --seeds 0 1 \
    --out "$GRID_OUT/tsnpe_efficiency.jsonl" || true
commit_results "Round-4 TSNPE simulation-efficiency curve"

# 5. Calibration + predictive checks + plots.
timeout 1800 python scripts/calibration_check.py --task two_moons --dim 2 \
    > "$GRID_OUT/sbc_two_moons.log" 2>&1 || true
timeout 1500 python scripts/predictive_check.py \
    > "$GRID_OUT/predictive_check.log" 2>&1 || true
python scripts/plot_results.py --results "$GRID_OUT" --out "$GRID_OUT/plots" || true
python scripts/plot_comparison.py --results "$GRID_OUT" --out "$GRID_OUT/plots" || true
commit_results "Round-4 calibration, predictive checks, plots"

# 5b. Round-5 planning data: on-chip step-time A/B of the Perceiver-style
#     row-attention bottleneck (row_pool_slots, commit 568a093) at the v4
#     shape. CPU tests cover correctness; this measures whether K=8 slots
#     actually cut the T*N^2 HBM term enough to fund a bigger round-5 run.
if [ ! -f results/train_step_pool_ab.json ]; then
    timeout 2700 python scripts/profile_train_step.py --flash off \
        --steps 25 --d_model 256 --num_heads 2 --num_layers 8 \
        --num_bars 1024 --scores_dtype bfloat16 --row_pool_slots 8 \
        --out results/train_step_pool_ab.json || true
    commit_results "On-chip step-time profile of the row-pool bottleneck (round-5 planning)"
fi

# 6. Rebuild the demo on whatever DEFAULT now points at.
timeout 3600 python scripts/build_demo_notebook.py || true
git add notebooks 2>/dev/null
git diff --cached --quiet 2>/dev/null || git commit -q -m "Rebuild demo on the round-4 gate winner

No-Verification-Needed: regenerated notebook artifact only"

echo "[queue] done"
