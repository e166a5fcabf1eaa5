#!/bin/bash
# End-of-round TPU measurement queue, round 4 tail ("round5" = the queue
# that closes round 4): gate the prior-enriched v5 model
# (scripts/pretrain_v5.sh — the diagnosis-targeted recipe,
# results/DIAGNOSIS.md) against the v4 incumbent, then re-measure the
# serving surface on the winner. Serial stages, stall watchdogs where the
# remote-compile drop failure mode applies, a commit after each stage.
#
#   scripts/round5_tpu_queue.sh                 # waits for pretraining to exit
#   QUEUE_STOP_TRAINING=1 scripts/round5_tpu_queue.sh   # stops training now
set -u
cd "$(dirname "$0")/.."

echo $$ > ${QUEUE_PIDFILE:-/tmp/queue.pid}
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

# Training is over: stop the snapshotter and build the v5 SWA candidate
# (host-side numpy; never claims the TPU).
if [ -f /tmp/snapshot.pid ] && kill -0 "$(cat /tmp/snapshot.pid)" 2>/dev/null; then
    kill "$(cat /tmp/snapshot.pid)" 2>/dev/null || true
fi
if ls checkpoints/snapshots/tabica_v5_s*.npz >/dev/null 2>&1; then
    python scripts/swa_checkpoint.py --last 4 \
        --snapshots 'checkpoints/snapshots/tabica_v5_s*.npz' \
        --config checkpoints/tabica_v5.npz.json \
        --out checkpoints/tabica_v5_swa.npz || true
fi

commit_results() {
    git add results checkpoints 2>/dev/null
    git diff --cached --quiet 2>/dev/null || git commit -q -m "$1

No-Verification-Needed: measurement artifacts only"
}

# 0. Hardware smoke of the deduped flash kernels + the per-batch mask
#    layout (VERDICT r3 item 6) BEFORE anything depends on them.
timeout 2400 python scripts/smoke_flash_tpu.py > /tmp/flash_smoke.log 2>&1 \
    || echo "[queue] FLASH SMOKE FAILED — see /tmp/flash_smoke.log"
tail -3 /tmp/flash_smoke.log
commit_results "Hardware smoke: deduped flash kernels, per-batch mask layout"

INCUMBENT=$(cat checkpoints/DEFAULT 2>/dev/null || echo tabica_v4_best.npz)
echo "[queue] incumbent: $INCUMBENT; candidates: tabica_v5_best.npz, tabica_v5.npz, tabica_v5_swa.npz"

# 1. Bundles for the v5 candidates, then the served-config quality gate
#    against the incumbent's committed bundle. Idempotent per candidate.
SELECT_ARGS=("results/tpu_eval.json=$INCUMBENT")
if [ -f checkpoints/tabica_v5_best.npz ]; then
    [ -f results/tpu_eval_v5best.json ] || {
        NPE_PFN_TPU_CHECKPOINT=checkpoints/tabica_v5_best.npz bash scripts/run_with_watchdog.sh \
            /tmp/bundle_v5b.log 1500 7200 -- python scripts/tpu_eval_bundle.py \
            --out=results/tpu_eval_v5best.json
        tail -3 /tmp/bundle_v5b.log
    }
    [ -f results/tpu_eval_v5best.json ] && SELECT_ARGS+=("results/tpu_eval_v5best.json=tabica_v5_best.npz")
    commit_results "TPU bundle: v5 best-val candidate"
fi
if [ -f checkpoints/tabica_v5.npz ]; then
    [ -f results/tpu_eval_v5final.json ] || {
        NPE_PFN_TPU_CHECKPOINT=checkpoints/tabica_v5.npz bash scripts/run_with_watchdog.sh \
            /tmp/bundle_v5f.log 1500 7200 -- python scripts/tpu_eval_bundle.py \
            --out=results/tpu_eval_v5final.json
        tail -3 /tmp/bundle_v5f.log
    }
    [ -f results/tpu_eval_v5final.json ] && SELECT_ARGS+=("results/tpu_eval_v5final.json=tabica_v5.npz")
    commit_results "TPU bundle: v5 final candidate"
fi
if [ -f checkpoints/tabica_v5_swa.npz ]; then
    [ -f results/tpu_eval_v5swa.json ] || {
        NPE_PFN_TPU_CHECKPOINT=checkpoints/tabica_v5_swa.npz bash scripts/run_with_watchdog.sh \
            /tmp/bundle_v5s.log 1500 7200 -- python scripts/tpu_eval_bundle.py \
            --out=results/tpu_eval_v5swa.json
        tail -3 /tmp/bundle_v5s.log
    }
    [ -f results/tpu_eval_v5swa.json ] && SELECT_ARGS+=("results/tpu_eval_v5swa.json=tabica_v5_swa.npz")
    commit_results "TPU bundle: v5 SWA candidate"
fi
python scripts/select_checkpoint.py "${SELECT_ARGS[@]}" | tee results/select_checkpoint.log
WINNER=$(cat checkpoints/DEFAULT 2>/dev/null || echo "$INCUMBENT")
case "$WINNER" in
    tabica_v5_best.npz) cp results/tpu_eval_v5best.json results/tpu_eval.json ;;
    tabica_v5.npz)      cp results/tpu_eval_v5final.json results/tpu_eval.json ;;
    tabica_v5_swa.npz)  cp results/tpu_eval_v5swa.json results/tpu_eval.json ;;
esac
echo "[queue] running remaining stages on winner: $WINNER"
commit_results "TPU bundles for v5 candidates + quality-gate selection (round 4)"

# 1b. CPU learning-curve probe on the gate winner: did the enriched prior
#     teach the conditional SHAPES (results/DIAGNOSIS.md)?
JAX_PLATFORMS=cpu timeout 1800 python scripts/probe_family_c.py \
    --ckpt "checkpoints/$WINNER" --num_tasks 16 --ctx 512 || true
commit_results "Family-C shape probe on the gate winner"

# 2. Headline bench on the selected checkpoint — at the SHIPPED default
#    (2048-row filtered context, 10k-sim pool) with the roofline estimate,
#    plus the 512 continuity point (VERDICT r3 item 5).
timeout 3600 python bench.py --roofline --out results/bench_round4_ctx2048.json
commit_results "Round-4 headline bench at the shipped 2048-row context (+roofline)"
timeout 2400 python bench.py --filter_context 512 --num_sims 1000 \
    --out results/bench_round4_ctx512.json
commit_results "Round-4 continuity bench at 512-row context"

# 3. Reference-scale eval grid on the winner. Fresh dir when the winner
#    changed so stale-model cells cannot leak into the summaries.
#    Conditional tasks at num_test 2000 (reference protocol scale,
#    evaluate_ropefm.py:986-994 — VERDICT r3 item 9).
if [ "$WINNER" != "$INCUMBENT" ]; then
    GRID_OUT=results/round5
    mkdir -p "$GRID_OUT"
else
    GRID_OUT=results
fi
bash scripts/run_with_watchdog.sh /tmp/grid_cond5.log 1800 14400 -- \
    python scripts/evaluate_tasks.py \
    --tasks gaussian_linear two_moons slcp gaussian_mixture bernoulli_glm high_dim_gaussian \
    --num_cal 10 50 200 1000 --seeds 0 1 2 3 4 \
    --num_test 2000 --num_posterior_samples 1024 --n_obs_eval 16 \
    --out "$GRID_OUT" || true
commit_results "Round-4 eval grid at reference-protocol 2000 test obs (conditional)"

bash scripts/run_with_watchdog.sh /tmp/grid_joint5.log 1800 7200 -- \
    python scripts/evaluate_tasks.py \
    --tasks lotka_volterra sir pendulum wind_tunnel gaussian_bump_image \
    --num_cal 10 50 200 1000 --seeds 0 1 2 3 4 \
    --num_test 1000 --out "$GRID_OUT" || true
commit_results "Round-4 eval grid (joint tasks incl. image task)"

# 4. Ratio-path ceiling attack (VERDICT r3 item 7): classifier context to
#    8192 under the flash kernel x ensemble size; the committed sweep
#    either fixes ratio log_prob or documents its saturation.
bash scripts/run_with_watchdog.sh /tmp/ratio_sweep.log 1800 7200 -- \
    python scripts/validate_log_prob.py \
    --ratio_context_sizes 512 2048 8192 --ratio_fits 1 4 \
    --num_train 16384 \
    --out results/log_prob_validation_round4.json || true
commit_results "Ratio-classifier ceiling sweep: context 512-8192 x ensembles"

# 4b. TSNPE simulation-efficiency on tasks where base quality is GOOD and
#     strongly data-responsive (VERDICT r3 item 4: on quality-limited
#     two_moons/slcp the round-4 curve is flat because truncation cannot
#     fix a wrong posterior; bernoulli_glm improves 0.98->0.63 with data,
#     high_dim_gaussian 0.77->0.53 — the regime where the reference's
#     sequential claim should show).
bash scripts/run_with_watchdog.sh /tmp/tsnpe_eff5.log 1200 5400 -- \
    python scripts/tsnpe_efficiency.py \
    --tasks bernoulli_glm high_dim_gaussian --budgets 256 1024 \
    --rounds 1 2 4 --seeds 0 1 \
    --out "$GRID_OUT/tsnpe_efficiency_goodtasks.jsonl" || true
commit_results "TSNPE efficiency on data-responsive ground-truth tasks"

# 5. Length generalization on the winner.
bash scripts/run_with_watchdog.sh /tmp/lengen5.log 1200 3600 -- \
    python scripts/length_generalization.py \
    --sizes 512 1024 2048 4096 8192 --num_train 16384 \
    --out "$GRID_OUT/length_generalization.jsonl" || true
commit_results "Round-4 length-generalization curve on the gate winner"

# 6. Calibration + predictive checks + plots + summary.
timeout 1800 python scripts/calibration_check.py --task two_moons --dim 2 \
    > "$GRID_OUT/sbc_two_moons.log" 2>&1 || true
timeout 1500 python scripts/predictive_check.py \
    > "$GRID_OUT/predictive_check.log" 2>&1 || true
python scripts/plot_results.py --results "$GRID_OUT" --out "$GRID_OUT/plots" || true
python scripts/plot_comparison.py --results "$GRID_OUT" --out "$GRID_OUT/plots" || true
python scripts/round_summary.py > results/SUMMARY.md 2>/dev/null || true
commit_results "Round-4 calibration, predictive checks, plots, summary"

# 6b. Round-5 planning data: on-chip step-time A/B of the Perceiver-style
#     row-attention bottleneck (row_pool_slots) at the v4/v5 shape — never
#     ran in the round-4 queue. Measures whether K=8 slots cut the T*N^2
#     HBM term enough to fund a bigger final-round pretrain.
if [ ! -f results/train_step_pool_ab.json ]; then
    timeout 2700 python scripts/profile_train_step.py --flash off \
        --steps 25 --d_model 256 --num_heads 2 --num_layers 8 \
        --num_bars 1024 --scores_dtype bfloat16 --row_pool_slots 8 \
        --out results/train_step_pool_ab.json || true
    commit_results "On-chip step-time profile of the row-pool bottleneck (round-5 planning)"
fi

# 7. Rebuild the demo on whatever DEFAULT now points at.
timeout 3600 python scripts/build_demo_notebook.py || true
git add notebooks 2>/dev/null
git diff --cached --quiet 2>/dev/null || git commit -q -m "Rebuild demo on the round-4 gate winner

No-Verification-Needed: regenerated notebook artifact only"

echo "[queue] done"
