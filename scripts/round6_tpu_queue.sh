#!/bin/bash
# Round-5 close-out queue: gate the v6 model (scripts/pretrain_v6.sh —
# the learnable-shapes recipe, results/DIAGNOSIS.md round-4 addendum)
# against the v5_best incumbent, then re-measure the serving surface and
# rebuild the demo on the final winner. Serial stages, stall watchdogs
# where the remote-compile drop failure mode applies, a commit per stage.
#
#   scripts/round6_tpu_queue.sh                 # waits for pretraining to exit
#   QUEUE_STOP_TRAINING=1 scripts/round6_tpu_queue.sh   # stops training now
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

# Training over: stop durability loops, build the v6 SWA candidate
# (host-side numpy; never claims the TPU).
for pf in /tmp/snapshot.pid /tmp/durable_commit.pid; do
    if [ -f "$pf" ] && kill -0 "$(cat "$pf")" 2>/dev/null; then
        kill "$(cat "$pf")" 2>/dev/null || true
    fi
done
if ls checkpoints/snapshots/tabica_v6_s*.npz >/dev/null 2>&1; then
    python scripts/swa_checkpoint.py --last 4 \
        --snapshots 'checkpoints/snapshots/tabica_v6_s*.npz' \
        --config checkpoints/tabica_v6.npz.json \
        --out checkpoints/tabica_v6_swa.npz || true
fi

commit_results() {
    git add results checkpoints notebooks 2>/dev/null
    git diff --cached --quiet 2>/dev/null || git commit -q -m "$1

No-Verification-Needed: measurement artifacts only"
}

INCUMBENT=$(cat checkpoints/DEFAULT 2>/dev/null || echo tabica_v5_best.npz)
echo "[queue] incumbent: $INCUMBENT; candidates: tabica_v6_best.npz, tabica_v6.npz, tabica_v6_swa.npz"

# 1. Bundles for the v6 candidates, then the served-config quality gate
#    against the incumbent's committed bundle. Idempotent per candidate.
SELECT_ARGS=("results/tpu_eval.json=$INCUMBENT")
if [ -f checkpoints/tabica_v6_best.npz ]; then
    [ -f results/tpu_eval_v6best.json ] || {
        NPE_PFN_TPU_CHECKPOINT=checkpoints/tabica_v6_best.npz bash scripts/run_with_watchdog.sh \
            /tmp/bundle_v6b.log 1500 7200 -- python scripts/tpu_eval_bundle.py \
            --out=results/tpu_eval_v6best.json
        tail -3 /tmp/bundle_v6b.log
    }
    [ -f results/tpu_eval_v6best.json ] && SELECT_ARGS+=("results/tpu_eval_v6best.json=tabica_v6_best.npz")
    commit_results "TPU bundle: v6 best-val candidate"
fi
if [ -f checkpoints/tabica_v6.npz ]; then
    [ -f results/tpu_eval_v6final.json ] || {
        NPE_PFN_TPU_CHECKPOINT=checkpoints/tabica_v6.npz bash scripts/run_with_watchdog.sh \
            /tmp/bundle_v6f.log 1500 7200 -- python scripts/tpu_eval_bundle.py \
            --out=results/tpu_eval_v6final.json
        tail -3 /tmp/bundle_v6f.log
    }
    [ -f results/tpu_eval_v6final.json ] && SELECT_ARGS+=("results/tpu_eval_v6final.json=tabica_v6.npz")
    commit_results "TPU bundle: v6 final candidate"
fi
if [ -f checkpoints/tabica_v6_swa.npz ]; then
    [ -f results/tpu_eval_v6swa.json ] || {
        NPE_PFN_TPU_CHECKPOINT=checkpoints/tabica_v6_swa.npz bash scripts/run_with_watchdog.sh \
            /tmp/bundle_v6s.log 1500 7200 -- python scripts/tpu_eval_bundle.py \
            --out=results/tpu_eval_v6swa.json
        tail -3 /tmp/bundle_v6s.log
    }
    [ -f results/tpu_eval_v6swa.json ] && SELECT_ARGS+=("results/tpu_eval_v6swa.json=tabica_v6_swa.npz")
    commit_results "TPU bundle: v6 SWA candidate"
fi
python scripts/select_checkpoint.py "${SELECT_ARGS[@]}" | tee results/select_checkpoint.log
WINNER=$(cat checkpoints/DEFAULT 2>/dev/null || echo "$INCUMBENT")
case "$WINNER" in
    tabica_v6_best.npz) cp results/tpu_eval_v6best.json results/tpu_eval.json ;;
    tabica_v6.npz)      cp results/tpu_eval_v6final.json results/tpu_eval.json ;;
    tabica_v6_swa.npz)  cp results/tpu_eval_v6swa.json results/tpu_eval.json ;;
esac
echo "[queue] running remaining stages on winner: $WINNER"
commit_results "TPU bundles for v6 candidates + quality-gate selection (round 5)"

# 1b. CPU shape probe on the winner, in the v6 task regime: did the
#     learnable family-C data move the spike_slab / thin-mode deficits?
JAX_PLATFORMS=cpu timeout 1800 python scripts/probe_family_c.py \
    --ckpt "checkpoints/$WINNER" --num_tasks 16 --ctx 512 \
    --mm_mu_input_scale 0.3 --mm_sig_lo -1.7 || true
commit_results "Family-C (v6 regime) shape probe on the gate winner"

# 2. Headline bench on the winner at the shipped config (+roofline) and
#    the 512 continuity point.
timeout 3600 python bench.py --roofline --out results/bench_round5_ctx2048.json
commit_results "Round-5 headline bench at the shipped 2048-row context (+roofline)"
timeout 2400 python bench.py --filter_context 512 --num_sims 1000 \
    --out results/bench_round5_ctx512.json
commit_results "Round-5 continuity bench at 512-row context"

# 3. Reference-scale eval grid on the winner (fresh dir iff it changed).
if [ "$WINNER" != "$INCUMBENT" ]; then
    GRID_OUT=results/round6
    mkdir -p "$GRID_OUT"
else
    GRID_OUT=results/round5
fi
bash scripts/run_with_watchdog.sh /tmp/grid_cond6.log 1800 14400 -- \
    python scripts/evaluate_tasks.py \
    --tasks gaussian_linear two_moons slcp gaussian_mixture bernoulli_glm high_dim_gaussian \
    --num_cal 10 50 200 1000 --seeds 0 1 2 3 4 \
    --num_test 2000 --num_posterior_samples 1024 --n_obs_eval 16 \
    --out "$GRID_OUT" || true
commit_results "Round-5 eval grid at reference-protocol 2000 test obs (conditional)"
bash scripts/run_with_watchdog.sh /tmp/grid_joint6.log 1800 7200 -- \
    python scripts/evaluate_tasks.py \
    --tasks lotka_volterra sir pendulum wind_tunnel gaussian_bump_image \
    --num_cal 10 50 200 1000 --seeds 0 1 2 3 4 \
    --num_test 1000 --out "$GRID_OUT" || true
commit_results "Round-5 eval grid (joint tasks incl. image task)"

# 4. Length generalization on the final winner (skipped for v5 in the
#    round-4 reprioritized tail).
bash scripts/run_with_watchdog.sh /tmp/lengen6.log 1200 3600 -- \
    python scripts/length_generalization.py \
    --sizes 512 1024 2048 4096 8192 --num_train 16384 \
    --out "$GRID_OUT/length_generalization.jsonl" || true
commit_results "Round-5 length-generalization curve on the gate winner"

# 5. Calibration + plots + summary.
timeout 1800 python scripts/calibration_check.py --task two_moons --dim 2 \
    > "$GRID_OUT/sbc_two_moons.log" 2>&1 || true
timeout 1500 python scripts/predictive_check.py \
    > "$GRID_OUT/predictive_check.log" 2>&1 || true
python scripts/plot_results.py --results "$GRID_OUT" --out "$GRID_OUT/plots" || true
python scripts/plot_comparison.py --results results --out "$GRID_OUT/plots" || true
python scripts/round_summary.py --grid "$GRID_OUT" > /dev/null 2>&1 || true
commit_results "Round-5 calibration, plots, summary"

# 6. Rebuild the demo on the final DEFAULT (cut from round 4's tail).
timeout 3600 python scripts/build_demo_notebook.py || true
git add notebooks 2>/dev/null
git diff --cached --quiet 2>/dev/null || git commit -q -m "Rebuild demo on the round-5 gate winner

No-Verification-Needed: regenerated notebook artifact only"

echo "[queue] done"
