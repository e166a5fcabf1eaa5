#!/bin/bash
# Final close-out queue: gate the v7 model (scripts/pretrain_v7.sh — the
# spike+slab / marginal-mixture recipe, VERDICT r4 item 3) against the
# v6_best incumbent, then re-measure the quality and serving surfaces on
# the winner. Serial stages, stall watchdogs where the remote-compile
# drop failure mode applies, a commit per stage (CLAUDE.md: only git
# survives a VM restart).
#
#   scripts/round8_tail.sh                 # waits for pretraining to exit
#   QUEUE_STOP_TRAINING=1 scripts/round8_tail.sh   # stops training now
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

# Training over: stop durability loops, build the v7 SWA candidate
# (host-side numpy; never claims the TPU).
for pf in /tmp/snapshot.pid /tmp/durable_commit.pid; do
    if [ -f "$pf" ] && kill -0 "$(cat "$pf")" 2>/dev/null; then
        kill "$(cat "$pf")" 2>/dev/null || true
    fi
done
if ls checkpoints/snapshots/tabica_v7_s*.npz >/dev/null 2>&1; then
    python scripts/swa_checkpoint.py --last 4 \
        --snapshots 'checkpoints/snapshots/tabica_v7_s*.npz' \
        --config checkpoints/tabica_v7.npz.json \
        --out checkpoints/tabica_v7_swa.npz || true
fi

commit_results() {
    git add results checkpoints notebooks 2>/dev/null
    git diff --cached --quiet 2>/dev/null || git commit -q -m "$1

No-Verification-Needed: measurement artifacts only"
}

INCUMBENT=$(cat checkpoints/DEFAULT 2>/dev/null || echo tabica_v6_best.npz)
mkdir -p results/round8
echo "[queue] incumbent: $INCUMBENT; candidates: tabica_v7_best.npz, tabica_v7.npz, tabica_v7_swa.npz"

# 1. Bundles for the v7 candidates, then the served-config quality gate
#    against the incumbent's bundle — preferring the one re-measured on
#    the prefix-sliced kernel (same code state as the candidates).
INC_BUNDLE=results/tpu_eval.json
[ -f results/tpu_eval_v6best_sliced.json ] && INC_BUNDLE=results/tpu_eval_v6best_sliced.json
SELECT_ARGS=("$INC_BUNDLE=$INCUMBENT")
for spec in best:tabica_v7_best.npz:results/tpu_eval_v7best.json:/tmp/bundle_v7b.log \
            final:tabica_v7.npz:results/tpu_eval_v7final.json:/tmp/bundle_v7f.log \
            swa:tabica_v7_swa.npz:results/tpu_eval_v7swa.json:/tmp/bundle_v7s.log; do
    name=$(echo "$spec" | cut -d: -f1)
    ckpt=$(echo "$spec" | cut -d: -f2)
    out=$(echo "$spec" | cut -d: -f3)
    blog=$(echo "$spec" | cut -d: -f4)
    [ -f "checkpoints/$ckpt" ] || continue
    [ -f "$out" ] || {
        NPE_PFN_TPU_CHECKPOINT="checkpoints/$ckpt" bash scripts/run_with_watchdog.sh \
            "$blog" 1500 7200 -- python scripts/tpu_eval_bundle.py \
            --out="$out"
        tail -3 "$blog"
    }
    [ -f "$out" ] && SELECT_ARGS+=("$out=$ckpt")
    commit_results "TPU bundle: v7 $name candidate"
done
python scripts/select_checkpoint.py "${SELECT_ARGS[@]}" | tee results/select_checkpoint.log
WINNER=$(cat checkpoints/DEFAULT 2>/dev/null || echo "$INCUMBENT")
case "$WINNER" in
    tabica_v7_best.npz) cp results/tpu_eval_v7best.json results/tpu_eval.json ;;
    tabica_v7.npz)      cp results/tpu_eval_v7final.json results/tpu_eval.json ;;
    tabica_v7_swa.npz)  cp results/tpu_eval_v7swa.json results/tpu_eval.json ;;
esac
echo "[queue] running remaining stages on winner: $WINNER"
commit_results "TPU bundles for v7 candidates + quality-gate selection (final round)"

# 2. CPU shape probe on the winner in the v7 task regime (did the
#    marginal-mixture data fix the spike_slab deficit?) — backgrounded on
#    CPU so the TPU benches below run concurrently.
(
    JAX_PLATFORMS=cpu timeout 3000 nice -5 python scripts/probe_family_c.py \
        --ckpt "checkpoints/$WINNER" --num_tasks 16 --ctx 512 \
        --mm_mu_input_scale 0.3 --mm_sig_lo -1.7 --p_marginal_mixture 0.5 \
        --out results/round8/probe_winner_shapes.jsonl || true
) > /tmp/probe_winner.log 2>&1 &
PROBE_PID=$!

# 3. Headline bench on the winner at the shipped config (+roofline) and
#    the 512 continuity point (both on the prefix-sliced kernel).
timeout 3600 python bench.py --roofline --out results/bench_round8_final.json
commit_results "Final headline bench at the shipped 2048-row context (+roofline)"
timeout 2400 python bench.py --filter_context 512 --num_sims 1000 \
    --out results/bench_round8_ctx512.json
commit_results "Final continuity bench at 512-row context"

wait "$PROBE_PID" 2>/dev/null || true
commit_results "Family-C/spike-slab shape probe on the final gate winner"

# 4. Quality deltas at the data-rich end on the multimodal target tasks
#    (gaussian_mixture is the spike+slab payoff task; 1000-cal cells).
bash scripts/run_with_watchdog.sh /tmp/grid8.log 1800 10800 -- \
    python scripts/evaluate_tasks.py \
    --tasks gaussian_mixture two_moons slcp \
    --num_cal 1000 --seeds 0 1 2 \
    --num_test 2000 --num_posterior_samples 1024 --n_obs_eval 16 \
    --out results/round8 || true
commit_results "Final-round multimodal quality cells (1000-cal) on the winner"

# 5. Rebuild the demo iff the DEFAULT flipped, then summary/plots.
if [ "$WINNER" != "$INCUMBENT" ]; then
    timeout 3600 python scripts/build_demo_notebook.py || true
    git add notebooks 2>/dev/null
    git diff --cached --quiet 2>/dev/null || git commit -q -m "Rebuild demo on the final gate winner

No-Verification-Needed: regenerated notebook artifact only"
fi
python scripts/round_summary.py --grid results/round8 > /dev/null 2>&1 || true
commit_results "Final-round summary regeneration"

echo "[queue] done"
