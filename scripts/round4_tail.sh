#!/bin/bash
# Round-4 tail: reprioritized close-out after the round5 queue's TSNPE
# stage. Rationale (session log): the remaining queue stages (length-gen /
# calibration / demo repeats, row-pool A/B) are lower value for the final
# round than (a) the two bench stages the chip-yield-guard bug silently
# skipped and (b) starting the v6 pretraining leg (scripts/pretrain_v6.sh)
# so round 5 inherits a partly-trained model. Row-pool A/B runs only if
# the v6 learnability gate FAILS (no v6 run to fund -> perf data is the
# next best use of the chip).
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/tail.pid

TSNPE_OUT=results/round5/tsnpe_efficiency_goodtasks.jsonl

# 1. Wait for the TSNPE stage to finish (it commits via the queue), then
#    stop the queue before it launches the next stage.
QPID=$(cat /tmp/queue.pid 2>/dev/null || echo "")
if [ -n "$QPID" ] && kill -0 "$QPID" 2>/dev/null; then
    while kill -0 "$QPID" 2>/dev/null; do
        STAGE=$(ps -o cmd= --ppid "$QPID" | head -1)
        case "$STAGE" in
            *tsnpe_efficiency*|"") sleep 60 ;;
            *) break ;;  # TSNPE done, next stage just started
        esac
    done
    if kill -0 "$QPID" 2>/dev/null; then
        KIDS=$(ps -o pid= --ppid "$QPID")
        echo "[tail] stopping queue $QPID (kids: $KIDS)"
        kill "$QPID" 2>/dev/null; sleep 1
        for k in $KIDS; do
            GKIDS=$(ps -o pid= --ppid "$k")
            kill "$k" 2>/dev/null
            sleep 3
            for g in $GKIDS; do kill "$g" 2>/dev/null; done
            sleep 5
            for g in $GKIDS $k; do kill -9 "$g" 2>/dev/null; done
        done
    fi
    rm -f /tmp/queue.pid
fi
# Commit any artifacts the interrupted stage left behind.
git add results 2>/dev/null
git diff --cached --quiet 2>/dev/null || git commit -q -m "Round-4 queue artifacts at tail handoff

No-Verification-Needed: measurement artifacts only"
sleep 30  # TPU claim clear

commit_results() {
    git add results checkpoints 2>/dev/null
    git diff --cached --quiet 2>/dev/null || git commit -q -m "$1

No-Verification-Needed: measurement artifacts only"
}

# 2. The two bench stages the guard bug skipped (VERDICT r3 item 5):
#    shipped 2048-row config with the roofline, plus the 512 continuity
#    point. bench.py now excludes its own ancestor chain, and /tmp/queue.pid
#    is gone anyway.
timeout 3600 python bench.py --roofline --out results/bench_round4_ctx2048.json \
    && commit_results "Round-4 headline bench at the shipped 2048-row context (+roofline)"
timeout 2400 python bench.py --filter_context 512 --num_sims 1000 \
    --out results/bench_round4_ctx512.json \
    && commit_results "Round-4 continuity bench at 512-row context"

# 3. v6 learnability gate: tiny model trained purely on the v6 family-C
#    regime must beat the kNN-KDE baseline (frac_beats_knn > 0.5 on
#    family_c AND family_c_2d) with kl_excess well under the v5-regime
#    ~2.6. scripts/learnability_family_c_v6.sh appends the scored row to
#    results/learnability_family_c.jsonl with mm_mu_input_scale=0.3.
GATE=fail
for i in $(seq 1 90); do
    GATE=$(python - <<'EOF'
import json
rows = []
try:
    with open("results/learnability_family_c.jsonl") as f:
        rows = [json.loads(l) for l in f if l.strip()]
except OSError:
    pass
v6 = [r for r in rows if r.get("mm_mu_input_scale", 1.0) < 1.0]
if not v6:
    print("wait"); raise SystemExit
r = v6[-1]
ok = (r["family_c"]["frac_beats_knn"] > 0.5
      and r["family_c_2d"]["frac_beats_knn"] > 0.5
      and r["family_c"]["kl_excess_mean"] < 1.5)
print("pass" if ok else "fail")
EOF
)
    [ "$GATE" != "wait" ] && break
    sleep 60
done
echo "[tail] v6 learnability gate: $GATE"
git add results/learnability_family_c.jsonl 2>/dev/null
git diff --cached --quiet 2>/dev/null || git commit -q -m "Learnability probe: tiny model on the v6 family-C regime

No-Verification-Needed: measurement artifact only"

if [ "$GATE" = "pass" ]; then
    # 4a. Launch the round-5 v6 leg now; durable commits make the round
    #     boundary safe (CLAUDE.md: only git survives).
    REMAIN=${V6_SECS:-14400}
    TOTAL_SECS=$REMAIN MAX_STEPS=${V6_STEPS:-36000} \
        PRETRAIN_PIDFILE=/tmp/pretrain.pid \
        nohup bash scripts/pretrain_v6.sh > /tmp/pretrain_v6.log 2>&1 &
    sleep 5
    CKPT=checkpoints/tabica_v6.npz TRAIN_LOG=checkpoints/train_log_v6.jsonl \
        nohup bash scripts/durable_commit.sh 900 2 > /tmp/durable_v6.log 2>&1 &
    echo $! > /tmp/durable_commit.pid
    CKPT=checkpoints/tabica_v6.npz LOG=checkpoints/train_log_v6.jsonl \
        nohup bash scripts/snapshot_checkpoints.sh 2400 8 > /tmp/snap_v6.log 2>&1 &
    echo $! > /tmp/snapshot.pid
    echo "[tail] v6 pretraining launched (TOTAL_SECS=$REMAIN)"
else
    # 4b. No v6 run to fund -> spend the chip on the round-5 planning A/B.
    if [ ! -f results/train_step_pool_ab.json ]; then
        timeout 2700 python scripts/profile_train_step.py --flash off \
            --steps 25 --d_model 256 --num_heads 2 --num_layers 8 \
            --num_bars 1024 --scores_dtype bfloat16 --row_pool_slots 8 \
            --out results/train_step_pool_ab.json || true
        commit_results "On-chip step-time profile of the row-pool bottleneck (round-5 planning)"
    fi
fi
echo "[tail] done"
