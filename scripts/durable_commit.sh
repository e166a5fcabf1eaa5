#!/bin/bash
# Durability loop for long pretraining runs: periodically commit the live
# checkpoint (weights + optimizer state) and train log to git, so a VM
# restart cannot lose the run. Round-3 lesson: the first v4 leg reached
# step 62,400 (~6.4h of chip) with nothing but the log committed — the VM
# restarted and the weights were gone.
#
#   scripts/durable_commit.sh [log_interval_s] [ckpt_every_n_intervals]
#
# Every interval: commit the train log (tiny, doubles as a driver
# heartbeat). Every ckpt_every_n intervals: also commit the checkpoint
# files (~100 MB with Adam state at 9M params — the cadence bounds lost
# work at interval*n). Uses path-scoped `git commit -- <files>` so it can
# never sweep up unrelated staged work; retries around index.lock races.
set -u
cd "$(dirname "$0")/.."
INTERVAL=${1:-3600}
CKPT_EVERY=${2:-2}
CKPT=${CKPT:-checkpoints/tabica_v4.npz}
TRAIN_LOG=${TRAIN_LOG:-checkpoints/train_log_v4.jsonl}
TAG=$(basename "$CKPT" .npz)
echo $$ > /tmp/durable_commit.pid

tick=0
while true; do
    sleep "$INTERVAL"
    tick=$((tick + 1))
    files="$TRAIN_LOG"
    what="train log"
    if [ $((tick % CKPT_EVERY)) -eq 0 ] && [ -f "$CKPT" ]; then
        files="$files $CKPT $CKPT.json $CKPT.train_state.npz $CKPT.train_state.npz.meta.npz"
        what="checkpoint + train log"
    fi
    step=$(grep -o '"step": [0-9]*' "$TRAIN_LOG" 2>/dev/null \
        | tail -1 | grep -o '[0-9]*')
    for attempt in 1 2 3; do
        # git commit -- <paths> silently SKIPS untracked files; stage first
        # (round-3 bug: v4 weights stayed untracked through every snapshot).
        git add -- $files 2>/dev/null
        git commit -q -m "$TAG pretraining durability snapshot: $what (step ${step:-?})

No-Verification-Needed: training artifact snapshot only" -- $files 2>/dev/null && break
        # rc!=0 is either "no changes" (fine) or index.lock contention (retry)
        git status --porcelain -- $files 2>/dev/null | grep -q . || break
        sleep 15
    done
done
