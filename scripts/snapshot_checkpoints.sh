#!/bin/bash
# Periodically snapshot the live pretraining checkpoint so a post-hoc
# weight-average (SWA) candidate can be built at gate time.
#
#   scripts/snapshot_checkpoints.sh [interval_s] [max_keep]
#
# Copies checkpoints/tabica_v4.npz -> checkpoints/snapshots/tabica_v4_s<step>.npz
# whenever the step advances; keeps the newest max_keep snapshots. Pure
# host-side file copies — never touches the TPU.
set -u
cd "$(dirname "$0")/.."
INTERVAL=${1:-3600}
KEEP=${2:-6}
CKPT=${CKPT:-checkpoints/tabica_v4.npz}
LOG=${LOG:-checkpoints/train_log_v4.jsonl}
TAG=$(basename "$CKPT" .npz)
OUT=checkpoints/snapshots
mkdir -p "$OUT"
echo $$ > /tmp/snapshot.pid

while true; do
    if [ -f "$CKPT" ] && [ -f "$LOG" ]; then
        step=$(grep -o '"step": [0-9]*' "$LOG" | tail -1 | grep -o '[0-9]*')
        dst="$OUT/${TAG}_s${step}.npz"
        if [ -n "$step" ] && [ ! -f "$dst" ]; then
            cp "$CKPT" "$dst.tmp" && mv "$dst.tmp" "$dst"
            # config sidecar: checkpoint.load(path) requires path+".json"
            [ -f "$CKPT.json" ] && cp "$CKPT.json" "$dst.json"
            echo "[snapshot] $dst"
            # prune oldest beyond KEEP (by step number, numeric sort)
            ls "$OUT"/${TAG}_s*.npz 2>/dev/null \
                | sort -t_ -k3 -V | head -n -"$KEEP" | xargs -r rm -f
        fi
    fi
    sleep "$INTERVAL"
done
