#!/bin/bash
# Learning-curve watcher for the v5 run: whenever the snapshotter drops a
# new checkpoint, score it against the exact family-C conditional shapes
# on CPU (scripts/probe_family_c.py — never touches the TPU) and commit
# the appended curve. The committed results/probe_family_c.jsonl then
# traces whether the enriched prior is actually teaching the shapes the
# round-4 diagnosis demanded, independent of val NLL.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/probe_watch.pid
SEEN=/tmp/probe_watch_seen
touch "$SEEN"

while true; do
    for snap in checkpoints/snapshots/tabica_v5_s*.npz; do
        [ -f "$snap" ] || continue
        grep -qxF "$snap" "$SEEN" && continue
        echo "[probe_watch] probing $snap"
        JAX_PLATFORMS=cpu PYTHONPATH=. timeout 1500 python \
            scripts/probe_family_c.py --ckpt "$snap" \
            --num_tasks 12 --ctx 512 >> /tmp/probe_watch.log 2>&1 \
            && echo "$snap" >> "$SEEN" \
            || echo "[probe_watch] probe failed for $snap" >> /tmp/probe_watch.log
        git add results/probe_family_c.jsonl 2>/dev/null
        git commit -q -m "Family-C probe curve: $(basename "$snap")

No-Verification-Needed: measurement artifact only" \
            -- results/probe_family_c.jsonl 2>/dev/null || true
    done
    sleep 180
done
