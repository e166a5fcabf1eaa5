#!/bin/bash
# Watchdog for TPU pretraining: the remote compile service is flaky (requests
# can be silently lost), so restart the run if the log stalls. Resume is safe:
# checkpoints are atomic and carry optimizer state.
set -u
cd "$(dirname "$0")/.."
LOG=checkpoints/pretrain_stdout.log
STALL_SECS=${STALL_SECS:-600}
DEADLINE=$(( $(date +%s) + ${TOTAL_SECS:-9000} ))
# Record our PID so round2_tpu_queue.sh (and humans) can wait for the chip
# without process-pattern matching.
echo $$ > "${PRETRAIN_PIDFILE:-/tmp/pretrain.pid}"

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    python scripts/pretrain_tabica.py "$@" >> "$LOG" 2>&1 &
    PID=$!
    while kill -0 "$PID" 2>/dev/null; do
        sleep 60
        NOW=$(date +%s)
        MTIME=$(stat -c %Y "$LOG" 2>/dev/null || echo "$NOW")
        if [ $((NOW - MTIME)) -gt "$STALL_SECS" ]; then
            echo "[watchdog] log stalled $((NOW - MTIME))s — restarting" >> "$LOG"
            kill "$PID" 2>/dev/null
            sleep 30
            break
        fi
        if [ "$NOW" -gt "$DEADLINE" ]; then
            echo "[watchdog] total time limit — stopping" >> "$LOG"
            kill "$PID" 2>/dev/null
            exit 0
        fi
    done
    wait "$PID" 2>/dev/null
    RC=$?
    echo "[watchdog] trainer exited rc=$RC" >> "$LOG"
    if [ "$RC" -eq 0 ]; then
        exit 0
    fi
    sleep 20
done
