#!/bin/bash
# Generic stall watchdog: run a command, restart it if its log goes quiet.
#
#   scripts/run_with_watchdog.sh LOGFILE STALL_SECS TOTAL_SECS -- cmd args...
#
# The remote TPU compile service can silently drop requests (a run then hangs
# at a compile forever); scripts with incremental saves + a persistent
# compile cache lose almost nothing on restart, so restarting on stall is
# strictly better than burning the stage timeout. Same pattern as
# scripts/pretrain_watchdog.sh, generalized.
set -u
LOG=$1; STALL_SECS=$2; TOTAL_SECS=$3; shift 3
[ "$1" = "--" ] && shift
DEADLINE=$(( $(date +%s) + TOTAL_SECS ))

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    "$@" >> "$LOG" 2>&1 &
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
            exit 124
        fi
    done
    wait "$PID" 2>/dev/null
    RC=$?
    echo "[watchdog] command exited rc=$RC" >> "$LOG"
    if [ "$RC" -eq 0 ]; then
        exit 0
    fi
    sleep 20
done
exit 124
