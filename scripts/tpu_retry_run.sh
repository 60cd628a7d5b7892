#!/bin/sh
# Run a TPU script with bounded retries: the tunnel intermittently
# hangs fresh processes on a startup RPC (observed 2026-08-20, round
# 5); `timeout` kills the EXACT child pid (never pattern-kills).
# Usage: tpu_retry_run.sh <timeout_s> <log> <cmd...>
T="$1"; LOG="$2"; shift 2
for attempt in 1 2 3 4; do
    echo "# attempt $attempt: $*" >> "$LOG"
    timeout "$T" "$@" >> "$LOG" 2>&1
    rc=$?
    if [ "$rc" -ne 124 ] && [ "$rc" -ne 137 ]; then
        echo "# attempt $attempt exit $rc" >> "$LOG"
        exit "$rc"
    fi
    echo "# attempt $attempt timed out (${T}s); retrying in 60s" >> "$LOG"
    sleep 60
done
echo "# giving up after 4 attempts" >> "$LOG"
exit 1
