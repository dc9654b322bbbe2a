#!/bin/bash
# Retry dev/bench.sh until a VALID capture lands (the box runs hour-long
# host-steal storms; the bench refuses to start in one and self-stamps
# invalid if one begins mid-run). Usage:
#   SPARK_GRAFT_BENCH_PREFIX=bench_r17_pre dev/bench_retry.sh [max_attempts]
set -u
cd "$(dirname "$0")/.."
PREFIX=${SPARK_GRAFT_BENCH_PREFIX:-bench}
MAX=${1:-40}
for i in $(seq 1 "$MAX"); do
  echo "[bench_retry] attempt $i/$MAX at $(date -u +%H:%M:%S)" >&2
  if dev/bench.sh; then
    if python3 -c "
import json,sys
d=json.load(open('${PREFIX}_details.json'))
sys.exit(0 if d.get('invalid') is False else 1)
"; then
      echo "[bench_retry] VALID capture at attempt $i" >&2
      exit 0
    fi
    echo "[bench_retry] capture stamped invalid; retrying" >&2
  fi
  sleep 180
done
echo "[bench_retry] no valid capture after $MAX attempts" >&2
exit 1
