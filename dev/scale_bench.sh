#!/bin/bash
# Scale-evidence run (VERDICT round-5 item 5): generate a ×10 replica of
# sf0.1 (key-offset decorrelated — see graft.tools.ScaleGen) and bench
# the headliners + the DistributedSelect/LSH families at both scales on
# a quiet box. Usage: dev/scale_bench.sh [copies]
set -euo pipefail
cd "$(dirname "$0")/.."

COPIES=${1:-10}
SF1=/root/repo/target/scratch/sf1
KEYS="q1_pricing_summary,q3_shipping_priority,top_k,window_rank,stream_tumbling,sim_search,median,join_bucketed,dedup_exact,groupby_agg,ntile_global,quartiles,sort,groupby_highcard,join_asof_native,embed_neardup,dedup_minhash,dedup_simhash,sim_search_ann,sim_search_ivf,map_overlap"

LOAD=$(awk '{print int($1)}' /proc/loadavg)
if [ "$LOAD" -gt 2 ] && [ "${SPARK_GRAFT_BENCH_FORCE:-}" != "1" ]; then
  echo "refusing: load average $LOAD > 2 (set SPARK_GRAFT_BENCH_FORCE=1 to override)" >&2
  exit 3
fi

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JAVA="java $ADD_OPENS -Dspark.ui.enabled=false -Xmx48g -cp target/scala-2.13/classes:/opt/spark/jars/*"

if [ ! -d "$SF1/lineitem.parquet" ]; then
  echo "== generating $SF1 (x$COPIES of sf0.1)"
  SPARK_GRAFT_SCALE_COPIES=$COPIES SPARK_GRAFT_SCALE_OUT=$SF1 $JAVA graft.tools.ScaleGen
fi

# Dedicated output prefixes: a scale run must NEVER clobber the
# committed reference snapshot at bench_details.json/bench_summary.json
# (round-7 ADVICE: a one-key leftover overwrote the 148-query evidence).
echo "== bench sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_N=2 \
  SPARK_GRAFT_BENCH_PREFIX=bench_scale_sf01 \
  SPARK_GRAFT_BENCH_ONLY="$KEYS" $JAVA graft.Bench

echo "== bench sf1"
SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_BENCH_N=2 \
  SPARK_GRAFT_BENCH_PREFIX=bench_scale_sf1 \
  SPARK_GRAFT_BENCH_ONLY="$KEYS" $JAVA graft.Bench

python3 - <<'EOF'
import json
a = json.load(open('bench_scale_sf01_details.json'))['queries']
b = json.load(open('bench_scale_sf1_details.json'))['queries']
print(f"{'query':24s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>6s}")
for k in sorted(a):
    if k in b:
        print(f"{k:24s} {a[k]:8.3f} {b[k]:8.3f} {b[k]/a[k]:6.1f}x")
EOF
