#!/bin/bash
# Per-key scale bench: one JVM per (key, sf) pair so a single
# blowing-up key cannot take down the whole run, with a hard timeout
# that converts "never finishes at sf1" into a recorded DNF — itself
# scale evidence. Produces bench_scale_perkey.json.
set -uo pipefail
cd "$(dirname "$0")/.."

SF1=/root/repo/target/scratch/sf1
TO=${SPARK_GRAFT_SCALE_TIMEOUT:-420}
KEYS=${SPARK_GRAFT_SCALE_KEYS:-"dedup_exact dedup_minhash dedup_simhash embed_neardup groupby_agg groupby_highcard join_asof_native join_bucketed map_overlap median ntile_global q1_pricing_summary q3_shipping_priority quartiles sim_search sim_search_ann sim_search_ivf sort stream_tumbling top_k window_rank"}

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

# Scratch output prefix: a per-key probe must never clobber the
# committed reference snapshot (bench_details.json). Each entry records
# BOTH the time and the exit code, so a crashed run (rc!=0) is
# distinguishable from "not measured" in the committed evidence.
TMP=target/scratch/bench_perkey_tmp
mkdir -p target/scratch
out="{"
sep=""
for key in $KEYS; do
  for sf in /root/testdata/sf0.1 $SF1; do
    tag=$( [ "$sf" = "$SF1" ] && echo sf1 || echo sf01 )
    rm -f "${TMP}_details.json"
    SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_BENCH_N=2 SPARK_GRAFT_BENCH_ONLY=$key \
      SPARK_GRAFT_BENCH_PREFIX=$TMP \
      timeout "$TO" java $ADD_OPENS -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -Xmx48g \
      -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.Bench > /dev/null 2>&1 < /dev/null
    rc=$?
    t="null"
    if [ -f "${TMP}_details.json" ]; then
      t=$(python3 -c "import json;print(json.load(open('${TMP}_details.json'))['queries'].get('$key','null'))" 2>/dev/null || echo null)
    fi
    [ "$rc" = "124" ] && t="\"DNF>${TO}s\""
    echo "$key $tag rc=$rc t=$t" >&2
    out="$out$sep\"${key}_${tag}\":{\"t\":$t,\"rc\":$rc}"
    sep=","
  done
done
out="$out}"
echo "$out" > bench_scale_perkey.json
echo "wrote bench_scale_perkey.json" >&2
