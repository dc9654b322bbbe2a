#!/bin/bash
# Three-decade scale evidence (round-8 VERDICT item 6): the keys whose
# x10 ratio was >= 2.5x get one more decade — sf0.1 -> sf1 (x10) ->
# sf10 (x100, via ScaleGen) — to see whether the curve flattens
# (shuffle-bound) or compounds (plan problem). One JVM per (key, sf)
# with a hard timeout, {t, rc} per entry (rc 124 = DNF), dedicated
# output paths so nothing clobbers the reference snapshot.
set -uo pipefail
cd "$(dirname "$0")/.."

TO=${SPARK_GRAFT_SCALE_TIMEOUT:-900}
KEYS=${SPARK_GRAFT_SCALE_KEYS:-"groupby_highcard quartiles dedup_minhash dedup_simhash contamination_ngram"}
DIRS="sf01:/root/testdata/sf0.1 sf1:/root/repo/target/scratch/sf1 sf10:/root/repo/target/scratch/sf10"

# CONTRACT STAMP GATE (round-11 VERDICT item 7): every GENERATED corpus
# carries a SCALEGEN.json naming the generator text mode; a decade row
# is meaningless if it was measured against a corpus of the wrong law
# (permute vs heaps vocabulary growth differ by orders of magnitude).
# Refuse to bench a scratch dir whose stamp is absent or whose mode
# differs from the requested SPARK_GRAFT_SCALE_TEXTMODE.
WANTMODE=${SPARK_GRAFT_SCALE_TEXTMODE:-permute}
for entry in $DIRS; do
  sf=${entry#*:}
  case "$sf" in /root/testdata/*) continue;; esac   # driver-generated base data is not ScaleGen output
  stamp="$sf/SCALEGEN.json"
  if [ ! -f "$stamp" ]; then
    echo "REFUSING: $sf has no SCALEGEN.json stamp - regenerate with ScaleGen (it stamps provenance)" >&2
    exit 3
  fi
  mode=$(python3 -c "import json;print(json.load(open('$stamp'))['textmode'])" 2>/dev/null || echo UNREADABLE)
  if [ "$mode" != "$WANTMODE" ]; then
    echo "REFUSING: $sf was generated with textmode=$mode but this run requests $WANTMODE - a wrong-corpus decade row must not be recordable" >&2
    exit 3
  fi
done

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

TMP=target/scratch/bench_decades_tmp
mkdir -p target/scratch
out="{"
sep=""
for key in $KEYS; do
  for entry in $DIRS; do
    tag=${entry%%:*}
    sf=${entry#*:}
    rm -f "${TMP}_details.json"
    SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_BENCH_N=2 SPARK_GRAFT_BENCH_ONLY=$key \
      SPARK_GRAFT_BENCH_PREFIX=$TMP \
      timeout "$TO" java $ADD_OPENS -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -Xmx40g \
      -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.Bench > /dev/null 2>&1 < /dev/null
    rc=$?
    t="null"
    steal="null"
    if [ -f "${TMP}_details.json" ]; then
      t=$(python3 -c "import json;print(json.load(open('${TMP}_details.json'))['queries'].get('$key','null'))" 2>/dev/null || echo null)
      steal=$(python3 -c "import json;print(json.load(open('${TMP}_details.json'))['queries_steal'].get('$key','null'))" 2>/dev/null || echo null)
    fi
    [ "$rc" = "124" ] && t="\"DNF>${TO}s\""
    echo "$key $tag rc=$rc t=$t steal=$steal" >&2
    out="$out$sep\"${key}_${tag}\":{\"t\":$t,\"rc\":$rc,\"steal\":$steal}"
    sep=","
  done
done
out="$out}"
echo "$out" > bench_scale_decades.json
echo "wrote bench_scale_decades.json" >&2
