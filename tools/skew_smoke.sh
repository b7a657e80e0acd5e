#!/bin/bash
# Planted-skew lane (round 10): real 100 TB corpora are Zipfian, and
# AQE's skew-join splitting does NOT rescue hash aggregations or
# iterative-join hot keys. graft.tools.ScaleData --skew plants a hot
# key carrying 10% of every fact table (one customer on 10% of orders,
# one part family in 10% of baskets, one user with 10% of events, one
# text on 10% of documents), and this lane runs the kernels most
# exposed to it — the iterative graph four, exact/dedup CC with a giant
# component, the LSH bucket caps against a giant duplicate cluster, and
# the salted join at its design load — at sf1-skew vs plain sf1,
# back-to-back in one window.
#
# Gate: zero errors at sf1-skew AND per-query wall ratio skew/plain
# <= SKEW_MAX (default 3: the hot task holds 10% of the data vs ~3%
# for a uniform 1/32 task, so a healthy kernel's worst stage straggles
# ~3x; a kernel that FALLS OVER on the hot key shows 10x+ or an error).
#
# Round-11 ADVERSARIAL mode (MODE=zipf): the 10%-single-hot-key plant
# is the friendly version — AQE's skew-join splitting can handle ONE
# oversized partition, and one hot key hits one reducer. ScaleData
# --skew2 plants instead:
#   - a full Zipf(s≈1) law over the WHOLE o_custkey / l_partkey /
#     user_id domains (many medium-hot keys landing in a few hash
#     partitions together — unsplittable for hash AGGREGATES);
#   - a point mass in the VALUE domain (one cents value on 10% of
#     l_extendedprice — one giant histogram bucket for the
#     rangePrefixSums order-statistics family, q36/q142/q149/q167);
#   - one hot TOKEN in 10% of documents across ALL copies (a corpus-
#     spanning posting list for q93 BM25 / q96).
# and the lane swaps to the consumers of those domains.
#
# Usage: tools/skew_smoke.sh               # round-10 hot-key plant
#        MODE=zipf tools/skew_smoke.sh     # round-11 adversarial plant
#        SKEW_MAX=4 RUNS=2 tools/skew_smoke.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF01=${SF01:-/root/testdata/sf0.1}
SF1=${SF1:-/tmp/graft_sf1}
CPUS=${CPUS:-32}
RUNS=${RUNS:-1}
SKEW_MAX=${SKEW_MAX:-3}
MODE=${MODE:-hotkey}

if [ "$MODE" = "zipf" ]; then
  SKEWDIR=${SKEWDIR:-/tmp/graft_sf1_zipf}
  SKEWFLAG="--skew2"
  LANE="q99_pagerank,q208_ppr,q213_hits,q171_bfs_reach,\
q186_cc_exact,q134_salted_join,\
q36_percentile,q142_exact_quantiles,q149_cont_quantiles,\
q167_weighted_quantiles,q148_decile_lift,q121_rfm,\
q93_bm25_retrieval,q96_retrieval_eval"
else
  SKEWDIR=${SKEWDIR:-/tmp/graft_sf1_skew}
  SKEWFLAG="--skew"
  LANE="q99_pagerank,q208_ppr,q213_hits,q171_bfs_reach,\
q186_cc_exact,q87_merge_components,q47_dedup_apply,q50_leakage_split,\
q15_minhash_lsh,q134_salted_join"
fi

JAVA_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  echo --add-opens=java.base/$p=ALL-UNNAMED; done)
CP="target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*"

sbt -batch -error compile >/dev/null

build() { # $1 = outDir, $2 = extra flag
  if [ ! -d "$1" ]; then
    echo "building $1 (10x of $SF01 $2)"
    SPARK_GRAFT_CPUS="$CPUS" java $JAVA_OPENS -Xmx24g -cp "$CP" \
      graft.tools.ScaleData "$SF01" "$1" 10 $2 2>/dev/null
  fi
}
build "$SF1" ""
build "$SKEWDIR" "$SKEWFLAG"

bench() { # $1 = sf dir, $2 = out json
  SPARK_GRAFT_BENCH_ONLY="$LANE" SPARK_GRAFT_BENCH_RUNS="$RUNS" \
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_BENCH_OUT="$2" \
  java $JAVA_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx24g -cp "$CP" \
    graft.Bench 2>/dev/null >/dev/null
}
bench "$SF1" /tmp/skew_base.json
bench "$SKEWDIR" /tmp/skew_hot.json

python3 - "$SKEW_MAX" <<'EOF'
import json, sys
mx = float(sys.argv[1])
b = json.load(open('/tmp/skew_base.json'))
h = json.load(open('/tmp/skew_hot.json'))
bad = []
print(f"{'query':28s} {'sf1':>8s} {'sf1-skew':>9s} {'ratio':>7s}")
for k in sorted(b['queries']):
    tb, th = b['queries'][k], h['queries'].get(k, -1)
    if tb <= 0 or th <= 0:
        print(f"{k:28s} {tb:>8} {th:>9}  ERROR"); bad.append(k); continue
    r = th / tb
    flag = ' <-- OVER' if r > mx else ''
    print(f"{k:28s} {tb:8.2f} {th:9.2f} {r:6.2f}x{flag}")
    if r > mx: bad.append(k)
for side, j in (('sf1', b), ('sf1-skew', h)):
    errs = j.get('errors') or []
    if errs: print(f"{side} errors: {errs}"); bad.append(side)
if bad:
    print(f"\nSKEW LANE FAILED: {bad}"); sys.exit(1)
print(f"\nSKEW LANE OK (all ratios <= {mx}x, zero errors)")
EOF
