#!/bin/bash
# sf1 smoke lane (round-8): prove the heavy query tails scale, don't
# argue it. Builds a deterministic 10x upscale of sf0.1 (see
# graft.tools.ScaleData — the workload scales linearly BY CONSTRUCTION,
# so any super-linear TIME is an engine pathology), runs the
# dedup/graph/order-stats lanes once at each scale on the same core
# count, and gates each query's ratio at RATIO_MAX (default 14: ~10x
# data, allowance for shuffle-spill and scheduling overhead at 10x).
#
# Usage: tools/sf1_smoke.sh            # build-if-missing + run + gate
#        RATIO_MAX=20 tools/sf1_smoke.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF01=${SF01:-/root/testdata/sf0.1}
SF1=${SF1:-/tmp/graft_sf1}
CPUS=${CPUS:-32}
RATIO_MAX=${RATIO_MAX:-14}

LANE="q15_minhash_lsh,q17_ngram_jaccard,q47_dedup_apply,q50_leakage_split,q170_setsim_exact,\
q99_pagerank,q208_ppr,q213_hits,\
q121_rfm,q143_auc,q150_ks_test,q153_survival,q167_weighted_quantiles,q148_decile_lift"

JAVA_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  echo --add-opens=java.base/$p=ALL-UNNAMED; done)
CP="target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*"

sbt -batch compile >/dev/null

if [ ! -f "$SF1/embeddings.parquet/_SUCCESS" ]; then
  echo "building $SF1 (10x $SF01)..."
  SPARK_GRAFT_CPUS=$CPUS java $JAVA_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx12g -cp "$CP" \
    graft.tools.ScaleData "$SF01" "$SF1" 10 2>/dev/null
fi

run_lane() { # $1 = sf dir, $2 = out json
  SPARK_GRAFT_BENCH_ONLY="$LANE" SPARK_GRAFT_BENCH_RUNS=1 \
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_OUT="$2" \
  java $JAVA_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx24g -cp "$CP" \
    graft.Bench 2>/dev/null >/dev/null
}

echo "lane at sf0.1..."; run_lane "$SF01" /tmp/smoke_sf01.json
echo "lane at sf1..." ; run_lane "$SF1"  /tmp/smoke_sf1.json

python3 - "$RATIO_MAX" <<'EOF'
import json, sys
rmax = float(sys.argv[1])
a = json.load(open('/tmp/smoke_sf01.json'))['queries']
b = json.load(open('/tmp/smoke_sf1.json'))['queries']
bad = []
print(f"{'query':28s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}  (10x data, gate {rmax}x)")
for k in sorted(a):
    if a[k] <= 0 or k not in b or b[k] <= 0:
        bad.append((k, 'missing/error')); continue
    r = b[k] / a[k]
    flag = '  << SUPER-LINEAR' if r > rmax else ''
    if r > rmax: bad.append((k, f'{r:.1f}x'))
    print(f"{k:28s} {a[k]:8.2f} {b[k]:8.2f} {r:6.1f}x{flag}")
ta, tb = sum(a.values()), sum(v for v in b.values() if v > 0)
print(f"\nlane total: {ta:.1f}s -> {tb:.1f}s ({tb/ta:.1f}x)")
if bad:
    sys.exit(f"FAIL: {bad}")
print("OK: every lane query within the linear-scaling gate")
EOF
