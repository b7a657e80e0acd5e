#!/bin/bash
# Third verification decade for the indexed kNN twins (round 13,
# VERDICT r12 mandate #3): the sf1→sf10 decade measured q221/q222 at
# 10.3×/30.7× — on the O(n^1.5) curve (theoretical 31.6×), but q222
# sat just under the 40× gate, and one decade cannot separate "n^1.5
# with noise" from "n^1.5 plus a creeping constant". This lane adds a
# 3× step past sf10 (the verdict's endorsed shape: sf10 → sf30), where
# the theory lines are cleanly separated:
#
#   linear      3.0×
#   n^1.5       5.2×     ← the model
#   quadratic   9.0×
#
# Gate: ratio ≤ STEP_MAX (default 7 — above the n^1.5 line's 5.2×
# with measurement headroom, below quadratic's 9×).
#
# The twins read ONLY the embeddings table, so the corpora are built
# with ScaleData --tables=region,embeddings (region feeds Bench's
# untimed warmup): 600k vectors at sf30 instead of scaling 180M
# lineitem rows nobody reads. Dedicated dirs (not /tmp/graft_sf10) so
# the lane is self-contained and the build is minutes, not an hour.
#
# Usage: tools/sf30_knn_lane.sh
#        STEP_MAX=8 tools/sf30_knn_lane.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF01=${SF01:-/root/testdata/sf0.1}
D10=${D10:-/tmp/graft_knn_sf10}
D30=${D30:-/tmp/graft_knn_sf30}
CPUS=${CPUS:-32}
STEP_MAX=${STEP_MAX:-7}
TWINS="q221_mutual_knn_indexed,q222_knn_agreement_indexed"

JAVA_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  echo --add-opens=java.base/$p=ALL-UNNAMED; done)
CP="target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*"

sbt -batch -error compile >/dev/null

build() { # $1 = dir, $2 = copies
  local complete=1 t
  for t in region embeddings; do
    [ -f "$1/$t.parquet/_SUCCESS" ] || { complete=0; break; }
  done
  if [ "$complete" -ne 1 ]; then
    echo "building $1 (${2}x $SF01 embeddings)..."
    SPARK_GRAFT_CPUS=$CPUS java $JAVA_OPENS -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -Xmx16g -cp "$CP" \
      graft.tools.ScaleData "$SF01" "$1" "$2" \
      --tables=region,embeddings 2>/dev/null
  fi
}
build "$D10" 100
build "$D30" 300

run_lane() { # $1 = sf dir, $2 = out json, $3 = heap
  SPARK_GRAFT_BENCH_ONLY="$TWINS" SPARK_GRAFT_BENCH_RUNS=1 \
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_OUT="$2" \
  java $JAVA_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx"$3" -cp "$CP" \
    graft.Bench 2>/dev/null >/dev/null
}

echo "twins at sf10 (200k vectors)..."; run_lane "$D10" /tmp/knn3_sf10.json 32g
echo "twins at sf30 (600k vectors)..."; run_lane "$D30" /tmp/knn3_sf30.json 48g

python3 - "$STEP_MAX" <<'EOF'
import json, sys
mx = float(sys.argv[1])
a = json.load(open('/tmp/knn3_sf10.json'))
b = json.load(open('/tmp/knn3_sf30.json'))
for d, lbl in [(a, 'sf10'), (b, 'sf30')]:
    if d.get('errors'):
        sys.exit(f"FAIL: errors at {lbl}: {d['errors']}")
aq, bq = a['queries'], b['queries']
bad = []
print(f"{'query':28s} {'sf10':>8s} {'sf30':>9s} {'ratio':>7s}  "
      f"(3x data: linear 3.0x / n^1.5 5.2x / quadratic 9.0x; gate {mx}x)")
for k in sorted(aq):
    r = bq[k] / max(aq[k], 1e-9)
    flag = ''
    if r > mx:
        bad.append((k, r)); flag = '  <-- OVER GATE'
    print(f"{k:28s} {aq[k]:8.2f} {bq[k]:9.2f} {r:6.1f}x{flag}")
if bad:
    sys.exit("FAIL: " + ", ".join(f"{k} {r:.1f}x > {mx}x" for k, r in bad))
print("OK: third decade step on the n^1.5 curve — no creeping constant")
EOF
