#!/bin/bash
# Third scale decade-step for the PREFILTERED embedding near-dup family
# (round 14, VERDICT r13 mandate #3). Round 13's prefilter gave
# q18/q100/q53 a clean second decade (4.6–4.8×/decade at sf1→sf10,
# zero spill) — but the prefilter's own work model says the in-stage
# O(n^1.5) popcount term does NOT yet dominate at sf10; the decade
# where it does is what the 40× gate is armed for. This lane takes the
# 3× step past sf10 (the sf30_knn_lane recipe), where the theory lines
# separate cleanly:
#
#   linear      3.0×   ← q53's model (SRP banding: bounded buckets,
#                        candidate volume tracks the true pair set)
#   n^1.5       5.2×   ← q18/q100's model (IVF: n·C assignment +
#                        in-cell popcount at C = ⌈√n⌉)
#   quadratic   9.0×
#
# Gates: q18/q100 ≤ GATE_IVF (default 7 — n^1.5's 5.2× plus headroom,
# below quadratic's 9×); q53 ≤ GATE_LINEAR (default 4 — linear's 3×
# plus the same headroom).
#
# Reuses sf30_knn_lane.sh's embeddings-only corpora (the kernels read
# only the embeddings table; the in-query twin-planting doubles n, so
# sf10 = 400k rows scored, sf30 = 1.2M).
#
# Usage: tools/sf30_neardup_lane.sh
#        GATE_IVF=8 GATE_LINEAR=5 tools/sf30_neardup_lane.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF01=${SF01:-/root/testdata/sf0.1}
D10=${D10:-/tmp/graft_knn_sf10}
D30=${D30:-/tmp/graft_knn_sf30}
CPUS=${CPUS:-32}
GATE_IVF=${GATE_IVF:-7}
GATE_LINEAR=${GATE_LINEAR:-4}
LANE_RUNS=${LANE_RUNS:-2}
LANE="q18_embedding_neardup,q100_semdedup,q53_embedding_srp"

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
  SPARK_GRAFT_BENCH_ONLY="$LANE" SPARK_GRAFT_BENCH_RUNS=$LANE_RUNS \
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_OUT="$2" \
  java $JAVA_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx"$3" -cp "$CP" \
    graft.Bench 2>/dev/null >/dev/null
}

echo "near-dup family at sf10 (400k scored vectors, min-of-$LANE_RUNS)..."
run_lane "$D10" /tmp/neardup3_sf10.json 32g
echo "near-dup family at sf30 (1.2M scored vectors, min-of-$LANE_RUNS)..."
run_lane "$D30" /tmp/neardup3_sf30.json 48g

python3 - "$GATE_IVF" "$GATE_LINEAR" <<'EOF'
import json, sys
g_ivf, g_lin = float(sys.argv[1]), float(sys.argv[2])
a = json.load(open('/tmp/neardup3_sf10.json'))
b = json.load(open('/tmp/neardup3_sf30.json'))
for d, lbl in [(a, 'sf10'), (b, 'sf30')]:
    if d.get('errors'):
        sys.exit(f"FAIL: errors at {lbl}: {d['errors']}")
    sp = d.get('spill', {})
    print(f"{lbl}: spill mem={sp.get('memBytes', 0)} disk={sp.get('diskBytes', 0)}")
gates = {'q18_embedding_neardup': g_ivf, 'q100_semdedup': g_ivf,
         'q53_embedding_srp': g_lin}
aq, bq = a['queries'], b['queries']
bad = []
print(f"{'query':26s} {'sf10':>8s} {'sf30':>9s} {'ratio':>7s} {'gate':>6s}  "
      f"(3x data: linear 3.0x / n^1.5 5.2x / quadratic 9.0x)")
for k in sorted(aq):
    r = bq[k] / max(aq[k], 1e-9)
    mx = gates[k]
    flag = ''
    if r > mx:
        bad.append((k, r, mx)); flag = '  <-- OVER GATE'
    print(f"{k:26s} {aq[k]:8.2f} {bq[k]:9.2f} {r:6.1f}x {mx:5.1f}x{flag}")
if bad:
    sys.exit("FAIL: " + ", ".join(f"{k} {r:.1f}x > {mx}x" for k, r, mx in bad))
print("OK: third decade-step — the prefiltered family holds its work "
      "model where the popcount term starts to matter")
EOF
