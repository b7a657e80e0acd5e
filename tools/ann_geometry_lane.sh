#!/bin/bash
# ANN-geometry lane (round 12, VERDICT r12 mandate #2): the q223
# index-vs-exact gauge runs on the driver's near-ISOTROPIC synthetic
# embeddings — ANN's adversarial case, where any index's recall tracks
# the scanned fraction. This lane measures the OTHER half of the IVF
# bet, on corpora graft.tools.ScaleData now plants:
#
#   1. RECALL leg — `--clustered` (32 well-separated direction
#      clusters, the IvfSelfTopKSpec fixture at corpus scale): runs
#      q223 at sf0.01-shaped and sf0.1-shaped clustered corpora and
#      prints the directed-pair recall next to the committed isotropic
#      numbers. On clustered data the same ⌈√n⌉-cell / 6-probe budget
#      must concentrate true neighbors into probed cells.
#      Gate: knn_pairs recall ≥ RECALL_MIN (default 0.95) on both.
#
#   2. GIANT-CELL leg — `--giant` (~30% of all vectors collapse into
#      cluster 0 → one dense direction region → one giant IVF cell):
#      times q221 (the ivfSelfTopK consumer) on giant vs clustered at
#      GCOPIES× sf0.1, back-to-back in one window. The cell equi-join
#      carries a genuinely heavier candidate set (~(0.3n)² pairs inside
#      the dense cell), and AQE's skew-join splitting must spread it —
#      a kernel that funnels the giant cell through one reducer shows
#      10×+ or an executor OOM.
#      Gate: zero errors AND wall ratio giant/clustered ≤ GIANT_MAX
#      (default 3).
#
# Usage: tools/ann_geometry_lane.sh
#        RECALL_MIN=0.9 GIANT_MAX=4 GCOPIES=10 tools/ann_geometry_lane.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF001=${SF001:-/root/testdata/sf0.01}
SF01=${SF01:-/root/testdata/sf0.1}
RECALL_MIN=${RECALL_MIN:-0.95}
GIANT_MAX=${GIANT_MAX:-3}
GCOPIES=${GCOPIES:-10}
CPUS=${CPUS:-32}

JAVA_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  echo --add-opens=java.base/$p=ALL-UNNAMED; done)
CP="$PWD/target/scala-2.13/classes:$PWD/src/main/resources:/opt/spark/jars/*"

sbt -batch -error compile >/dev/null

run_java() { # <xmx> <main> args...
  local XMX=$1; shift
  SPARK_GRAFT_CPUS=$CPUS java $JAVA_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx"$XMX" -cp "$CP" "$@"
}

echo "== building clustered corpora (copies=1) and giant/clustered pair (copies=$GCOPIES) =="
run_java 8g graft.tools.ScaleData "$SF001" /tmp/graft_ann_clu001 1 --clustered 2>/dev/null
run_java 8g graft.tools.ScaleData "$SF01"  /tmp/graft_ann_clu01  1 --clustered 2>/dev/null
run_java 8g graft.tools.ScaleData "$SF01"  /tmp/graft_ann_cluN  "$GCOPIES" --clustered 2>/dev/null
run_java 8g graft.tools.ScaleData "$SF01"  /tmp/graft_ann_giantN "$GCOPIES" --giant 2>/dev/null

echo "== recall leg: q223 on the clustered corpora =="
rm -rf /tmp/graft_ann_eval001 /tmp/graft_ann_eval01
run_java 8g graft.Verify /tmp/graft_ann_clu001 /tmp/graft_ann_eval001 q223 2>/dev/null
run_java 8g graft.Verify /tmp/graft_ann_clu01  /tmp/graft_ann_eval01  q223 2>/dev/null

python3 - <<PYEOF
import duckdb, sys
fail = 0
for label, d in [("clustered-sf0.01", "/tmp/graft_ann_eval001"),
                 ("clustered-sf0.1", "/tmp/graft_ann_eval01")]:
    rows = duckdb.sql(
        f"select method, n_truth, n_found, tp, precision_micro, recall_micro "
        f"from '{d}/q223_knn_index_eval/*.parquet' order by method").fetchall()
    for m, nt, nf, tp, p, r in rows:
        print(f"{label:18s} {m:14s} truth={nt:<7d} found={nf:<7d} "
              f"precision={p/1e6:.3f} recall={r/1e6:.3f}")
        if m == "knn_pairs" and r / 1e6 < float("$RECALL_MIN"):
            print(f"GATE FAIL: {label} knn_pairs recall {r/1e6:.3f} < $RECALL_MIN")
            fail = 1
sys.exit(fail)
PYEOF

echo "== giant-cell leg: q221 on giant vs clustered at ${GCOPIES}x sf0.1 =="
T_CLU=$(SPARK_GRAFT_SF_DIR=/tmp/graft_ann_cluN SPARK_GRAFT_BENCH_ONLY=q221_mutual_knn_indexed \
  run_java 24g graft.Bench 2>/dev/null | python3 -c 'import json,sys; d=json.loads(sys.stdin.readline()); print(d["queries"]["q221_mutual_knn_indexed"]); assert not d.get("errors"), d.get("errors")')
T_GIANT=$(SPARK_GRAFT_SF_DIR=/tmp/graft_ann_giantN SPARK_GRAFT_BENCH_ONLY=q221_mutual_knn_indexed \
  run_java 24g graft.Bench 2>/dev/null | python3 -c 'import json,sys; d=json.loads(sys.stdin.readline()); print(d["queries"]["q221_mutual_knn_indexed"]); assert not d.get("errors"), d.get("errors")')
echo "q221 clustered: ${T_CLU}s   giant-cell: ${T_GIANT}s"
python3 - <<PYEOF
clu, giant, mx = float("$T_CLU"), float("$T_GIANT"), float("$GIANT_MAX")
ratio = giant / max(clu, 1e-9)
print(f"giant/clustered ratio: {ratio:.2f} (gate <= {mx})")
import sys; sys.exit(0 if ratio <= mx else 1)
PYEOF
echo "== ann_geometry_lane: ALL GATES GREEN =="
