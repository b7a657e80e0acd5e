#!/bin/bash
# sf1 smoke lane (round-8, widened round-9): prove the heavy query tails
# scale, don't argue it. Builds a deterministic 10x upscale of sf0.1
# (see graft.tools.ScaleData — the workload scales linearly BY
# CONSTRUCTION, so any super-linear TIME is an engine pathology), runs
# the lane once at each scale on the same core count, and gates each
# query's ratio at RATIO_MAX (default 14: ~10x data, allowance for
# shuffle-spill and scheduling overhead at 10x).
#
# Round-9 additions:
#  - lane widened from 14 to 33 queries — the top of the sf0.1 cost
#    table (adds the ANN/PCA/retrieval families, the graph/audit tails,
#    q218/q219) so scale evidence covers every expensive family;
#  - GOLDENS=check (or =record) runs graft.Verify at sf1 for the lane
#    and compares pinned sf1 output hashes — scale runs check OUTPUT
#    drift, not just time;
#  - LOWMEM=1 re-runs the shuffle-heavy tails at sf1 under a
#    deliberately small heap (8g vs the default 24g) and asserts
#    graceful spill: zero errors, nonzero spill counters in the bench
#    JSON (the bench reports task-level memoryBytesSpilled /
#    diskBytesSpilled since round 9).
#
# Usage: tools/sf1_smoke.sh            # build-if-missing + run + gate
#        RATIO_MAX=20 tools/sf1_smoke.sh
#        GOLDENS=check tools/sf1_smoke.sh
#        LOWMEM=1 tools/sf1_smoke.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF01=${SF01:-/root/testdata/sf0.1}
SF1=${SF1:-/tmp/graft_sf1}
CPUS=${CPUS:-32}
RATIO_MAX=${RATIO_MAX:-14}
GOLDENS=${GOLDENS:-}
LOWMEM=${LOWMEM:-}

LANE="q15_minhash_lsh,q17_ngram_jaccard,q47_dedup_apply,q50_leakage_split,q170_setsim_exact,\
q99_pagerank,q208_ppr,q213_hits,q171_bfs_reach,q180_modularity,q155_triangles,q182_label_prop,\
q87_merge_components,q191_lsh_eval,q199_dedup_curve,q73_mutual_knn,q109_knn_label_agreement,\
q89_ann_pq,q91_ann_ivfpq,q92_ann_recall,q95_ann_refine,q93_bm25_retrieval,q96_retrieval_eval,\
q103_pca_spectrum,q104_pca_whiten,q105_pca_ann_recall,q218_embedding_eval,q219_civic_e2e,\
q121_rfm,q143_auc,q150_ks_test,q153_survival,q167_weighted_quantiles,q148_decile_lift,\
q221_mutual_knn_indexed,q222_knn_agreement_indexed"

# exact all-pairs relations BY ORACLE DESIGN (q73 mutual kNN, q109
# leave-one-out kNN, q218's exact-cosine truth stack): O(n^2) compute,
# so 10x data is ~100x theoretical work — holding them to the linear
# gate would flag the DESIGN, not a pathology. They get their own gate
# at RATIO_MAX_QUAD (default 40: today's measured constants are
# 10-19x, so 40 still catches a >2x engine regression while staying
# far under the n^2 ceiling). Their scale path is EXECUTABLE since
# round 11 — q221/q222 run the same semantics over the IVF-blocked
# Similarity.ivfSelfTopK kernel and are held to the LINEAR gate here.
QUAD="q73_mutual_knn,q109_knn_label_agreement,q218_embedding_eval"
RATIO_MAX_QUAD=${RATIO_MAX_QUAD:-40}

# the shuffle-heaviest subset for the constrained-heap spill proof
LOWMEM_LANE="q167_weighted_quantiles,q170_setsim_exact,q17_ngram_jaccard,q99_pagerank"

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

run_lane() { # $1 = sf dir, $2 = out json, $3 = heap, $4 = query list
  SPARK_GRAFT_BENCH_ONLY="$4" SPARK_GRAFT_BENCH_RUNS=1 \
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_OUT="$2" \
  java $JAVA_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx"$3" -cp "$CP" \
    graft.Bench 2>/dev/null >/dev/null
}

if [ -n "$GOLDENS" ]; then
  # output-drift half of the lane: Verify at sf1 on the lane queries,
  # compare (or pin with GOLDENS=record) sf1 hashes in tools/goldens.json
  echo "verify at sf1 (lane queries)..."
  SPARK_GRAFT_CPUS=$CPUS java $JAVA_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx24g -cp "$CP" \
    graft.Verify "$SF1" /tmp/verify_sf1 "$LANE" 2>/dev/null
  FLAG=""
  [ "$GOLDENS" = "record" ] && FLAG="--record"
  python3 tools/check_goldens.py /tmp/verify_sf1 sf1 $FLAG --only="$LANE"
  exit $?
fi

if [ -n "$LOWMEM" ]; then
  LOWMEM_HEAP=${LOWMEM_HEAP:-8g}
  echo "constrained-heap lane at sf1 (-Xmx${LOWMEM_HEAP}, ${LOWMEM_LANE})..."
  run_lane "$SF1" /tmp/smoke_sf1_lowmem.json "$LOWMEM_HEAP" "$LOWMEM_LANE"
  python3 - <<'EOF'
import json, sys
d = json.load(open('/tmp/smoke_sf1_lowmem.json'))
spill = d.get('spill', {})
errs = d.get('errors', {})
print(f"queries: { {k: round(v,2) for k,v in d['queries'].items()} }")
print(f"spill:   {spill}")
if errs:
    sys.exit(f"FAIL: errors under constrained heap: {errs}")
if any(v <= 0 for v in d['queries'].values()):
    sys.exit("FAIL: a lane query produced no successful run under 8g")
print("OK: zero errors under the constrained heap at sf1 "
      + ("(with spill engaged)" if spill.get('memBytes', 0) > 0 else
         "(no spill was even needed)"))
EOF
  exit $?
fi

echo "lane at sf0.1..."; run_lane "$SF01" /tmp/smoke_sf01.json 24g "$LANE"
echo "lane at sf1..." ; run_lane "$SF1"  /tmp/smoke_sf1.json  24g "$LANE"

python3 - "$RATIO_MAX" "$RATIO_MAX_QUAD" "$QUAD" <<'EOF'
import json, sys
rmax, rmax_quad = float(sys.argv[1]), float(sys.argv[2])
quad = set(sys.argv[3].split(','))
a = json.load(open('/tmp/smoke_sf01.json'))['queries']
b = json.load(open('/tmp/smoke_sf1.json'))['queries']
bad = []
print(f"{'query':28s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}  "
      f"(10x data, gate {rmax}x linear / {rmax_quad}x oracle-design n^2)")
for k in sorted(a):
    if a[k] <= 0 or k not in b or b[k] <= 0:
        bad.append((k, 'missing/error')); continue
    r = b[k] / a[k]
    gate = rmax_quad if k in quad else rmax
    tag = ' [n^2-by-design]' if k in quad else ''
    flag = '  << OVER GATE' if r > gate else ''
    if r > gate: bad.append((k, f'{r:.1f}x'))
    print(f"{k:28s} {a[k]:8.2f} {b[k]:8.2f} {r:6.1f}x{tag}{flag}")
ta, tb = sum(a.values()), sum(v for v in b.values() if v > 0)
print(f"\nlane total: {ta:.1f}s -> {tb:.1f}s ({tb/ta:.1f}x)")
if bad:
    sys.exit(f"FAIL: {bad}")
print("OK: every lane query within its scaling gate")
EOF
