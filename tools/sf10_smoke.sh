#!/bin/bash
# Second-decade scale lane (round 12, VERDICT r12 mandate #5): the
# linear-scaling story so far rests on ONE decade (sf0.1 → sf1). A
# constant can hide behind fixed overhead at sf1 — the round-11 IVF
# geometry did exactly that (2.8×/3.7× measured at 10× data while the
# asymptote was quadratic). This lane adds the sf1 → sf10 decade for
# the families where a hidden constant would hurt most:
#
#   - the iterative graph four (q99/q208/q213/q171) — frame pinning,
#     pointer-jumping, per-round exchanges;
#   - the order-statistics family (q121/q143/q148/q150/q153/q167) —
#     everything riding Stats.rangePrefixSums;
#   - the LSH/dedup pair (q15/q17) — banded keys and capped buckets;
#   - the INDEXED kNN twins (q221/q222) — the round-12 ⌈√n⌉-cell
#     geometry, whose work model is O(n^1.5·nProbe): a second decade is
#     the test that separates that from "quadratic plus small constant";
#   - (round 13, VERDICT r12 mandate #1) the near-dup IVF family
#     (q18/q100) — the three queries whose sf1 shuffle grew 2.8–3.5×
#     under the √n-cell geometry were exactly the ones this lane
#     skipped; their candidate term is O(n^1.5) with per-bucket caps,
#     so they ride the INDEXED gate. q218 itself stays excluded (its
#     exact-truth arm is n² by oracle design) — its two index arms ARE
#     q18's kernel (embeddingNearDupsIvf) and q53's (SrP banding), both
#     in the lane on the identical twin corpus shape. q53 rides the
#     LINEAR gate: SRP banding is the documented linear-candidate
#     alternative when the IVF candidate term dominates, and this lane
#     is the measurement that claim stands on.
#
# Excluded BY DESIGN: the exact all-pairs oracle twins (q73/q109/q218)
# and q223's exact-truth arm — n² by construction, 100× per decade;
# their executable scale path IS q221/q222, which this lane holds to
# the indexed gate.
#
# Gates (ratios sf10/sf1, 10× data, same cores): linear lane ≤
# RATIO_MAX (default 14 — the sf1_smoke allowance); indexed twins ≤
# INDEXED_MAX (default 40: theoretical n^1.5 is 31.6×, so 40 catches a
# quadratic — which would show ~100× — while tolerating measurement
# noise above the theoretical curve).
#
# Usage: tools/sf10_smoke.sh
#        RATIO_MAX=20 INDEXED_MAX=50 tools/sf10_smoke.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF01=${SF01:-/root/testdata/sf0.1}
SF1=${SF1:-/tmp/graft_sf1}
SF10=${SF10:-/tmp/graft_sf10}
CPUS=${CPUS:-32}
RATIO_MAX=${RATIO_MAX:-14}
INDEXED_MAX=${INDEXED_MAX:-40}
# min-of-N per query (round 13): a single pass prices whichever query
# catches the host's slow window — q17 read 14.2x on a single-pass leg
# whose sf1 half ran 1.8x slower than the same binary an hour earlier,
# then 8.8x back-to-back min-of-2; ratios of single samples compound
# both windows' noise
LANE_RUNS=${LANE_RUNS:-2}

LANE="q99_pagerank,q208_ppr,q213_hits,q171_bfs_reach,\
q121_rfm,q143_auc,q150_ks_test,q153_survival,q167_weighted_quantiles,\
q148_decile_lift,q15_minhash_lsh,q17_ngram_jaccard,q53_embedding_srp,\
q221_mutual_knn_indexed,q222_knn_agreement_indexed,\
q18_embedding_neardup,q100_semdedup"
INDEXED="q221_mutual_knn_indexed,q222_knn_agreement_indexed,\
q18_embedding_neardup,q100_semdedup"

JAVA_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  echo --add-opens=java.base/$p=ALL-UNNAMED; done)
CP="target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*"

sbt -batch -error compile >/dev/null

build() { # $1 = dir, $2 = copies
  # built = EVERY table's _SUCCESS present (round-13 ADVICE: gating on
  # embeddings alone left an interrupted build — embeddings done, later
  # tables missing — permanently "built" and the lane failing until a
  # manual delete; ScaleData writes tables in Tables.Names order, so
  # any missing _SUCCESS means rebuild)
  local complete=1 t
  for t in region nation customer supplier part orders lineitem \
      events documents embeddings; do
    [ -f "$1/$t.parquet/_SUCCESS" ] || { complete=0; break; }
  done
  if [ "$complete" -ne 1 ]; then
    echo "building $1 (${2}x $SF01)..."
    SPARK_GRAFT_CPUS=$CPUS java $JAVA_OPENS -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -Xmx24g -cp "$CP" \
      graft.tools.ScaleData "$SF01" "$1" "$2" 2>/dev/null
  fi
}
build "$SF1" 10
build "$SF10" 100

run_lane() { # $1 = sf dir, $2 = out json, $3 = heap
  SPARK_GRAFT_BENCH_ONLY="$LANE" SPARK_GRAFT_BENCH_RUNS=$LANE_RUNS \
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_OUT="$2" \
  java $JAVA_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx"$3" -cp "$CP" \
    graft.Bench 2>/dev/null >/dev/null
}

echo "lane at sf1..." ; run_lane "$SF1"  /tmp/smoke2_sf1.json  24g
echo "lane at sf10..."; run_lane "$SF10" /tmp/smoke2_sf10.json 48g

python3 - "$RATIO_MAX" "$INDEXED_MAX" "$INDEXED" <<'EOF'
import json, sys
rmax, imax = float(sys.argv[1]), float(sys.argv[2])
indexed = set(sys.argv[3].split(','))
a = json.load(open('/tmp/smoke2_sf1.json'))
b = json.load(open('/tmp/smoke2_sf10.json'))
for d, lbl in [(a, 'sf1'), (b, 'sf10')]:
    if d.get('errors'):
        sys.exit(f"FAIL: errors at {lbl}: {d['errors']}")
aq, bq = a['queries'], b['queries']
bad = []
print(f"{'query':28s} {'sf1':>8s} {'sf10':>9s} {'ratio':>7s}  "
      f"(10x data, gate {rmax}x linear / {imax}x indexed n^1.5)")
for k in sorted(aq):
    r = bq[k] / max(aq[k], 1e-9)
    gate = imax if k in indexed else rmax
    flag = ''
    if r > gate:
        bad.append((k, r, gate)); flag = '  <-- OVER GATE'
    print(f"{k:28s} {aq[k]:8.2f} {bq[k]:9.2f} {r:6.1f}x{flag}")
ta, tb = sum(aq.values()), sum(bq.values())
print(f"{'TOTAL':28s} {ta:8.2f} {tb:9.2f} {tb/ta:6.1f}x")
if bad:
    sys.exit("FAIL: " + ", ".join(f"{k} {r:.1f}x > {g}x" for k, r, g in bad))
print("OK: second decade holds — no hidden constant past sf1")
EOF
