#!/bin/bash
# Text near-dup decade lane: q17 (char-6 LSH + exact verify) vs its two
# round-14 scale levers, measured sf1 → sf10 on documents-only corpora
# (round 14, VERDICT r13 mandate #4 — "retire the q17 char-gram
# constant"). q17 was the heaviest linear-family query at every decade
# (9.1×/decade at r13, the worst of the ≤14× lane); round 14 adds:
#
#   1. the EXACT Jaccard length filter inside the candidate explode
#      (Dedup.sizeFilteredBucketPairs — tau·max(|A|,|B|) ≤ min proves
#      j < tau, so the pair set is unchanged BY ARITHMETIC; it prunes
#      candidates before the dedup exchange and the per-pair verify,
#      which is where saturated char-gram buckets spend their decade);
#   2. q225 — the same semantics via the lossless PPJoin prefix filter
#      (SetSimilarity.jaccardJoinExact over char-6 shingles): the
#      exact-COMPLETE audit of q17's banding recall.
#
# The lane's first full run taught where each lever lives (recorded in
# BASELINE.md round 14): at tau = 0.6 over ~290-gram char-6 sets the
# PPJoin prefix is 40% of every doc's grams, so the prefix join is
# structurally weak at THIS threshold — q225 priced 570 s at sf1
# against q17's 10 s. The prefix filter pays at dedup-grade thresholds
# (q170's word-3 lane: 2.6x/decade at the same tau over ~50-gram sets)
# and as the completeness AUDIT; the scale path for char-6/tau-0.6 IS
# the banding + in-explode length filter. So: q15/q17 run both decades
# under the linear gate; q225 is priced at sf1 only (P225_SF1=0 skips
# it), recorded without a gate — its graded correctness lives at
# sf0.01/sf0.1 where the DuckDB brute force oracles it.
#
# Usage: tools/sf10_text_lane.sh
#        RATIO_MAX=20 LANE_RUNS=3 P225_SF1=0 tools/sf10_text_lane.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF01=${SF01:-/root/testdata/sf0.1}
D1=${D1:-/tmp/graft_text_sf1}
D10=${D10:-/tmp/graft_text_sf10}
CPUS=${CPUS:-32}
RATIO_MAX=${RATIO_MAX:-14}
LANE_RUNS=${LANE_RUNS:-2}
P225_SF1=${P225_SF1:-1}
LANE="q15_minhash_lsh,q17_ngram_jaccard"

JAVA_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  echo --add-opens=java.base/$p=ALL-UNNAMED; done)
CP="target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*"

sbt -batch -error compile >/dev/null

build() { # $1 = dir, $2 = copies
  local complete=1 t
  for t in region documents; do
    [ -f "$1/$t.parquet/_SUCCESS" ] || { complete=0; break; }
  done
  if [ "$complete" -ne 1 ]; then
    echo "building $1 (${2}x $SF01 documents)..."
    SPARK_GRAFT_CPUS=$CPUS java $JAVA_OPENS -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -Xmx16g -cp "$CP" \
      graft.tools.ScaleData "$SF01" "$1" "$2" \
      --tables=region,documents 2>/dev/null
  fi
}
build "$D1" 10
build "$D10" 100

run_lane() { # $1 = sf dir, $2 = out json, $3 = heap
  SPARK_GRAFT_BENCH_ONLY="$LANE" SPARK_GRAFT_BENCH_RUNS=$LANE_RUNS \
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_OUT="$2" \
  java $JAVA_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx"$3" -cp "$CP" \
    graft.Bench 2>/dev/null >/dev/null
}

echo "text lane at sf1 (50k docs + planted dups, min-of-$LANE_RUNS)..."
run_lane "$D1" /tmp/text_sf1.json 24g
echo "text lane at sf10 (500k docs + planted dups, min-of-$LANE_RUNS)..."
run_lane "$D10" /tmp/text_sf10.json 48g
if [ "$P225_SF1" = "1" ]; then
  echo "q225 exact-complete audit price at sf1 (single pass, no gate)..."
  SPARK_GRAFT_BENCH_ONLY=q225_setsim_char_exact SPARK_GRAFT_BENCH_RUNS=1 \
  SPARK_GRAFT_SF_DIR="$D1" SPARK_GRAFT_CPUS=$CPUS \
  SPARK_GRAFT_BENCH_OUT=/tmp/text_q225_sf1.json \
  java $JAVA_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx24g -cp "$CP" \
    graft.Bench 2>/dev/null >/dev/null
fi

python3 - "$RATIO_MAX" <<'EOF'
import json, os, sys
mx = float(sys.argv[1])
a = json.load(open('/tmp/text_sf1.json'))
b = json.load(open('/tmp/text_sf10.json'))
for d, lbl in [(a, 'sf1'), (b, 'sf10')]:
    if d.get('errors'):
        sys.exit(f"FAIL: errors at {lbl}: {d['errors']}")
    sp = d.get('spill', {})
    print(f"{lbl}: spill mem={sp.get('memBytes', 0)} disk={sp.get('diskBytes', 0)}")
aq, bq = a['queries'], b['queries']
bad = []
print(f"{'query':26s} {'sf1':>8s} {'sf10':>9s} {'ratio':>7s}  "
      f"(10x data; linear gate {mx}x)")
for k in sorted(aq):
    r = bq[k] / max(aq[k], 1e-9)
    flag = ''
    if r > mx:
        bad.append((k, r)); flag = '  <-- OVER GATE'
    print(f"{k:26s} {aq[k]:8.2f} {bq[k]:9.2f} {r:6.1f}x{flag}")
if os.path.exists('/tmp/text_q225_sf1.json'):
    q = json.load(open('/tmp/text_q225_sf1.json'))['queries']
    t = q.get('q225_setsim_char_exact', -1)
    print(f"q225_setsim_char_exact      {t:8.2f}         -       -  "
          "(exact-complete audit price at sf1; no gate - see lane header)")
if bad:
    sys.exit("FAIL: " + ", ".join(f"{k} {r:.1f}x > {mx}x" for k, r in bad))
print("OK: text near-dup decade within the linear gate")
EOF
