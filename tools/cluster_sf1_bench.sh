#!/bin/bash
# Round-11 composition lane: 10× DATA × PROCESS BOUNDARIES × the
# DEPLOYMENT KNOBS, together. Every prior proof ran one dimension in
# isolation (cluster_verify at sf0.1, sf1_smoke single-JVM, chaos at
# sf0.1); this lane runs the sf1 heavy-tail query lane (the sf1_smoke
# LANE — graph four included, plus the round-11 indexed twins) under a
# multi-process local-cluster master with reliable checkpointing, which
# also self-enables layout-aligned pinning (Pin.defaultAligned: ON for
# any non-local[*] master since round 11) — the closest possible
# single-host rehearsal of the 100 TB deployment posture.
#
# Comparison side: the SAME lane at local[16] (equal cores, in-process
# shuffle, localCheckpoint, aligned off) back-to-back in one window.
# Gate: ZERO errors under the cluster master, and per-query wall ratio
# cluster/local <= CLUSTER_MAX (default 3: the round-10 boundary tax
# was +4.3% at sf0.1, but at sf1 reliable checkpointing pays a second
# materialization of every pinned frame + local-FS checkpoint I/O on
# top of netty shuffle — a 3x per-query ceiling catches a kernel that
# FALLS OVER while tolerating the priced fault-tolerance overhead).
#
# Usage: tools/cluster_sf1_bench.sh
#        CLUSTER_MAX=4 tools/cluster_sf1_bench.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF01=${SF01:-/root/testdata/sf0.1}
SF1=${SF1:-/tmp/graft_sf1}
MASTER=${MASTER:-local-cluster[2,8,16384]}
CKPT=${CKPT:-/tmp/graft_ckpt_sf1lane}
CLUSTER_MAX=${CLUSTER_MAX:-3}

# the sf1_smoke heavy-tail lane (single source of truth for its list).
# Extracted by the closing quote, not a fixed line count — a grep -A<n>
# window silently drops queries the moment the LANE grows past it
# (round-11 ADVICE: the list had grown to the window's exact boundary).
LANE=$(awk '/^LANE="/{f=1} f{printf "%s",$0; if(/"$/){exit}}' \
  tools/sf1_smoke.sh | tr -d '\\" ' | sed 's/^LANE=//')
[ -n "$LANE" ] || { echo "failed to extract LANE from tools/sf1_smoke.sh" >&2; exit 1; }
case "$LANE" in *,,*|,*|*,) echo "malformed LANE extraction: $LANE" >&2; exit 1;; esac
echo "lane: $LANE"

JAVA_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  echo --add-opens=java.base/$p=ALL-UNNAMED; done)
CP="$PWD/target/scala-2.13/classes:$PWD/src/main/resources"

sbt -batch -error compile >/dev/null

if [ ! -f "$SF1/embeddings.parquet/_SUCCESS" ]; then
  echo "building $SF1 (10x $SF01)..."
  SPARK_GRAFT_CPUS=32 java $JAVA_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx12g -cp "$CP:/opt/spark/jars/*" \
    graft.tools.ScaleData "$SF01" "$SF1" 10 2>/dev/null
fi
rm -rf "$CKPT" && mkdir -p "$CKPT"

# local side FIRST: the first pass over the sf1 parquet pays the cold
# page cache; running it on the local side keeps the cluster/local
# ratio from billing cold I/O to the cluster mode (the first recording
# of this lane did exactly that — q191 read 3.54x "overhead" that a
# warm re-run priced at 0.98x)
echo "lane at sf1 under local[16] (same window, runs first = eats the cold cache)..."
SPARK_GRAFT_BENCH_ONLY="$LANE" SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_CPUS=16 \
SPARK_GRAFT_BENCH_OUT=/tmp/local16_sf1.json \
java $JAVA_OPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -Xmx28g -cp "$CP:/opt/spark/jars/*" \
  graft.Bench 2>/dev/null >/dev/null

# cluster side: 2 executor JVMs x 8 cores, reliable checkpoint dir set
# (aligned pinning self-resolves ON from the master type)
echo "lane at sf1 under $MASTER (reliable ckpt, aligned auto-ON)..."
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER="$MASTER" \
SPARK_GRAFT_BENCH_ONLY="$LANE" SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_CPUS=16 \
SPARK_GRAFT_BENCH_OUT=/tmp/cluster_sf1.json \
SPARK_GRAFT_CONF="spark.graft.checkpoint.dir=$CKPT" \
java $JAVA_OPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.executor.memory=14g \
  -Dspark.executor.extraClassPath="$CP" \
  -Dspark.executor.extraJavaOptions="$(echo $JAVA_OPENS)" \
  -Xmx12g -cp "$CP:/opt/spark/jars/*" \
  graft.Bench 2>/dev/null >/dev/null

python3 - "$CLUSTER_MAX" <<'EOF'
import json, sys
mx = float(sys.argv[1])
c = json.load(open('/tmp/cluster_sf1.json'))
l = json.load(open('/tmp/local16_sf1.json'))
bad = []
print(f"{'query':30s} {'local16':>8s} {'cluster':>8s} {'ratio':>7s}")
rats = []
for k in sorted(l['queries']):
    tl, tc = l['queries'][k], c['queries'].get(k, -1)
    if tl <= 0 or tc <= 0:
        print(f"{k:30s} {tl:>8} {tc:>8}  ERROR"); bad.append(k); continue
    r = tc / tl
    rats.append(r)
    # sub-second queries under reliable mode pay a FIXED per-pin
    # checkpoint round-trip; a big ratio on a tiny absolute delta is
    # that fixed cost, not a scale pathology — require both to flag
    over = r > mx and (tc - tl) > 5.0
    flag = ' <-- OVER' if over else (' (ratio over, delta small)' if r > mx else '')
    print(f"{k:30s} {tl:8.2f} {tc:8.2f} {r:6.2f}x{flag}")
    if over: bad.append(k)
for side, j in (('local16', l), ('cluster', c)):
    errs = j.get('errors') or {}
    if errs: print(f"{side} errors: {errs}"); bad.append(side)
tot_l = sum(v for v in l['queries'].values() if v > 0)
tot_c = sum(v for v in c['queries'].values() if v > 0)
rats.sort()
med = rats[len(rats)//2] if rats else float('nan')
print(f"\ntotals: local16 {tot_l:.1f}s  cluster {tot_c:.1f}s "
      f"({tot_c/tot_l:.2f}x)  median per-query {med:.2f}x")
print(f"spill: local {l.get('spill')}  cluster {c.get('spill')}")
if bad:
    print(f"\nCLUSTER SF1 LANE FAILED: {bad}"); sys.exit(1)
print(f"\nCLUSTER SF1 LANE OK (zero errors, all ratios <= {mx}x)")
EOF
