#!/bin/bash
# Aligned-layout pricing under a MULTI-PROCESS master (round 10 — the
# measurement round 9 couldn't take). On local[*], aligned pinning cuts
# the iterative graph kernels' shuffle volume 25-45% but WORSENS wall,
# because in-heap shuffle is free and fixed-width layouts block AQE
# coalescing — which is why spark.graft.pin.alignedLayout ships OFF by
# default with "set it on a network-shuffle cluster" in the Scaladoc.
# local-cluster[...] is the first harness where shuffle actually
# crosses process + netty boundaries, so this lane prices the knob in
# (an approximation of) its intended environment: the graph four,
# reliable checkpoint mode, aligned OFF vs ON back-to-back in one
# window, wall + work channel both reported.
#
# Usage: tools/cluster_align_bench.sh
#        RUNS=3 MASTER='local-cluster[4,4,4096]' tools/cluster_align_bench.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${SF:-/root/testdata/sf0.1}
MASTER=${MASTER:-local-cluster[2,8,4096]}
CKPT=${CKPT:-/tmp/graft_ckpt_align}
RUNS=${RUNS:-2}
LANE=${LANE:-q99_pagerank,q208_ppr,q213_hits,q171_bfs_reach}

sbt -batch -error compile >/dev/null
rm -rf "$CKPT" && mkdir -p "$CKPT"

JAVA_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  echo --add-opens=java.base/$p=ALL-UNNAMED; done)
CLASSES="$PWD/target/scala-2.13/classes:$PWD/src/main/resources"

bench() { # $1 = alignedLayout true|false, $2 = out json
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER="$MASTER" SPARK_GRAFT_CPUS=16 \
  SPARK_GRAFT_BENCH_ONLY="$LANE" SPARK_GRAFT_BENCH_RUNS="$RUNS" \
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_OUT="$2" \
  SPARK_GRAFT_CONF="spark.graft.pin.alignedLayout=$1" \
  java $JAVA_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.graft.checkpoint.dir="$CKPT" \
    -Dspark.executor.memory=3g \
    -Dspark.executor.extraClassPath="$CLASSES" \
    -Dspark.executor.extraJavaOptions="$(echo $JAVA_OPENS)" \
    -Xmx8g -cp "$CLASSES:/opt/spark/jars/*" \
    graft.Bench 2>/dev/null >/dev/null
}

bench false /tmp/align_off.json
bench true  /tmp/align_on.json

python3 - <<'EOF'
import json
off = json.load(open('/tmp/align_off.json'))
on = json.load(open('/tmp/align_on.json'))
print(f"{'query':22s} {'off wall':>9s} {'on wall':>9s} {'ratio':>6s}"
      f" {'off shuf':>10s} {'on shuf':>10s} {'bytes':>7s}")
wo = off.get('work') or {}; wn = on.get('work') or {}
for k in sorted(off['queries']):
    to, tn = off['queries'][k], on['queries'].get(k, -1)
    so = wo.get(k, {}); sn = wn.get(k, {})
    bo = so.get('shuffleReadBytes', 0) + so.get('shuffleWriteBytes', 0)
    bn = sn.get('shuffleReadBytes', 0) + sn.get('shuffleWriteBytes', 0)
    print(f"{k:22s} {to:9.2f} {tn:9.2f} {tn/to:5.2f}x"
          f" {bo/2**20:9.1f}M {bn/2**20:9.1f}M {bn/max(bo,1):6.2f}x")
for side, j in (('off', off), ('on', on)):
    errs = j.get('errors') or {}
    if errs: print(f"{side} errors: {errs}")
EOF
