#!/bin/bash
# Executor-loss chaos lane (round 10): prove the reliable-checkpoint
# mode's reason to exist. Under a local-cluster master with real
# executor JVMs, graft.ChaosKill runs PageRank, kill -9s one executor
# mid-fixed-point, and checks the output against an unkilled baseline:
#
#   reliable (spark.graft.checkpoint.dir set): must COMPLETE with a
#     bit-identical hash — lost tasks recompute from the checkpoint
#     files on the shared filesystem.
#   local (localCheckpoint default): must FAIL — the pinned lineage
#     lives only in executor block stores; this negative control proves
#     the kill actually bites.
#
# Runs both kernels: pr (PageRank fixed point) and cc (connected
# components — pointer jumping with per-round block cleanup, a
# different pin/unpersist pattern worth its own kill).
#
# Usage: tools/chaos_kill.sh          # sf0.1, 20 iterations
#        SF=/root/testdata/sf0.01 ITERS=30 KERNELS=pr tools/chaos_kill.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${SF:-/root/testdata/sf0.1}
ITERS=${ITERS:-20}
MASTER=${MASTER:-local-cluster[2,4,3072]}
CKPT=${CKPT:-/tmp/graft_ckpt_chaos}

sbt -batch -error compile >/dev/null
rm -rf "$CKPT" && mkdir -p "$CKPT"

JAVA_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  echo --add-opens=java.base/$p=ALL-UNNAMED; done)
CLASSES="$PWD/target/scala-2.13/classes:$PWD/src/main/resources"

run_mode() { # $1 = reliable|local, $2 = pr|cc
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER="$MASTER" SPARK_GRAFT_CKPT="$CKPT" \
  java $JAVA_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.executor.memory=2g \
    -Dspark.executor.extraClassPath="$CLASSES" \
    -Dspark.executor.extraJavaOptions="$(echo $JAVA_OPENS)" \
    -Xmx6g -cp "$CLASSES:/opt/spark/jars/*" \
    graft.ChaosKill "$SF" "$1" "$ITERS" "$2" 2>/dev/null
}

for K in ${KERNELS:-pr cc}; do
  echo "== kernel=$K mode=reliable (must survive the kill, bit-identical) =="
  run_mode reliable "$K"
  echo "== kernel=$K mode=local (negative control: must fail under the kill) =="
  run_mode local "$K"
done

# STREAMING leg (graft.StreamChaos): kill an executor mid-stream under
# the RocksDB state store — failed tasks re-run on the survivor, keyed
# state reloads from the checkpoint files, and the batch-id-keyed merge
# sink must come out byte-identical to an unkilled run (exactly-once
# under executor loss, not just across restarts). Kill placed by
# micro-batch count. No localCheckpoint negative control here:
# streaming state durability doesn't ride graft.ops.Pin.
echo "== streaming funnel (must survive the kill, sink exactly-once) =="
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER="$MASTER" \
java $JAVA_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.executor.memory=2g \
  -Dspark.executor.extraClassPath="$CLASSES" \
  -Dspark.executor.extraJavaOptions="$(echo $JAVA_OPENS)" \
  -Xmx6g -cp "$CLASSES:/opt/spark/jars/*" \
  graft.StreamChaos 2>/dev/null
echo "CHAOS LANE: all verdicts as expected"
