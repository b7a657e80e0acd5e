#!/bin/bash
# Cluster rehearsal lane (round 10): run the graded surface under a
# local-cluster[W,C,MB] master — REAL multi-process executor JVMs, so
# every serialization boundary, broadcast, executor-side class load, and
# shuffle crosses a process (and the netty network path) instead of a
# single JVM's heap. This is the cheapest honest rehearsal of the 100 TB
# deployment: classpath/serialization bugs and checkpoint-mode behavior
# only surface with remote executors. Runs with the RELIABLE checkpoint
# mode on (spark.graft.checkpoint.dir), i.e. the exact conf a cluster
# deployment uses.
#
# Excluded: q220_jdbc_roundtrip — its database is EMBEDDED IN-MEMORY
# Derby, single-JVM by nature (each executor process would see its own
# private "memory:" db). A real cluster points sources.Jdbc at a network
# RDBMS endpoint; the code path (createTableIfMissing / upsertByKey /
# readPartitioned) is identical. The remaining 219 queries all run.
#
# Usage: tools/cluster_verify.sh            # sf0.01, 2 workers x 8 cores
#        SF=/root/testdata/sf0.1 MASTER='local-cluster[4,4,4096]' tools/cluster_verify.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${SF:-/root/testdata/sf0.01}
SFLABEL=$(basename "$SF")
OUT=${OUT:-/tmp/cluster_verify_$SFLABEL}
# 2 workers x 8 cores x 4 GiB worker memory; executors sized below
MASTER=${MASTER:-local-cluster[2,8,4096]}
CKPT=${CKPT:-/tmp/graft_ckpt_cluster}

sbt -batch -error compile >/dev/null
rm -rf "$OUT" "$CKPT" && mkdir -p "$CKPT"

JAVA_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  echo --add-opens=java.base/$p=ALL-UNNAMED; done)
CLASSES="$PWD/target/scala-2.13/classes:$PWD/src/main/resources"

# SPARK_HOME: the standalone Worker builds each executor JVM's command
# through the launcher, which puts $SPARK_HOME/jars/* on its classpath;
# our classes ride spark.executor.extraClassPath. The executor-side
# add-opens go through extraJavaOptions (harmless if the launcher also
# injects its defaults).
# SPARK_SCALA_VERSION: normally exported by bin/load-spark-env.sh; the
# in-JVM standalone Worker bypasses the shell scripts, and the launcher's
# getScalaVersion() otherwise aborts executor launch with "Cannot find
# any build directories".
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER="$MASTER" SPARK_GRAFT_CPUS=16 \
java $JAVA_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.graft.checkpoint.dir="$CKPT" \
  -Dspark.executor.memory=3g \
  -Dspark.executor.extraClassPath="$CLASSES" \
  -Dspark.executor.extraJavaOptions="$(echo $JAVA_OPENS)" \
  -Xmx8g -cp "$CLASSES:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" '!q220'

echo "== oracle compare =="
python3 tools/check_oracle.py "$SF" "$OUT" --skip=q220
echo "== goldens =="
python3 tools/check_goldens.py "$OUT" "$SFLABEL"
