#!/bin/bash
# Standalone-master rehearsal (round 12, VERDICT r12 mandate #3): run
# the full graded surface under a REAL `spark://` standalone master —
# master + 2 worker PROCESSES, executors provisioned by the worker
# launcher. `local-cluster[...]` (tools/cluster_verify.sh's default)
# already crosses process boundaries for executors, but its master and
# workers live INSIDE the driver JVM: standalone-mode executor
# provisioning, worker-side launcher classpath construction, and the
# worker shuffle lifecycle only exercise for real under `spark://`.
# The chaos worker-kill leg has run ONE kernel this way since round 11;
# this lane runs all 222 (q220's embedded in-memory Derby is single-JVM
# by nature — see cluster_verify.sh).
#
# Usage: tools/standalone_verify.sh                      # sf0.01
#        SF=/root/testdata/sf0.1 tools/standalone_verify.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${SF:-/root/testdata/sf0.01}

JAVA_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  echo --add-opens=java.base/$p=ALL-UNNAMED; done)

SA_DIR=$(mktemp -d /tmp/graft_sa_verify.XXXXXX)
SA_PIDS=()
cleanup_sa() { kill -9 "${SA_PIDS[@]}" 2>/dev/null || true; }
trap cleanup_sa EXIT

# master with bind-retry + log-evidence readiness (the chaos worker-leg
# discipline): no fixed sleeps, no silent single-worker runs
for attempt in 1 2 3; do
  SA_PORT=$((17077 + RANDOM % 1000))
  echo "== standalone master on port $SA_PORT, workers under $SA_DIR =="
  java $JAVA_OPENS -Xmx512m -cp "/opt/spark/jars/*" \
    -Dspark.ui.enabled=false \
    org.apache.spark.deploy.master.Master \
    --host 127.0.0.1 --port "$SA_PORT" --webui-port 0 \
    >"$SA_DIR/master.log" 2>&1 &
  SA_PIDS=($!)
  up=""
  for _ in $(seq 1 30); do
    if grep -q "Starting Spark master at" "$SA_DIR/master.log" 2>/dev/null; then up=1; break; fi
    if grep -qiE "Address already in use|Failed to bind" "$SA_DIR/master.log" 2>/dev/null; then break; fi
    sleep 1
  done
  [ -n "$up" ] && break
  echo "master failed to bind on $SA_PORT (attempt $attempt), retrying"
  kill -9 "${SA_PIDS[@]}" 2>/dev/null || true
  SA_PIDS=()
  [ "$attempt" = 3 ] && { echo "standalone master never bound"; exit 1; }
done

for i in 1 2; do
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  java $JAVA_OPENS -Xmx512m -cp "/opt/spark/jars/*" \
    -Dspark.ui.enabled=false \
    org.apache.spark.deploy.worker.Worker \
    --cores 8 --memory 6g --work-dir "$SA_DIR/worker$i" --webui-port 0 \
    "spark://127.0.0.1:$SA_PORT" \
    >"$SA_DIR/worker$i.log" 2>&1 &
  SA_PIDS+=($!)
done
registered=0
for _ in $(seq 1 60); do
  registered=$(grep -c "Registering worker" "$SA_DIR/master.log" 2>/dev/null || true)
  [ "${registered:-0}" -ge 2 ] && break
  sleep 1
done
if [ "${registered:-0}" -lt 2 ]; then
  echo "only ${registered:-0}/2 workers registered — aborting"
  exit 1
fi
echo "== both workers registered; running the full surface =="

SF="$SF" MASTER="spark://127.0.0.1:$SA_PORT" \
  OUT=/tmp/standalone_verify_$(basename "$SF") \
  CKPT=/tmp/graft_ckpt_standalone \
  tools/cluster_verify.sh
rc=$?
cleanup_sa; trap - EXIT
rm -rf "$SA_DIR"
exit $rc
