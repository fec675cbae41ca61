#!/usr/bin/env bash
# Cluster-mode smoke: run a representative query slice + one pipeline
# OFF local mode — standalone local-cluster[2,4,2048] (2 executor JVMs x
# 4 cores, separate processes with real serialization boundaries) with
# dynamic allocation on — recording that graft's plans and semantics hold
# beyond local[*]. See graft.ClusterSmoke for what is asserted.
#
# Usage: scripts/cluster_smoke.sh [sfDir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package
JAR=$(ls target/scala-2.13/cosmosxennaspark_2.13-*.jar | head -1)
SF_DIR="${1:-/root/testdata/sf0.01}"
SPARK_HOME=/opt/spark exec /opt/spark/bin/spark-submit \
  --class graft.ClusterSmoke \
  --master 'local-cluster[2,4,2048]' \
  --conf spark.dynamicAllocation.enabled=true \
  --conf spark.dynamicAllocation.shuffleTracking.enabled=true \
  --conf spark.dynamicAllocation.minExecutors=1 \
  --conf spark.dynamicAllocation.initialExecutors=2 \
  --conf spark.dynamicAllocation.maxExecutors=2 \
  --conf spark.executor.memory=2g \
  --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  "$JAR" "$SF_DIR"
