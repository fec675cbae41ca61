#!/usr/bin/env bash
# Bench wrapper that guarantees the driver's tail-parse contract: run the
# benchmark through sbt, then re-echo the compact result JSON as the true
# LAST stdout line (sbt may append its own trailer lines after the forked
# JVM's final println; build.sbt suppresses "[success]" but this wrapper
# is robust even if a future sbt version adds other trailers).
#
# Usage: scripts/bench.sh            # full registry, env passes through
#        SPARK_GRAFT_SF_DIR=... scripts/bench.sh
set -uo pipefail
cd "$(dirname "$0")/.."
sbt "runMain graft.Bench"
status=$?
if [[ -f BENCH_last.json ]]; then
  tail -n 1 BENCH_last.json
fi
exit $status
