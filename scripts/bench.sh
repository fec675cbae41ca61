#!/usr/bin/env bash
# Bench wrapper that guarantees the driver's tail-parse contract: run the
# benchmark through sbt, then re-echo the compact result JSON as the true
# LAST stdout line (sbt may append its own trailer lines after the forked
# JVM's final println; build.sbt suppresses "[success]" but this wrapper
# is robust even if a future sbt version adds other trailers).
#
# BENCH_last.json is committed to the repo, so its mere existence proves
# nothing — only re-echo it when THIS run rewrote it (full-registry runs
# write it; filtered runs and crashed runs do not). A stale echo would
# report a previous run's totals as this run's result.
#
# Usage: scripts/bench.sh            # full registry, env passes through
#        SPARK_GRAFT_SF_DIR=... scripts/bench.sh
set -uo pipefail
cd "$(dirname "$0")/.."
marker=$(mktemp)
sbt "runMain graft.Bench"
status=$?
if [[ BENCH_last.json -nt $marker ]]; then
  tail -n 1 BENCH_last.json
fi
rm -f "$marker"
exit $status
