#!/usr/bin/env bash
# Full-registry sf1 correctness sweep -> CORRECTNESS_sf1.json.
#
# Procedure (what round 8 ran, scripted for reruns):
#   1. generate the sf1 tables (10x the per-round gate) via make_sf1.py
#   2. dump every SparkEntry query once with graft.Verify (one sbt run)
#   3. compare against DuckDB in PARALLEL chunks — the heavy oracles
#      (list-lambda banding d05/d07, ~1-2 h each) must not serialize the
#      other ~155. Nothing is skipped (round 13): q94 now auto-buckets
#      oversized groups (onOversize = Bucket(16), the q105 estimator),
#      so both its operator and its oracle are sf1-safe.
#      p07_chunk_pack is no longer skipped: its oracle's `d` CTE is now
#      MATERIALIZED, so the recursion probes a computed table instead of
#      re-evaluating the string_split chunking chain every iteration
#      (the >55 GB spill); the sf1 oracle completes in ~30 s.
#   4. merge chunk JSONs into CORRECTNESS_sf1.json
#
# Needs ~25 GB under $SF_DIR and several hours of DuckDB CPU for the
# dedup-oracle tail. Float compare uses check.py's rtol=1e-9 (summation-
# order divergence is real at this scale — see BASELINE.md).
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR=${SF_DIR:-/tmp/testdata-sf1}
OUT=${OUT:-/tmp/graft_verify_sf1}
JDIR=$(mktemp -d /tmp/sf1_sweep.XXXX)

[ -f "$SF_DIR/lineitem.parquet" ] || \
  python3 scripts/make_sf1.py /root/testdata/sf0.1 "$SF_DIR"

sbt -batch "runMain graft.Verify $SF_DIR $OUT"

SKIP=''
HEAVY='d05_embedding_dup d07_embedding_exact d09_semantic_dedup d13_sparse_cosine d14_lsh_rescored d02_ngram_jaccard d03_minhash_lsh q22_pack_sequences p09_golden_record p10_mixer_e2e p11_mixer_anneal_e2e'
ALL=$(python3 -c "
import json
qs = sorted(json.load(open('$OUT/oracle_sql.json')))
skip = set('$SKIP'.split()) - {''}; heavy = set('$HEAVY'.split())
rest = [q for q in qs if q not in skip | heavy]
n = 4
for i in range(n): print(','.join(rest[i::n]))
for h in sorted(heavy & set(qs)): print(h)")

i=0
pids=()
while IFS= read -r chunk; do
  SKIP_VERIFY=1 CHECK_OUT=$OUT CHECK_JSON_OUT=$JDIR/chunk_$i.json \
    python3 scripts/check.py "$SF_DIR" "$chunk" > "$JDIR/chunk_$i.log" 2>&1 &
  pids+=($!)
  i=$((i+1))
done <<< "$ALL"
for p in "${pids[@]}"; do wait "$p" || echo "chunk exited nonzero (see $JDIR)"; done

python3 scripts/merge_correctness.py CORRECTNESS_sf1.json "$JDIR"/chunk_*.json
echo "chunk logs in $JDIR"
