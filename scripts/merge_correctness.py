#!/usr/bin/env python3
"""Merge per-chunk CHECK_JSON_OUT artifacts (parallel sf1 sweep runs)
into one CORRECTNESS-style file. Later files win per query, except a
green record (hash_match) is never overwritten by a red one — re-checks
of flaky comparisons append their own chunk file.

    python3 scripts/merge_correctness.py OUT.json IN1.json IN2.json ...
"""
import json, sys

out_path, ins = sys.argv[1], sys.argv[2:]
merged, sf_dir = {}, None
for p in ins:
    try:
        d = json.load(open(p))
    except FileNotFoundError:
        continue
    sf_dir = d.get("sf_dir", sf_dir)
    for name, rec in d.get("queries", {}).items():
        if name in merged and merged[name].get("hash_match") and not rec.get("hash_match"):
            continue
        merged[name] = rec
green = sum(1 for r in merged.values() if r.get("hash_match"))
with open(out_path, "w") as f:
    json.dump({"sf_dir": sf_dir, "green": green, "total": len(merged),
               "queries": dict(sorted(merged.items()))}, f, indent=1, sort_keys=False)
print(f"{green}/{len(merged)} green -> {out_path}")
