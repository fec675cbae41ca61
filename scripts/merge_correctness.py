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
            # keep the red->green re-check direction only, but NEVER
            # silently: a newer red suppressed by an older green means
            # the committed artifact may claim green for a query whose
            # most recent run regressed — flag it in the record and on
            # stderr so a genuine regression can't hide behind a flake.
            merged[name] = dict(merged[name], stale_green=True)
            print(f"WARNING: {name} green from an earlier chunk suppresses "
                  f"a newer red ({p}) — marked stale_green; re-check it",
                  file=sys.stderr)
            continue
        merged[name] = rec
green = sum(1 for r in merged.values() if r.get("hash_match"))
stale = sum(1 for r in merged.values() if r.get("stale_green"))
with open(out_path, "w") as f:
    json.dump({"sf_dir": sf_dir, "green": green, "total": len(merged),
               "queries": dict(sorted(merged.items()))}, f, indent=1, sort_keys=False)
suffix = f" ({stale} stale_green — NEWER RED SUPPRESSED)" if stale else ""
print(f"{green}/{len(merged)} green -> {out_path}{suffix}")
