#!/usr/bin/env python3
"""Audit BENCH_full.json against BASELINE.md's frozen per-query table:
prints every query over 1.5x its frozen baseline; fails (exit 1) on any
over the 2x gate, any failed (-1) query, or any frozen query MISSING
from the bench artifact (a silently dropped registry entry must not
pass). New queries with no frozen row are listed for freezing."""
import json, re, sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_full.json"
bench = json.load(open(bench_path))
text = open("BASELINE.md").read()
# the consolidated table: | query | sec | frozen from |
frozen = {}
table = text.split("## Frozen per-query baseline")[1].split("# Appendix")[0]
for m in re.finditer(r"\|\s*([a-z]\w+)\s*\|\s*([0-9.]+)\s*\|", table):
    frozen[m.group(1)] = float(m.group(2))

qs = bench["queries"]
breaches, warns, new = [], [], []
missing = sorted(set(frozen) - set(qs))
for name, sec in sorted(qs.items()):
    if sec < 0:
        breaches.append((name, sec, "FAILED"))
        continue
    base = frozen.get(name)
    if base is None:
        new.append((name, sec))
    elif sec > 2.0 * base:
        breaches.append((name, sec, f"{sec / base:.2f}x of {base:.3f}"))
    elif sec > 1.5 * base:
        warns.append((name, sec, f"{sec / base:.2f}x of {base:.3f}"))

# headline ratio over the MATCHED healthy set only: frozen queries that
# ran successfully (new queries have no denominator; failed ones have no
# honest numerator — both are reported separately, not folded in)
matched = [n for n in qs if n in frozen and qs[n] >= 0]
total = sum(v for v in qs.values() if v >= 0)
base_total = sum(frozen[n] for n in matched)
run_total = sum(qs[n] for n in matched)
if base_total:
    print(f"bench total {total:.1f} s over {len(qs)} queries; matched-set "
          f"ratio {run_total / base_total:.2f}x ({run_total:.1f} s vs "
          f"{base_total:.1f} s frozen over {len(matched)} queries)")
else:
    print(f"bench total {total:.1f} s over {len(qs)} queries (no frozen overlap)")
for n, s, w in warns:
    print(f"WARN  {n}: {s:.3f} s = {w}")
for n, s, w in breaches:
    print(f"GATE  {n}: {s:.3f} s = {w}")
for n in missing:
    print(f"GATE  {n}: frozen at {frozen[n]:.3f} s but ABSENT from the bench run")
for n, s in new:
    print(f"NEW   {n}: {s:.3f} s (no frozen row — freeze on first full-registry run)")
print(f"{len(breaches)} gate breaches, {len(missing)} frozen-but-missing, "
      f"{len(warns)} warns (>1.5x), {len(new)} unfrozen")
sys.exit(1 if breaches or missing else 0)
