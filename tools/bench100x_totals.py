#!/usr/bin/env python3
"""Regenerate SCALING.md's BENCH_100x totals line from the JSON itself.

The count/total previously drifted twice (r7: 1209 vs 1178.5; r8: 86/1544.4
vs 88/1574.7) because the prose was hand-edited while rows were folded in.
This makes the line derived, never typed: everything between the
BENCH_100X_TOTALS markers in SCALING.md is rewritten from BENCH_100x.json.

Usage: tools/bench100x_totals.py [--check]
  --check  exit 1 if SCALING.md is stale instead of rewriting it
"""
import json, re, sys, pathlib

root = pathlib.Path(__file__).resolve().parent.parent
data = json.loads((root / "BENCH_100x.json").read_text())
n = len(data["queries"])
total = sum(data["queries"].values())
line = (f"<!-- BENCH_100X_TOTALS -->**{n} queries, {total:.1f} s total**"
        f" (derived from BENCH_100x.json by tools/bench100x_totals.py)"
        f"<!-- /BENCH_100X_TOTALS -->")

md_path = root / "SCALING.md"
md = md_path.read_text()
pat = re.compile(r"<!-- BENCH_100X_TOTALS -->.*?<!-- /BENCH_100X_TOTALS -->",
                 re.DOTALL)
if not pat.search(md):
    sys.exit("SCALING.md has no BENCH_100X_TOTALS markers")
new = pat.sub(line, md)
if "--check" in sys.argv:
    if new != md:
        sys.exit("SCALING.md totals are stale — run tools/bench100x_totals.py")
    print(f"SCALING.md totals current: {n} queries, {total:.1f} s")
else:
    md_path.write_text(new)
    print(f"SCALING.md totals set: {n} queries, {total:.1f} s")
