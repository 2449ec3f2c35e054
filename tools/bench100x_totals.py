#!/usr/bin/env python3
"""Regenerate SCALING.md's derived blocks from their JSON artifacts.

The count/total previously drifted twice (r7: 1209 vs 1178.5; r8: 86/1544.4
vs 88/1574.7) because the prose was hand-edited while rows were folded in.
This makes the lines derived, never typed:

  - BENCH_100X_TOTALS markers <- BENCH_100x.json (count + total)
  - BENCH_DENSITY markers     <- BENCH_DENSITY.json (the mode-tagged
    extend-axis / density-probe / index-probe tables; round-9/10 VERDICT
    task: every ratio SURVEY cites must resolve to a checked-in artifact)

Usage: tools/bench100x_totals.py [--check]
  --check  exit 1 if SCALING.md is stale instead of rewriting it
"""
import json, re, sys, pathlib

root = pathlib.Path(__file__).resolve().parent.parent
md_path = root / "SCALING.md"
md = md_path.read_text()
stale = []


def splice(marker: str, body: str, text: str) -> str:
    pat = re.compile(rf"<!-- {marker} -->.*?<!-- /{marker} -->", re.DOTALL)
    if not pat.search(text):
        sys.exit(f"SCALING.md has no {marker} markers")
    return pat.sub(f"<!-- {marker} -->{body}<!-- /{marker} -->", text)


# ---- BENCH_100x totals line -------------------------------------------
data = json.loads((root / "BENCH_100x.json").read_text())
n = len(data["queries"])
total = sum(data["queries"].values())
md = splice(
    "BENCH_100X_TOTALS",
    f"**{n} queries, {total:.1f} s total**"
    f" (derived from BENCH_100x.json by tools/bench100x_totals.py)",
    md)
totals_msg = f"{n} queries, {total:.1f} s"

# ---- Density / extend-axis tables -------------------------------------
dens = json.loads((root / "BENCH_DENSITY.json").read_text())
lines = ["", ""]
for mode, spec in dens["modes"].items():
    unit = spec.get("unit", "scale")
    rows = spec["rows"]
    # column order = first row's point order (all rows share the axis)
    points = list(next(iter(rows.values()))["points"].keys())
    lines.append(f"**{mode}** ({spec['what']}; axis: {unit}, min_of_2 s)")
    lines.append("")
    lines.append("| path | " + " | ".join(points) +
                 " | last/first | round |")
    lines.append("|---|" + "---|" * (len(points) + 2))
    for name, row in rows.items():
        pts = row["points"]
        vals = [f"{pts[p]:.2f}" if p in pts and pts[p] is not None else "—"
                for p in points]
        have = [pts[p] for p in points if pts.get(p) is not None]
        ratio = f"**{have[-1] / have[0]:.1f}×**" if len(have) >= 2 else "—"
        lines.append(f"| {name} | " + " | ".join(vals) +
                     f" | {ratio} | r{row['round']} |")
    lines.append("")
lines.append("(derived from BENCH_DENSITY.json by tools/bench100x_totals.py)")
lines.append("")
md = splice("BENCH_DENSITY", "\n".join(lines), md)

old = md_path.read_text()
if "--check" in sys.argv:
    if md != old:
        sys.exit("SCALING.md derived blocks are stale — run "
                 "tools/bench100x_totals.py")
    print(f"SCALING.md derived blocks current: {totals_msg}; "
          f"{sum(len(s['rows']) for s in dens['modes'].values())} density rows")
else:
    md_path.write_text(md)
    print(f"SCALING.md derived blocks set: {totals_msg}")
