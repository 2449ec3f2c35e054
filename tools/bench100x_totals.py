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

# ---- SURVEY/NOTES artifact-count lines (round-13 VERDICT task 4) -------
# Hand-transcribed totals drifted three rounds running (r7, r8, r12:
# "96 rows" vs 98, "282.1 s / 215" vs the committed 299.9 / 217). The
# CURRENT round's sections carry ARTIFACT_COUNTS markers instead; the
# body is derived here from BENCH_100x.json + BENCH_FULL.json, so a
# seeded wrong count inside the markers fails --check. Historical round
# sections are frozen text (no markers) — they were checked when
# written and their artifacts are superseded.
full = json.loads((root / "BENCH_FULL.json").read_text())
contended = full.get("calibration", {}).get("contended", None)
counts_body = (
    f"BENCH_100x at {n} rows ({total:.1f} s total); committed "
    f"BENCH_FULL {full['value']:.1f} s / {full['n_queries']} queries"
    + ("" if contended is None
       else f", contended: {str(contended).lower()}"))
marked = []  # (path, new_text, old_text)
for fname in ("SURVEY.md", "NOTES.md"):
    p = root / fname
    t = p.read_text()
    if f"<!-- ARTIFACT_COUNTS -->" in t:
        t2 = splice("ARTIFACT_COUNTS", counts_body, t)
        marked.append((p, t2, t))

if "--check" in sys.argv:
    if md != old:
        sys.exit("SCALING.md derived blocks are stale — run "
                 "tools/bench100x_totals.py")
    for p, t2, t in marked:
        if t2 != t:
            sys.exit(f"{p.name} ARTIFACT_COUNTS block is stale/hand-edited "
                     f"— run tools/bench100x_totals.py")
    print(f"SCALING.md derived blocks current: {totals_msg}; "
          f"{sum(len(s['rows']) for s in dens['modes'].values())} density rows"
          + (f"; {len(marked)} ARTIFACT_COUNTS block(s) current"
             if marked else ""))
else:
    md_path.write_text(md)
    for p, t2, t in marked:
        if t2 != t:
            p.write_text(t2)
    print(f"SCALING.md derived blocks set: {totals_msg}; "
          f"ARTIFACT_COUNTS: {counts_body}")
