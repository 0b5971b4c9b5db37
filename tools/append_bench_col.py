#!/usr/bin/env python3
"""Append a min-of-N column (plus a delta vs the previous column) to
BENCH_HISTORY.md's per-query table.

Usage: tools/append_bench_col.py <colname> run1.json [run2.json ...]

Reads each bench_full.json, takes the per-query minimum, appends
`| <colname> | <colname>-<prev> |` cells to every existing row (new
queries get new rows with em-dashes for historical columns), and
rewrites the table in place. The narrative block above the table is
left untouched — add the window-control note by hand.
"""
import json
import re
import sys

HIST = "BENCH_HISTORY.md"

col = sys.argv[1]
runs = [json.load(open(p)) for p in sys.argv[2:]]
mins = {}
for r in runs:
    for q, t in r["queries"].items():
        mins[q] = min(mins.get(q, 1e18), t)

lines = open(HIST).read().splitlines(keepends=False)
hdr_i = next(i for i, l in enumerate(lines) if l.startswith("| query |"))
hdr = [c.strip() for c in lines[hdr_i].strip("|").split("|")]


def is_delta(name):
    # new columns are marked explicitly with a Δ prefix; legacy delta
    # columns were named <new>-<old> (e.g. r10-r9f)
    return name.startswith("Δ") or bool(re.fullmatch(r"r\d+\w*-r\d+\w*", name))


last_is_delta = is_delta(hdr[-1])
ncols = len(hdr)
lines[hdr_i] = lines[hdr_i].rstrip() + f" {col} | Δ{col} |"
lines[hdr_i + 1] = lines[hdr_i + 1].rstrip() + "---|---|"

seen = set()
last_row = hdr_i + 2  # insertion point for new-query rows
for i in range(hdr_i + 2, len(lines)):
    if not lines[i].startswith("| "):
        break
    last_row = i + 1
    cells = [c.strip() for c in lines[i].strip("|").split("|")]
    q = cells[0].strip("` ")
    seen.add(q)
    if q in mins:
        new = f"{mins[q]:.2f}"
        prev_val = cells[-2] if last_is_delta else cells[-1]
        try:
            delta = mins[q] - float(prev_val)
            d = f"{delta:+.2f}"
        except ValueError:
            d = "—"
        lines[i] = lines[i].rstrip() + f" {new} | {d} |"
    else:
        lines[i] = lines[i].rstrip() + " — | — |"
new_rows = []
for q in sorted(set(mins) - seen):
    dashes = " — |" * (ncols - 1)
    new_rows.append(f"| {q} |{dashes} {mins[q]:.2f} | — |")
lines[last_row:last_row] = new_rows

open(HIST, "w").write("\n".join(lines) + "\n")
print(f"appended {col}: {len(mins)} queries, {len(new_rows)} new rows; "
      f"totals {[round(sum(r['queries'].values()), 1) for r in runs]}; "
      f"controls a1_avg {[r['queries'].get('a1_avg') for r in runs]}")
