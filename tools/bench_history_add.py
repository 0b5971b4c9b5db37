#!/usr/bin/env python3
"""Append a bench_full.json run as a new column in BENCH_HISTORY.md.

Usage: tools/bench_history_add.py <label> [bench_full.json]
Rewrites the per-query table in place: adds <label> as the last value
column (replacing any previous delta column), recomputes the delta
against the previous column, and adds rows for queries new to the table.
"""
import json
import re
import sys

label = sys.argv[1]
src = sys.argv[2] if len(sys.argv) > 2 else "bench_full.json"
full = json.load(open(src))["queries"]

lines = open("BENCH_HISTORY.md").read().splitlines()
out = []
header_done = False
cols = []
seen = set()
for ln in lines:
    m = re.match(r"\| ([a-z0-9_]+) \| (.*) \|$", ln)
    if ln.startswith("| query |"):
        cols = [c.strip() for c in ln.strip("|").split("|")][1:]
        # drop a trailing delta column if present
        if cols and "-" in cols[-1]:
            cols = cols[:-1]  # trailing delta column like "r4e-r4"
        prev = cols[-1]
        out.append("| query | " + " | ".join(cols) + f" | {label} | {label}-{prev} |")
        header_done = True
        continue
    if header_done and ln.startswith("|---"):
        out.append("|---" * (len(cols) + 3) + "|")
        continue
    if m and header_done:
        q = m.group(1)
        seen.add(q)
        vals = [v.strip() for v in m.group(2).split("|")]
        vals = vals[: len(cols)]  # drop old delta
        new = full.get(q)
        new_s = "—" if new is None else f"{new:.2f}"
        prev_val = vals[-1] if vals else "—"
        try:
            delta = f"{new - float(prev_val):+.2f}"
        except (TypeError, ValueError):
            delta = "—"
        out.append(f"| {q} | " + " | ".join(vals) +
                   f" | {new_s} | {delta} |")
        continue
    out.append(ln)

# new queries not yet in the table
extra = sorted(set(full) - seen)
if extra and header_done:
    pad = " | ".join(["—"] * len(cols))
    for q in extra:
        out.append(f"| {q} | {pad} | {full[q]:.2f} | — |")

open("BENCH_HISTORY.md", "w").write("\n".join(out) + "\n")
print(f"added column {label}: {len(full)} queries, {len(extra)} new rows")
