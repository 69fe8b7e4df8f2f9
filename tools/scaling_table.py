#!/usr/bin/env python3
"""Summarize SCALING_RAW.jsonl (force:full rows) into the SCALING.md table.

Per (query, sf) the LAST record wins: the raw file is append-only
across code changes, so electing the minimum over its whole history
could keep a pre-change faster row alive forever and hide a real
regression from the regenerated table. Each row is already min-of-N
within its own run (ScaleLadder's iteration discipline); recency picks
the newest code's measurement. ERROR records participate in last-wins
too (ScaleLadder stamps them force:full as of r12): a (query, sf)
whose NEWEST record is a crash renders as ERROR instead of silently
falling back to an older success. Legacy error lines (pre-r12, no
force field) are also admitted — an error can never be a stale-success
mask, only a success can. Exponents are log-log slopes
sf0.1 -> sf4 (x40); sf16 rows, when present, get their own x160
columns (queries without an sf16 row show "-": the x160 rung is a
spot-check subset, not the full ladder).
"""
import json, math, sys

best = {}
sfs_seen = set()
for l in open('SCALING_RAW.jsonl'):
    r = json.loads(l)
    if 'query' not in r:
        continue
    if '"force":"full"' not in l and 'error' not in r:
        continue  # pre-Force.rows success rows measured a skippable plan
    best[(r['query'], r['sf'])] = r  # last record wins, errors included
    sfs_seen.add(r['sf'])

def sec(r):
    # ms() rounds to 3 decimals; clamp so a sub-millisecond rung can't
    # crash the log ratio with a domain error.
    return max(r['sec'], 0.001)

has16 = 'sf16' in sfs_seen
queries = sorted({q for q, _ in best})
hdr = "| query | sf0.1 | sf1 (x10) | sf4 (x40) |"
sep = "|---|--:|--:|--:|"
if has16:
    hdr += " sf16 (x160) |"
    sep += "--:|"
hdr += " wall exp | cpu exp | spill@sf4 | rows x40 |"
sep += "--:|--:|--:|--:|"
if has16:
    hdr += " wall exp x160 | spill@sf16 |"
    sep += "--:|--:|"
print(hdr)
print(sep)
def cell(r):
    # Per-SF cell: a time, an ERROR (message lives in the cell so the
    # row keeps the full column count and the table stays aligned), or
    # '-' when the rung was not run.
    if r is None:
        return "-"
    if 'error' in r:
        return f"ERROR: {r['error'][:40]}"
    return f"{r['sec']:.1f}"

for q in queries:
    cells = [best.get((q, s)) for s in ('sf0.1', 'sf1', 'sf4')]
    errs = [r for r in cells if r and 'error' in r]
    if errs:
        # Full-width row: error text in its own SF cell(s), '-' in every
        # derived column — a malformed 2-cell row breaks the rendered
        # table for every reader below it.
        row = f"| {q} | " + " | ".join(cell(r) for r in cells) + " | "
        if has16:
            row += cell(best.get((q, 'sf16'))) + " | "
        row += "- | - | - | - |"
        if has16:
            row += " - | - |"
        print(row)
        continue
    if any(r is None for r in cells):
        print(f"| {q} | INCOMPLETE |", file=sys.stderr)
        continue
    a, b, c = cells
    d = best.get((q, 'sf16'))
    wexp = math.log(sec(c) / sec(a)) / math.log(40)
    cexp = math.log(max(c['task_ms'], 1) / max(a['task_ms'], 1)) / math.log(40)
    gb = c['spill_mb'] / 1024
    spill = f"{gb:.1f} GB" if gb >= 0.1 else "0"
    rx = c['rows'] / max(a['rows'], 1)
    row = (f"| {q} | {a['sec']:.1f} | {b['sec']:.1f} | {c['sec']:.1f} | ")
    if has16:
        if d is None:
            row += "- | "
        elif 'error' in d:
            row += f"ERROR: {d['error'][:40]} | "
        else:
            row += f"{d['sec']:.1f} | "
    row += f"{wexp:.2f} | {cexp:.2f} | {spill} | x{rx:.0f} |"
    if has16:
        if d is None or 'error' in d:
            row += " - | - |"
        else:
            w16 = math.log(sec(d) / sec(a)) / math.log(160)
            g16 = d['spill_mb'] / 1024
            s16 = f"{g16:.1f} GB" if g16 >= 0.1 else "0"
            row += f" {w16:.2f} | {s16} |"
    print(row)

extra = sorted(sfs_seen - {'sf0.1', 'sf1', 'sf4', 'sf16'})
if extra:
    print(f"NOTE: SFs {extra} present in raw but not rendered", file=sys.stderr)
