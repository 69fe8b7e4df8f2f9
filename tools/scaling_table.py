#!/usr/bin/env python3
"""Summarize SCALING_RAW.jsonl (force:full rows) into the SCALING.md table.

Per (query, sf) the LAST record wins: the raw file is append-only
across code changes, so electing the minimum over its whole history
could keep a pre-change faster row alive forever and hide a real
regression from the regenerated table. Each row is already min-of-N
within its own run (ScaleLadder's iteration discipline); recency picks
the newest code's measurement. Exponents are log-log slopes
sf0.1 -> sf4 (x40).
"""
import json, math, sys

best = {}
for l in open('SCALING_RAW.jsonl'):
    if '"force":"full"' not in l:
        continue
    r = json.loads(l)
    if 'error' in r:
        continue
    best[(r['query'], r['sf'])] = r  # last record wins

queries = sorted({q for q, _ in best})
print("| query | sf0.1 | sf1 (x10) | sf4 (x40) | wall exp | cpu exp | spill@sf4 | rows x40 |")
print("|---|--:|--:|--:|--:|--:|--:|--:|")
for q in queries:
    try:
        a, b, c = best[(q, 'sf0.1')], best[(q, 'sf1')], best[(q, 'sf4')]
    except KeyError:
        print(f"| {q} | INCOMPLETE |", file=sys.stderr)
        continue
    wexp = math.log(c['sec'] / a['sec']) / math.log(40)
    cexp = math.log(max(c['task_ms'], 1) / max(a['task_ms'], 1)) / math.log(40)
    gb = c['spill_mb'] / 1024
    spill = f"{gb:.1f} GB" if gb >= 0.1 else "0"
    rx = c['rows'] / max(a['rows'], 1)
    print(f"| {q} | {a['sec']:.1f} | {b['sec']:.1f} | {c['sec']:.1f} | "
          f"{wexp:.2f} | {cexp:.2f} | {spill} | x{rx:.0f} |")
