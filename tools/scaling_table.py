#!/usr/bin/env python3
"""Summarize SCALING_RAW.jsonl (force:full rows) into the SCALING.md table.

Per (query, sf) the minimum-wall row wins (same min-of-N discipline as
Bench/ScaleLadder); exponents are log-log slopes sf0.1 -> sf4 (x40).
"""
import json, math, collections, sys

rows = [json.loads(l) for l in open('SCALING_RAW.jsonl') if '"force":"full"' in l]
best = {}
for r in rows:
    if 'error' in r:
        continue
    k = (r['query'], r['sf'])
    if k not in best or r['sec'] < best[k]['sec']:
        best[k] = r

queries = sorted({q for q, _ in best})
print(f"| query | sf0.1 | sf1 (x10) | sf4 (x40) | wall exp | cpu exp | spill@sf4 | rows x40 |")
print("|---|--:|--:|--:|--:|--:|--:|--:|")
for q in queries:
    try:
        a, b, c = best[(q, 'sf0.1')], best[(q, 'sf1')], best[(q, 'sf4')]
    except KeyError:
        print(f"| {q} | INCOMPLETE |", file=sys.stderr)
        continue
    wexp = math.log(c['sec'] / a['sec']) / math.log(40)
    cexp = math.log(max(c['task_ms'], 1) / max(a['task_ms'], 1)) / math.log(40)
    spill = f"{c['spill_mb']/1024:.0f} GB" if c['spill_mb'] > 512 else "0"
    rx = c['rows'] / max(a['rows'], 1)
    print(f"| {q} | {a['sec']:.1f} | {b['sec']:.1f} | {c['sec']:.1f} | "
          f"{wexp:.2f} | {cexp:.2f} | {spill} | x{rx:.0f} |")
