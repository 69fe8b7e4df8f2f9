#!/usr/bin/env python3
"""CI guard: SCALING.md's per-operator ladder table must be byte-identical
to what tools/scaling_table.py regenerates from SCALING_RAW.jsonl.

The table is a rendering of the raw record; a hand-edit to SCALING.md's
table (or a raw-file append without a re-render) makes the committed doc
lie about the measurements. This check makes the two unable to drift:
it runs the generator, extracts the committed table (located by its
header line, so surrounding prose can move freely), and diffs.

Exit 0 = identical; exit 1 = drift (unified diff printed).
Run from the repo root: `python3 tools/check_scaling_table.py`.
"""
import difflib
import subprocess
import sys

gen = subprocess.run(
    [sys.executable, "tools/scaling_table.py"],
    capture_output=True, text=True)
if gen.returncode != 0:
    print(f"scaling_table.py failed:\n{gen.stderr}", file=sys.stderr)
    sys.exit(1)
generated = gen.stdout.rstrip("\n").splitlines()
if not generated:
    print("scaling_table.py produced no output", file=sys.stderr)
    sys.exit(1)

doc = open("SCALING.md").read().splitlines()
header = generated[0]
try:
    start = doc.index(header)
except ValueError:
    print("SCALING.md does not contain the generated table header:\n"
          f"  {header}", file=sys.stderr)
    sys.exit(1)
end = start
while end < len(doc) and doc[end].startswith("|"):
    end += 1
committed = doc[start:end]

if committed == generated:
    print(f"OK: SCALING.md table ({len(generated)} lines) matches "
          "regeneration from SCALING_RAW.jsonl")
    sys.exit(0)
print("DRIFT: SCALING.md table differs from regenerated output "
      "(committed -> regenerated):", file=sys.stderr)
for line in difflib.unified_diff(committed, generated,
                                 "SCALING.md", "regenerated", lineterm=""):
    print(line, file=sys.stderr)
sys.exit(1)
