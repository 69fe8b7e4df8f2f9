#!/usr/bin/env python3
"""DuckDB replay of the FuzzKernels dump: recompute jaro_winkler
(DuckDB's jaro_winkler_similarity) and the sparse dot (list
arithmetic) over the SAME inputs and compare value-for-value.

Usage: tools/fuzz_kernels.py [outdir]   (default /tmp/fuzz_kernels)
Exit 0 = every pair matches (jw within 1e-12; dot exact).
"""
import sys
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fuzz_kernels"
con = duckdb.connect()
fails = 0

# NULL-safe: `jw IS NULL` must count as a mismatch (inputs are never
# null here), or a kernel regression to NULL output would vanish from
# the WHERE filter and pass silently.
jw = con.execute(f"""
    SELECT id, a, b, jw,
      jaro_winkler_similarity(a, b) AS want
    FROM '{outdir}/jw/*.parquet'
    WHERE jw IS NULL OR abs(jw - jaro_winkler_similarity(a, b)) > 1e-12
    ORDER BY id LIMIT 10
""").fetchall()
n_jw = con.execute(
    f"SELECT COUNT(*) FROM '{outdir}/jw/*.parquet'").fetchone()[0]
if jw:
    fails += 1
    print(f"FAIL jaro_winkler: {len(jw)}+ mismatches of {n_jw}")
    for r in jw:
        print("   ", r)
else:
    print(f"OK   jaro_winkler: {n_jw} pairs match DuckDB")

dot = con.execute(f"""
    WITH r AS (
      SELECT id, dot,
        coalesce(list_sum(list_transform(range(1, len(ak) + 1), i ->
          av[CAST(i AS INT)] * coalesce(
            bv[list_position(bk, ak[CAST(i AS INT)])], 0))), 0) AS want
      FROM '{outdir}/dot/*.parquet'
    )
    SELECT id, dot, want FROM r
    WHERE dot IS DISTINCT FROM want ORDER BY id LIMIT 10
""").fetchall()
n_dot = con.execute(
    f"SELECT COUNT(*) FROM '{outdir}/dot/*.parquet'").fetchone()[0]
if dot:
    fails += 1
    print(f"FAIL sparse_dot_long: {len(dot)}+ mismatches of {n_dot}")
    for r in dot:
        print("   ", r)
else:
    print(f"OK   sparse_dot_long: {n_dot} pairs match DuckDB")

sys.exit(fails)
