#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: tools/check.py [sfdir] [outdir]
  1. assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran
  2. registers each test table as a DuckDB view
  3. runs each oracle_sql.json query, compares to outdir/<name> parquet:
     columns sorted by name, rows sorted by all columns, exact value match.
"""
import json, sys, glob
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
failures = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        failures += 1
        continue
    try:
        got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        failures += 1
        continue
    def canon(df):
        df = df[sorted(df.columns)]
        # list/ndarray cells (array-typed output columns) are unhashable
        # for pandas sorting — canonicalize to tuples first.
        import numpy as np
        def _canon_cell(v):
            # per-VALUE, not row-0-sniffed: a nullable array column whose
            # first cell is None must still convert its list cells
            if v is None:
                return v
            if isinstance(v, (list, np.ndarray)):
                return tuple(v)
            return v
        for c in df.columns:
            if df[c].dtype == object and len(df):
                df = df.assign(**{c: df[c].map(_canon_cell)})
        if len(df):
            df = df.sort_values(by=list(df.columns), kind="mergesort")
        return df.reset_index(drop=True)
    got, want = canon(got), canon(want)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        failures += 1
        continue
    # The driver hashes raw values, so an int64 column vs a float64 column
    # (e.g. DuckDB SUM -> HUGEINT -> float64) hash-mismatches even when
    # numerically equal. Enforce matching dtype *kind* here.
    kind_mismatch = [c for c in got.columns
                     if got[c].dtype.kind != want[c].dtype.kind]
    if kind_mismatch:
        print(f"FAIL {name}: dtype kind mismatch "
              + ", ".join(f"{c}: spark={got[c].dtype} oracle={want[c].dtype}"
                          for c in kind_mismatch))
        failures += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        failures += 1
        continue
    if len(got) == 0:
        # 0 == 0 passes the hash gate but proves nothing (a join over
        # non-overlapping domains is vacuously "correct") — make it loud.
        print(f"WARN {name}: 0 rows on both sides — vacuous comparison")
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        print(f"OK   {name}: {len(got)} rows")
    except AssertionError as e:
        print(f"FAIL {name}: {str(e).splitlines()[0]}")
        # show first mismatching cells
        for c in got.columns:
            neq = ~((got[c] == want[c]) | (got[c].isna() & want[c].isna()))
            if neq.any():
                i = neq.idxmax()
                print(f"  col {c} row {i}: got={got[c][i]!r} want={want[c][i]!r}")
        failures += 1
print(f"\n{len(oracle)-failures}/{len(oracle)} queries match")
sys.exit(1 if failures else 0)
