#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: tools/check.py [sfdir] [outdir] [--json artifact.json]
  1. assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran
  2. registers each test table as a DuckDB view
  3. runs each oracle_sql.json query, compares to outdir/<name> parquet:
     columns sorted by name, rows sorted by all columns, exact value match.
  4. with --json, also writes a CORRECTNESS-style per-query artifact
     (used by the sf1 ladder sweep — see tools/check_sf1.sh).
"""
import json, sys, glob
import duckdb
import pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith("--")]
json_out = None
if "--json" in sys.argv:
    json_out = sys.argv[sys.argv.index("--json") + 1]
    if json_out in args:
        args.remove(json_out)
sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
outdir = args[1] if len(args) > 1 else "/tmp/verify_out"
artifact = {}

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # /root/testdata SFs are single parquet FILES; ScaleGen output
    # (the sf1 sweep) writes multi-file parquet DIRECTORIES.
    p = f"{sfdir}/{t}.parquet"
    import os
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
failures = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        artifact[name] = {"pass": False, "err": "no spark output"}
        failures += 1
        continue
    try:
        got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        artifact[name] = {"pass": False, "err": f"oracle error {e}"[:300]}
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
        artifact[name] = {"pass": False, "err": "column mismatch"}
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
        artifact[name] = {"pass": False, "err": "dtype kind mismatch"}
        failures += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        artifact[name] = {"pass": False, "err": f"rows {len(got)} vs {len(want)}"}
        failures += 1
        continue
    if len(got) == 0:
        # 0 == 0 passes the hash gate but proves nothing (a join over
        # non-overlapping domains is vacuously "correct") — make it loud.
        print(f"WARN {name}: 0 rows on both sides — vacuous comparison")
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        print(f"OK   {name}: {len(got)} rows")
        artifact[name] = {"pass": True, "rows": int(len(got)), "err": None}
    except AssertionError as e:
        print(f"FAIL {name}: {str(e).splitlines()[0]}")
        # show first mismatching cells
        for c in got.columns:
            neq = ~((got[c] == want[c]) | (got[c].isna() & want[c].isna()))
            if neq.any():
                i = neq.idxmax()
                print(f"  col {c} row {i}: got={got[c][i]!r} want={want[c][i]!r}")
        artifact[name] = {"pass": False, "err": "value mismatch"}
        failures += 1
if json_out:
    with open(json_out, "w") as f:
        json.dump({"sf": sfdir, "queries": artifact,
                   "n_pass": len(oracle) - failures,
                   "n_total": len(oracle)}, f, indent=1, sort_keys=True)
    print(f"artifact -> {json_out}")
print(f"\n{len(oracle)-failures}/{len(oracle)} queries match")
sys.exit(1 if failures else 0)
