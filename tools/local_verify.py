#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <outDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
  2. loads outDir/oracle_sql.json, registers each <sfDir>/*.parquet as a
     DuckDB view, runs each oracle query
  3. compares against outDir/<name>/ parquet: row count, column set
     (sorted by name), exact values (floats: exact bit equality first,
     then tolerance report)

Driver-side tool only (duckdb/pandas/pyarrow are NOT dependencies of the
engine). Exit code 0 = all match.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)],
                     ignore_index=True)

def normalize(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df

def kind(s):
    """Coarse dtype kind — the granularity at which the driver's hasher
    renders values differently (float 75.0 vs int 75)."""
    if pd.api.types.is_float_dtype(s): return "float"
    if pd.api.types.is_bool_dtype(s): return "bool"
    if pd.api.types.is_integer_dtype(s): return "int"
    if pd.api.types.is_datetime64_any_dtype(s): return "datetime"
    return "object"

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracles.items()):
        got = load_result(f"{out_dir}/{name}")
        if got is None:
            failures.append((name, "spark output missing"))
            print(f"FAIL {name}: no spark output"); continue
        try:
            rel = con.sql(sql)
            # r7 postmortem: DuckDB types bare SUM(BIGINT) as HUGEINT,
            # which the driver's hasher renders differently from Spark's
            # BIGINT even when the values are identical. Fail loudly so
            # the divergence can never pass the local gate again.
            huge = [c for c, t in zip(rel.columns, rel.types)
                    if "HUGEINT" in str(t).upper()]
            if huge:
                failures.append((name, f"oracle HUGEINT columns {huge}"))
                print(f"FAIL {name}: oracle emits HUGEINT columns {huge} "
                      f"— CAST(... AS BIGINT) in the oracle SQL"); continue
            exp = rel.df()
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error: {e}"); continue
        got, exp = normalize(got), normalize(exp)
        if list(got.columns) != list(exp.columns):
            failures.append((name, f"columns {list(got.columns)} vs {list(exp.columns)}"))
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); continue
        if len(got) != len(exp):
            failures.append((name, f"rows {len(got)} vs {len(exp)}"))
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); continue
        kinds = [(c, kind(got[c]), kind(exp[c])) for c in got.columns
                 if kind(got[c]) != kind(exp[c])]
        if kinds:
            failures.append((name, f"dtype kind mismatch {kinds}"))
            print(f"FAIL {name}: dtype kind mismatch (spark vs oracle): "
                  f"{kinds}"); continue
        bad = []
        for c in got.columns:
            g, e = got[c], exp[c]
            if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
                eq = (g.values == e.values) | (pd.isna(g.values) & pd.isna(e.values))
                if not eq.all():
                    i = int(np.argmax(~eq))
                    bad.append(f"{c}[{i}]: {g.iloc[i]!r} vs {e.iloc[i]!r} "
                               f"(maxdiff {np.nanmax(np.abs(g.values - e.values))})")
            else:
                eq = (g.astype(object).values == e.astype(object).values) | \
                     (pd.isna(g).values & pd.isna(e).values)
                if not eq.all():
                    i = int(np.argmax(~eq))
                    bad.append(f"{c}[{i}]: {g.iloc[i]!r} vs {e.iloc[i]!r}")
        if bad:
            failures.append((name, "; ".join(bad)))
            print(f"FAIL {name}: {'; '.join(bad[:3])}")
        else:
            print(f"OK   {name} ({len(got)} rows, {len(got.columns)} cols)")
    print(f"\n{len(oracles) - len(failures)}/{len(oracles)} queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
