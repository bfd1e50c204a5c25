#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/local_verify.py [outDir] [sfDir] [query ...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran (or run
with --run to invoke it). For each query result parquet, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, sorts
columns by name and rows by all columns, and compares exactly (NaN==NaN,
None==None). Reports per-query PASS/FAIL with a diff sample.

This is builder-side tooling only — the shipped Scala library has no
python dependency.
"""
import json, math, sys, subprocess
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame, ordered: bool = False) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything for a robust total sort + exact compare
    def cell(v):
        if v is None:
            return "<NULL>"
        if isinstance(v, float):
            if math.isnan(v):
                return "<NULL>"  # parquet NaN vs SQL NULL: treat same as driver likely does? keep distinct-safe: NaN only appears as missing
            return repr(v)
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    out = df.map(cell)
    if not ordered:  # --ordered: keep file/result order (strict driver mode)
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if len(args) > 0 else "/tmp/graft_verify"
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    only = set(args[2:])

    if "--run" in sys.argv:
        subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", check=True)

    con = duckdb.connect()
    # keep oracle spill off the repo disk and bounded — an unboundedly
    # spilling oracle once wrote 78 GB into ./.tmp and filled the volume
    con.execute("PRAGMA temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute("PRAGMA max_temp_directory_size='20GB'")
    con.execute("PRAGMA memory_limit='16GB'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck_df = con.sql(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        ordered = "--ordered" in sys.argv
        a, b = norm(spark_df, ordered), norm(duck_df, ordered)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        neq = (a != b)
        if neq.any().any():
            bad = neq.any(axis=1)
            i = bad.idxmax()
            print(f"FAIL {name}: {int(bad.sum())}/{len(a)} rows differ; first at {i}:")
            print("  spark:", a.loc[i].to_dict())
            print("  duck :", b.loc[i].to_dict())
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
