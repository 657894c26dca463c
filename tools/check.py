#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB over the sfDir parquet tables, loads the Spark
result parquet from <outDir>/<name>/, sorts columns by name and rows by
all columns, and compares values exactly. Reports per-query PASS/FAIL.
"""
import duckdb
import glob
import json
import math
import sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)


def table_of(con, sql, oracle=False):
    rel = con.sql(sql)
    cols = rel.columns
    if oracle:
        # The driver's comparator goes through pandas, where DuckDB
        # HUGEINT (the result type of sum() over ANY integer, including
        # BIGINT, and of integer window sums) converts to float64 —
        # "3.0" vs the Spark side's "3". An oracle emitting HUGEINT is
        # therefore a guaranteed driver-hash mismatch even when values
        # are identical. Root-caused round 9 (CORRECTNESS_r08: the five
        # hash-red queries were exactly the five HUGEINT-emitting
        # oracles). Fix the SQL with CAST(sum(...) AS BIGINT).
        hug = [c for c, t in zip(cols, rel.types) if "HUGEINT" in str(t)]
        if hug:
            raise ValueError(
                f"oracle emits HUGEINT column(s) {hug} — wrap the sum() "
                "in CAST(... AS BIGINT) or the driver gate will "
                "hash-mismatch via pandas float64 conversion")
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def table_of_pandas(con, sql):
    # Driver-faithful path: fetch via pandas (the driver's comparator
    # normalizes through DataFrames, where DuckDB HUGEINT -> float64,
    # DECIMAL -> float64, TIMESTAMPTZ -> tz-aware). Running both modes
    # catches type-seam divergences the exact path can't see.
    df = con.sql(sql).df()
    df = df[sorted(df.columns)]
    rows = sorted(tuple(str(v) for v in r)
                  for r in df.itertuples(index=False, name=None))
    return list(df.columns), rows


def main():
    argv = [a for a in sys.argv[1:] if a != "--pandas"]
    pandas_mode = "--pandas" in sys.argv
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # A misspelled filter name must not yield "0 pass, 0 fail" + exit 0
    # (a false green for a spot-check that never ran).
    unknown = only - set(oracles)
    if unknown:
        sys.exit(f"unknown query name(s): {sorted(unknown)} — "
                 f"not in {out_dir}/oracle_sql.json")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            if pandas_mode:
                got_cols, got = table_of_pandas(con, spark_sql)
                want_cols, want = table_of_pandas(con, sql)
            else:
                got_cols, got = table_of(con, spark_sql)
                want_cols, want = table_of(con, sql, oracle=True)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            n_fail += 1
        elif got != want:
            print(f"FAIL {name}: {len(got)} rows vs {len(want)} rows", end="")
            diffs = [(a, b) for a, b in zip(got, want) if a != b]
            if diffs:
                print(f"; first diff:\n  spark={diffs[0][0]}\n  duck ={diffs[0][1]}")
            else:
                print(f"; row-set mismatch (e.g. spark extra: "
                      f"{(set(got)-set(want)) and list(set(got)-set(want))[:1]})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    if n_pass + n_fail == 0:
        sys.exit("no queries compared — empty oracle_sql.json?")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
