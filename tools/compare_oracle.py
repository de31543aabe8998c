#!/usr/bin/env python3
"""Local pre-verification mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables, then
compares: schema (column names), row count, and exact values (columns sorted
by name, rows sorted by all columns). Exit code 1 if any query mismatches.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            failures.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        if sorted(got.columns) != sorted(want.columns):
            failures.append(
                (name, f"schema: got {sorted(got.columns)} want {sorted(want.columns)}"))
            continue
        if len(got) != len(want):
            failures.append((name, f"rows: got {len(got)} want {len(want)}"))
            continue
        g, w = canon(got), canon(want)
        for c in g.columns:
            gv, wv = g[c].tolist(), w[c].tolist()
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(gv, wv)) if a != b
                   and not (a != a and b != b)]
            if bad:
                i, a, b = bad[0]
                failures.append(
                    (name, f"value col={c} row={i}: got {a!r} want {b!r} "
                           f"({len(bad)} diffs)"))
                break
        else:
            dg = [str(t) for t in g.dtypes]
            dw = [str(t) for t in w.dtypes]
            flag = "" if dg == dw else f"  [dtypes differ: {dg} vs {dw}]"
            print(f"OK   {name} ({len(got)} rows){flag}")
            continue
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
