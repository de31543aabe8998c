#!/usr/bin/env python3
"""Schema-TYPE parity sweep (the E37 class guard).

The driver's oracle compare hashes VALUES after sorting columns by name, so
a query whose Spark result is value-equal but type-render-different from the
oracle (the table_checksum failure mode: decimal vs double rendering, integer
width overflow, decimal precision/scale drift) can slip through until some SF
makes the renderings diverge. This sweep closes the class: for every
registered query it compares the Spark result's column types against the
DuckDB oracle's LIMIT-0 types, both normalized to DuckDB's type lattice by
reading the Spark parquet back through DuckDB.

Usage: python3 tools/schema_parity.py <verify_out_dir> <sf_dir>
(run graft.Verify into <verify_out_dir> first; exits 1 on any mismatch)

Equivalence rules (documented, not silent):
  - integer widths BELOW 64 bits on the oracle side widen to BIGINT —
    DuckDB infers TINYINT/INTEGER for literals/small aggregates where Spark
    declares LongType; value domains are identical, and the driver's
    float-render path treats them alike. 64-vs-128 (HUGEINT) is NOT
    forgiven: that's the E39 overflow class the sweep exists to catch.
  - DECIMAL(p,s) must match exactly in p and s.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

NARROW_INTS = {"TINYINT", "SMALLINT", "INTEGER", "UTINYINT", "USMALLINT",
               "UINTEGER"}


def norm(t):
    t = str(t).upper()
    return "BIGINT" if t in NARROW_INTS else t


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            orc = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            o_types = {c: norm(t) for c, t in zip(orc.columns, orc.types)}
        except Exception as e:
            print(f"FAIL {name}: oracle LIMIT-0 failed: {e}")
            bad += 1
            continue
        try:
            spk = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0")
            s_types = {c: norm(t) for c, t in zip(spk.columns, spk.types)}
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            bad += 1
            continue
        if set(o_types) != set(s_types):
            print(f"FAIL {name}: column sets differ: "
                  f"oracle-only={sorted(set(o_types) - set(s_types))} "
                  f"spark-only={sorted(set(s_types) - set(o_types))}")
            bad += 1
            continue
        diffs = [f"{c}: spark={s_types[c]} oracle={o_types[c]}"
                 for c in sorted(o_types) if s_types[c] != o_types[c]]
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs))
            bad += 1
        else:
            print(f"OK   {name}")
    n = len(oracle)
    print(f"\n{n - bad}/{n} queries type-parity clean")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
