#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with
views over <sfDir>/*.parquet, sorts columns by name and rows by all
columns, and compares cell-by-cell (exact; NaN==NaN).
"""
import json
import math
import sys
import glob

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(rows, ncols):
    def key(row):
        return tuple((v is not None, str(type(v)), str(v)) for v in row)
    return sorted(rows, key=key)


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # Type-strict: the driver hashes stringified values, so int 3549 vs
    # float 3549.0 is a FAILURE there (caught live on q28 in round 2).
    # bool is an int subclass in Python — keep bool==bool only.
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, int) and isinstance(b, int):
        return a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return False  # int-vs-float type drift — driver hash would differ
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        spark_cols = list(spark_rel.columns)
        oracle_rel = con.sql(oracles[name])
        oracle_cols = list(oracle_rel.columns)
        if sorted(spark_cols) != sorted(oracle_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
            failures += 1
            continue
        order = sorted(spark_cols)
        s_rows = spark_rel.fetchall()
        o_rows = oracle_rel.fetchall()
        s_idx = [spark_cols.index(c) for c in order]
        o_idx = [oracle_cols.index(c) for c in order]
        s_rows = [tuple(r[i] for i in s_idx) for r in s_rows]
        o_rows = [tuple(r[i] for i in o_idx) for r in o_rows]
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
            failures += 1
            continue
        s_rows = norm(s_rows, len(order))
        o_rows = norm(o_rows, len(order))
        bad = None
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            for j, (a, b) in enumerate(zip(sr, orow)):
                if not cells_equal(a, b):
                    bad = (i, order[j], a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} oracle={b!r}")
            failures += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
