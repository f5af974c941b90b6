#!/usr/bin/env python3
"""Synthesize an N-times-scaled copy of a driver sf directory for LOCAL
PERFORMANCE testing only (the correctness gates always run on the
driver-provisioned data).

Each table is unioned N times with id columns offset per replica so keys
stay unique and joins keep their selectivity; text/embedding payloads
repeat (fine for timing — the operators hash/scan them either way).
Multi-row-group output (row_group_size) so Spark can parallelize the
scan, unlike the single-row-group originals.

Usage: python3 tools/make_scale.py <srcSfDir> <destDir> <N>
"""
import sys

import duckdb

OFFSETS = {
    "region":    [("r_regionkey", 100)],
    "nation":    [("n_nationkey", 100), ("n_regionkey", 100)],
    "customer":  [("c_custkey", 10_000_000), ("c_nationkey", 0)],
    "supplier":  [("s_suppkey", 10_000_000), ("s_nationkey", 0)],
    "part":      [("p_partkey", 10_000_000)],
    "orders":    [("o_orderkey", 100_000_000), ("o_custkey", 10_000_000)],
    "lineitem":  [("l_orderkey", 100_000_000), ("l_partkey", 10_000_000),
                  ("l_suppkey", 10_000_000)],
    "events":    [("event_id", 100_000_000), ("user_id", 10_000_000)],
    "documents": [("doc_id", 10_000_000)],
    "embeddings": [("vec_id", 10_000_000)],
}


def main():
    src, dest, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    con = duckdb.connect()
    import os
    os.makedirs(dest, exist_ok=True)
    for table, offs in OFFSETS.items():
        path = f"{src}/{table}.parquet"
        if not os.path.exists(path):
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{path}'").fetchall()]
        offmap = dict(offs)
        selects = []
        for i in range(n):
            proj = ", ".join(
                f"{c} + {offmap[c] * i} AS {c}" if c in offmap and offmap[c] > 0 and i > 0
                else c
                for c in cols)
            selects.append(f"SELECT {proj} FROM '{path}'")
        q = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({q}) TO '{dest}/{table}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 50000)")
        rows = con.execute(f"SELECT COUNT(*) FROM '{dest}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {rows} rows")


if __name__ == "__main__":
    main()
