#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage:
  python3 tools/check_parity.py <sfDir> <verifyOutDir>          # full compare
  python3 tools/check_parity.py --describe-only <sfDir> <oracle_sql.json>

DRIVER-FAITHFUL (round-9 fix): the driver fetches oracle results via
pandas (`fetchdf()`) and hashes *stringified* values. DuckDB widens
SUM(BIGINT) to HUGEINT, which pandas renders as float64, so the driver
sees "3.0" where Spark printed "3" — a hash mismatch even though the
Python values are equal. Round 8 shipped three reds (q147/q154/q155)
precisely because this replica compared fetchall() Python ints (int==int
passes). This version reproduces the driver's fetch path: both sides go
through fetchdf() and compare as strings, and a DESCRIBE audit fails any
oracle whose output schema contains HUGEINT before comparison even runs.
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Types pandas silently coerces in a way that changes the stringified
# value vs Spark's parquet output. HUGEINT -> float64 is the proven trap.
BANNED_ORACLE_TYPES = ("HUGEINT", "INT128", "UHUGEINT")


def cell_str(v):
    """Driver-style stringification of one pandas-fetched cell."""
    if v is None:
        return "<null>"
    if isinstance(v, float) and pd.isna(v):
        return "<null>"
    # pandas NaT / pd.NA for datetime/object nulls
    try:
        if not isinstance(v, (list, tuple)) and pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass  # arrays: pd.isna is elementwise — fall through to str()
    if isinstance(v, float):
        return repr(v)
    return str(v)


def fetch_str_rows(rel, order):
    """fetchdf() like the driver, reorder columns by name, stringify cells."""
    df = rel.fetchdf()
    df = df[order]
    rows = [tuple(cell_str(v) for v in tup)
            for tup in df.itertuples(index=False, name=None)]
    return sorted(rows)


def audit_types(con, name, sql):
    """DESCRIBE the oracle; return list of (col, type) in the banned set."""
    desc = con.sql(f"DESCRIBE {sql}").fetchall()
    return [(c, t) for c, t, *_ in desc
            if any(b in t.upper() for b in BANNED_ORACLE_TYPES)]


def main():
    argv = [a for a in sys.argv[1:] if a != "--skip-missing"]
    skip_missing = "--skip-missing" in sys.argv  # dev subset runs only
    describe_only = argv[0] == "--describe-only"
    if describe_only:
        sf_dir, oracle_path = argv[1], argv[2]
    else:
        sf_dir, out_dir = argv[0], argv[1]
        oracle_path = f"{out_dir}/oracle_sql.json"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(oracle_path))
    failures = 0
    for name in sorted(oracles):
        bad_types = audit_types(con, name, oracles[name])
        if bad_types:
            print(f"FAIL {name}: oracle output dtype would break the driver "
                  f"hash (pandas coerces to float64): {bad_types} — add "
                  f"CAST(... AS BIGINT)")
            failures += 1
            continue
        if describe_only:
            print(f"PASS {name}: oracle output dtypes safe")
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            if skip_missing:
                continue
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        spark_cols = list(spark_rel.columns)
        oracle_rel = con.sql(oracles[name])
        oracle_cols = list(oracle_rel.columns)
        if sorted(spark_cols) != sorted(oracle_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} "
                  f"oracle={sorted(oracle_cols)}")
            failures += 1
            continue
        order = sorted(spark_cols)
        s_rows = fetch_str_rows(spark_rel, order)
        o_rows = fetch_str_rows(oracle_rel, order)
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
            failures += 1
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            for j, (a, b) in enumerate(zip(sr, orow)):
                if a != b:
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
