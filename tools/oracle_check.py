#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (NOT part of the
Scala library; dev tooling only).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the Spark parquet result, run
the oracle SQL from oracle_sql.json in DuckDB (with each fixture parquet
registered under its bare table name), sort columns by name, and compare
row-by-row. Reports exact-match / mismatch and max numeric deviation.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = Path(out_dir) / name
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        max_dev = 0.0
        bad = None
        for c in got.columns:
            for i, (a, b) in enumerate(zip(got[c].tolist(), want[c].tolist())):
                a, b = norm(a), norm(b)
                if isinstance(a, float) and isinstance(b, float):
                    if a != b:
                        max_dev = max(max_dev, abs(a - b))
                        if bad is None:
                            bad = (c, i, a, b)
                elif a is None and b is None:
                    pass
                elif (a is None) != (b is None) or str(a) != str(b):
                    if bad is None:
                        bad = (c, i, a, b)
                        max_dev = float("inf")
        if bad is None:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            c, i, a, b = bad
            print(f"FAIL {name}: first diff col={c} row={i}: {a!r} != {b!r} (max_dev={max_dev})")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
