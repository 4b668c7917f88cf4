#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs SparkEntry.oracleSql,
mimicking the driver's DuckDB compare: run each oracle SQL over the same
parquet tables, sort columns by name, and compare cell values against the
Spark-written result parquet. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            oracle = con.sql(sql).df()
            spark = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        oracle = oracle[sorted(oracle.columns)]
        spark = spark[sorted(spark.columns)]
        if list(oracle.columns) != list(spark.columns):
            print(f"FAIL {name}: columns oracle={list(oracle.columns)} "
                  f"spark={list(spark.columns)}")
            n_fail += 1
            continue
        if len(oracle) != len(spark):
            print(f"FAIL {name}: rows oracle={len(oracle)} spark={len(spark)}")
            n_fail += 1
            continue
        mismatch = None
        o_rows = oracle.itertuples(index=False)
        s_rows = spark.itertuples(index=False)
        for i, (orow, srow) in enumerate(zip(o_rows, s_rows)):
            oc = tuple(canon(v) for v in orow)
            sc = tuple(canon(v) for v in srow)
            if oc != sc:
                mismatch = (i, oc, sc)
                break
        if mismatch:
            i, oc, sc = mismatch
            print(f"FAIL {name}: row {i}\n  oracle={oc}\n  spark ={sc}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(oracle)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
