"""Local replica of the driver's t2 correctness gate.

Runs every registered query on Spark and its DuckDB oracle side-by-side,
compares row count, column names, and an order-insensitive canonical value
multiset.  Keys without an oracle get a rows-only check (runs + row count).

Usage: python tools/check_parity.py [--sf-dir /root/testdata/sf0.01] [--keys k1,k2]
"""

from __future__ import annotations

import argparse
import decimal
import math
import os
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written fixtures (the .tmp scale replicas) are DIRECTORIES
        # of part files; DuckDB needs the glob form there
        if Path(path).is_dir():
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon_cell(x):
    if x is None:
        return "\0NULL"
    if isinstance(x, float):
        if math.isnan(x):
            return "\0NULL"
        if x == 0.0:
            x = 0.0  # normalize -0.0
        return repr(float(x))
    if isinstance(x, decimal.Decimal):
        return repr(float(x))
    if isinstance(x, bool):
        return str(int(x))
    if isinstance(x, int):
        return str(x)
    if isinstance(x, pd.Timestamp):
        return x.isoformat()
    if isinstance(x, (list, tuple)):
        return "[" + ",".join(canon_cell(v) for v in x) + "]"
    return str(x)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    obj = df.astype(object).where(pd.notna(df), None)
    rows = [tuple(canon_cell(v) for v in row) for row in obj.itertuples(index=False, name=None)]
    return sorted(rows)


def compare(key: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = canon_rows(spark_df), canon_rows(duck_df)
    if a != b:
        sa, sb = set(a), set(b)
        diff_a = [r for r in a if r not in sb][:3]
        diff_b = [r for r in b if r not in sa][:3]
        problems.append(f"values differ; spark-only={diff_a} duck-only={diff_b}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--keys", default=None)
    args = ap.parse_args()

    import __spark_entry__ as ent
    from odc_product_docker_images_spark.session import get_spark

    # the harness COLLECTS full outputs for hashing — the 100x per-row
    # keys return 15-60M rows, past the 1g maxResultSize default that the
    # engine-side sessions keep.  Parity-only override (bench keeps the
    # measured default config); raise SPARK_DRIVER_MEM too for those runs.
    spark = get_spark(
        "parity-check",
        extra_conf={
            "spark.driver.maxResultSize": os.environ.get(
                "SPARK_GRAFT_MAX_RESULT", "8g"
            )
        },
    )
    con = duck_con(args.sf_dir)
    qs = ent.queries()
    oracles = ent.oracle_sql()
    keys = args.keys.split(",") if args.keys else list(qs)

    failed, passed, rows_only = [], [], []
    for key in keys:
        t0 = time.time()
        try:
            sdf = qs[key](spark, args.sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(key)
            print(f"FAIL {key}: spark error: {type(e).__name__}: {e}")
            continue
        if key not in oracles:
            rows_only.append(key)
            print(f"ROWS {key}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[key]).df()
        except Exception as e:  # noqa: BLE001
            failed.append(key)
            print(f"FAIL {key}: duckdb error: {type(e).__name__}: {e}")
            continue
        problems = compare(key, sdf, ddf)
        if problems:
            failed.append(key)
            print(f"FAIL {key} ({len(sdf)} rows): " + " | ".join(problems))
        else:
            passed.append(key)
            print(f"PASS {key}: {len(sdf)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(passed)} passed, {len(rows_only)} rows-only, {len(failed)} FAILED of {len(keys)}")
    if failed:
        print("failed:", ",".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
