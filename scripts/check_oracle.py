#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each
__spark_entry__.queries()[k] on Spark and oracle_sql()[k] on DuckDB at
sf0.01, compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [query ...]
       python scripts/check_oracle.py --parked   # every parked query too
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    import decimal

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    # Decimal is deliberately NOT coerced to float/int: the driver's value
    # hash is type-sensitive, so a DuckDB HUGEINT/DECIMAL surfacing where
    # Spark returns int64 must FAIL here too (round-1 lost 3 queries to a
    # norm() that hid exactly this).
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main() -> int:
    args = sys.argv[1:]
    parked = "--parked" in args
    only = {a for a in args if a != "--parked"}
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    if only or parked:  # parked queries are checkable too
        qs = {**qs, **entry_mod.parked_queries()}
        os_ = {**os_, **entry_mod.parked_oracle_sql()}
    if parked and not only:
        only = set(entry_mod.parked_queries())
    # A deliberately PLAIN session, like the driver's: no repo confs (no
    # nanosAsLong, no UTC timezone) — every query must set what it needs at
    # runtime via ensure_runtime_confs. Round-1's check used get_spark() and
    # masked a session-dependence that killed 23/38 driver queries.
    spark = (
        SparkSession.builder.appName("check-oracle")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")  # perf only
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, SF_DIR)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in os_:
            print(f"{name:<20} rows={len(srows):>7}  (no oracle — rows-only check)")
            continue
        ddf = con.execute(os_[name])
        dcols = [d[0] for d in ddf.description]
        drows = ddf.fetchall()

        status = []
        if len(srows) != len(drows):
            status.append(f"ROWS {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            status.append(f"COLS {sorted(scols)} vs {sorted(dcols)}")
        if not status:
            order = sorted(scols)
            sidx = [scols.index(c) for c in order]
            didx = [dcols.index(c) for c in order]
            sset = sorted(
                (tuple(norm(r[i]) for i in sidx) for r in srows),
                key=lambda t: tuple(str(x) for x in t),
            )
            dset = sorted(
                (tuple(norm(r[i]) for i in didx) for r in drows),
                key=lambda t: tuple(str(x) for x in t),
            )
            if sset != dset:
                diff = [
                    (a, b) for a, b in zip(sset, dset) if a != b
                ][:3]
                status.append(f"VALUES differ, first: {diff}")
        if status:
            failures += 1
            print(f"{name:<20} FAIL  {'; '.join(status)}")
        else:
            print(f"{name:<20} OK    rows={len(srows)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
