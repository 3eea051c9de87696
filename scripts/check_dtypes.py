#!/usr/bin/env python3
"""Driver-canonicalizer TYPE simulation (r13, the r12 q_join_fanout
lesson): scripts/check_oracle.py compares normalized VALUES, but the
driver's correctness hash is computed over pandas frames and is
TYPE-sensitive — r12's only red row had bit-identical values whose
Spark Decimal objects hashed differently from DuckDB's decimal dtype.
This script checks the layer check_oracle can't: for every seated row,
load the Spark result via toPandas() and the DuckDB oracle via .df()
and compare per-column pandas dtype KINDS.

Usage: python scripts/check_dtypes.py [query ...]   # default: all seated
       python scripts/check_dtypes.py --parked      # parked rows too
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from tundradb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    args = sys.argv[1:]
    parked = "--parked" in args
    only = {a for a in args if a != "--parked"}
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    if only or parked:
        qs = {**qs, **entry_mod.parked_queries()}
        os_ = {**os_, **entry_mod.parked_oracle_sql()}
    if parked and not only:
        only = set(qs)
    names = sorted(only or entry_mod.queries())

    spark = get_spark("check-dtypes")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    bad = 0
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            ddf = con.execute(os_[name]).df()
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            print(f"{name:26s} ERR   {str(ex)[:100]}")
            bad += 1
            continue
        scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
        if scols != dcols:
            print(f"{name:26s} COLS  {scols} != {dcols}")
            bad += 1
            continue
        diffs = [
            f"{c}: spark={sdf[c].dtype} duckdb={ddf[c].dtype}"
            for c in scols
            if sdf[c].dtype.kind != ddf[c].dtype.kind
        ]
        if diffs:
            print(f"{name:26s} DTYPE {'; '.join(diffs)}")
            bad += 1
        else:
            print(f"{name:26s} OK")
    print(f"\n{bad} type-class mismatches across {len(names)} queries")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
