#!/usr/bin/env python3
"""r13 scale probe, part 2: A/B the key_skew/join_fanout ranking rewrite.

The r13 rewrite replaced the key-universe-sized single-partition window
(rank + totals over EVERY distinct key on one task) with a distributed
TakeOrdered top-N + a scalar totals aggregate.  This probe measures both
shapes on the sf1 replica's lineitem (6M rows, ~1.5M distinct
l_orderkey — a key universe 5 orders of magnitude above top_n), pinning
result equality and the wall difference.

Run: python scripts/probe_r13_diagnostics.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from tundradb_spark.session import get_spark

TOP_N = 20


def old_key_skew(df, key_col, top_n):
    """The pre-r13 shape, verbatim: rank/totals via unpartitioned
    windows over the whole key universe."""
    counts = (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(key_col).isNull().alias("is_null"),
        )
        .groupBy("key", "is_null")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(
        F.col("cnt").desc(), F.col("is_null").asc(), F.col("key").asc()
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    every = Window.partitionBy()
    ranked = counts.select(
        F.row_number().over(w).alias("rank"),
        F.coalesce("key", F.lit("<null>")).alias("key"),
        "is_null",
        "cnt",
        F.sum("cnt").over(wcum).alias("__cum"),
        F.count(F.lit(1)).over(every).alias("n_keys"),
        F.sum("cnt").over(every).alias("total_rows"),
    ).filter(F.col("rank") <= top_n)

    def _share(expr):
        return (
            f"cast(floor(cast({expr} as double)"
            f" / cast(total_rows as double) * 1000000 + 0.5)"
            f" as double) / 1000000.0"
        )

    return ranked.select(
        F.col("rank").cast("long").alias("rank"),
        "key",
        "is_null",
        F.col("cnt").cast("long").alias("cnt"),
        F.expr(_share("cnt")).alias("share"),
        F.expr(_share("__cum")).alias("cum_share"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("total_rows").cast("long").alias("total_rows"),
    )


def best_of(fn, runs=3):
    walls, rows = [], None
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = sorted(map(tuple, fn().collect()))
        walls.append(time.perf_counter() - t0)
    return min(walls), rows


def main():
    from tundradb_spark.operators.relational import join_fanout, key_skew

    spark = get_spark("probe-r13-diag")
    spark.sparkContext.setLogLevel("ERROR")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1 = os.path.join(repo, ".probe", "sf1")
    li = spark.read.parquet(f"{sf1}/lineitem.parquet")
    od = spark.read.parquet(f"{sf1}/orders.parquet")
    nk = li.select("l_orderkey").distinct().count()
    print(f"lineitem rows={li.count():,} distinct l_orderkey={nk:,}",
          flush=True)

    w_old, r_old = best_of(lambda: old_key_skew(li, "l_orderkey", TOP_N))
    w_new, r_new = best_of(lambda: key_skew(li, "l_orderkey", TOP_N))
    print(f"key_skew   old(window)={w_old:5.2f}s new(TakeOrdered)="
          f"{w_new:5.2f}s  speedup={w_old / w_new:4.2f}x  "
          f"equal={r_old == r_new}", flush=True)

    w_fo, _ = best_of(
        lambda: join_fanout(li, od, "l_orderkey", "o_orderkey", TOP_N)
    )
    print(f"join_fanout new shape at sf1: {w_fo:5.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
