#!/usr/bin/env python3
"""r9 scale probe for link_prediction's superlinear worst case (r8
verdict item 5).

The seated q_link_prediction runs on the fixed-size layered triangle
graph (customers < 100 at every sf), so it cannot show data scaling.
This probe builds the graph the operator would actually meet at scale:
the lineitem supplier-order bipartite graph — orders as outer vertices,
suppliers as shared middle vertices with HEAVY skewed degrees (every
supplier serves ~60 orders at sf0.1, ~600 at sf1 in the replica), the
exact Σ deg(z)² wedge-volume trap the docstring names.

Three timings per sf: exact (no cap), max_degree at the sf0.1 p50
supplier degree, and max_degree at a tight cap — measuring both the
blow-up the cap prevents and the candidate mass it sacrifices.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tundradb_spark.graphs.algorithms import link_prediction
from tundradb_spark.session import get_spark


def bipartite(spark, sf_dir: str):
    """orders–suppliers from lineitem: vertex ids disjoint by offset."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.col("l_orderkey").alias("id_a"),
        (F.col("l_suppkey") + F.lit(1_000_000_000)).alias("id_b"),
    )


def run(spark, sf_dir: str, max_degree, runs: int = 2):
    g = bipartite(spark, sf_dir)
    df = link_prediction(g, max_degree=max_degree, min_common=2)
    # warmup then best-of-N, bench.py convention
    df.write.format("noop").mode("overwrite").save()
    ts, rows = [], None
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    rows = df.count()
    return min(ts), rows


def main() -> None:
    from make_probe_sf1 import build

    sf1 = build()
    spark = get_spark("probe-linkpred")
    spark.sparkContext.setLogLevel("ERROR")

    # supplier degree stats at each sf, to pick honest caps
    for sf in ["/root/testdata/sf0.1", sf1]:
        deg = (
            bipartite(spark, sf)
            .groupBy("id_b")
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(
                F.expr("percentile(d, 0.5)").alias("p50"),
                F.expr("percentile(d, 0.95)").alias("p95"),
                F.max("d").alias("max"),
                F.count(F.lit(1)).alias("n_mid"),
            )
            .first()
        )
        print(f"{sf}: supplier degree p50={deg['p50']:.0f} "
              f"p95={deg['p95']:.0f} max={deg['max']} n={deg['n_mid']}")

    caps = [None, 100, 40]
    print(f"{'cap':>8} {'sf0.1 s':>9} {'rows':>10} {'sf1 s':>9} "
          f"{'rows':>10} {'wall ratio':>11} {'per-out-row':>12}")
    for cap in caps:
        lo, rlo = run(spark, "/root/testdata/sf0.1", cap)
        hi, rhi = run(spark, sf1, cap)
        ratio = hi / lo
        norm = (hi / rhi) / (lo / rlo) if rlo and rhi else float("nan")
        print(f"{str(cap):>8} {lo:>9.3f} {rlo:>10} {hi:>9.3f} {rhi:>10} "
              f"{ratio:>10.1f}x {norm:>11.1f}x")


if __name__ == "__main__":
    main()
