#!/usr/bin/env python3
"""r9 scale probe for link_prediction's superlinear worst case (r8
verdict item 5).

The seated q_link_prediction runs on the fixed-size layered triangle
graph (customers < 100 at every sf), so it cannot show data scaling.
This probe builds the graph the operator actually meets at scale and
with real skew: the doc→token bipartite graph — documents as outer
vertices, tokens as shared middle vertices with ZIPF-skewed degrees
(stopwords touch nearly every document), the exact ``Σ deg(z)²``
wedge-volume trap the docstring names, and the graph analog of the
dedup family's ``max_df`` caps.

Three measurements:

* degree stats per sf — the skew the cap exists for;
* UNCAPPED at sf0.01 → sf0.1: hub degree grows with the corpus, so the
  wedge volume grows ~quadratically — the blow-up, measured where it is
  still feasible;
* capped (``max_degree`` 100 and 20) at sf0.1 → sf1: per-middle fan-out
  bounded, so candidate volume grows linearly with the corpus — the
  scale path.  (The sf1 replica suffixes tokens per replica, so
  cross-replica matches are impossible and true linear growth is the
  correct expectation, not an artifact.)

One timed ``count`` per cell — this is a SCALE probe (growth curve +
cap trade), not a steady-state bench.
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
    """doc→token edges; token ids hashed into a disjoint range."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower("text"), r"\s+"), lambda t: t != ""
                )
            )
        ).alias("tok"),
    )
    return toks.select(
        F.col("doc_id").alias("id_a"),
        (
            F.pmod(F.xxhash64("tok"), F.lit(2_000_000_000))
            + F.lit(1_000_000_000)
        ).alias("id_b"),
    )


def run(spark, sf_dir: str, max_degree):
    g = bipartite(spark, sf_dir)
    df = link_prediction(g, max_degree=max_degree, min_common=2)
    t0 = time.perf_counter()
    rows = df.count()
    return time.perf_counter() - t0, rows


def main() -> None:
    from make_probe_sf1 import build

    sf1 = build()
    spark = get_spark("probe-linkpred")
    spark.sparkContext.setLogLevel("ERROR")

    sfs = ["/root/testdata/sf0.01", "/root/testdata/sf0.1", sf1]
    for sf in sfs:
        deg = (
            bipartite(spark, sf)
            .groupBy("id_b")
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(
                F.expr("percentile(d, 0.5)").alias("p50"),
                F.expr("percentile(d, 0.99)").alias("p99"),
                F.max("d").alias("max"),
                F.count(F.lit(1)).alias("n_mid"),
            )
            .first()
        )
        print(
            f"{sf}: token degree p50={deg['p50']:.0f} "
            f"p99={deg['p99']:.0f} max={deg['max']} vocab={deg['n_mid']}",
            flush=True,
        )

    print("\nUNCAPPED (the blow-up, measured where feasible):", flush=True)
    lo, rlo = run(spark, sfs[0], None)
    hi, rhi = run(spark, sfs[1], None)
    print(
        f"  none   sf0.01 {lo:8.3f}s {rlo:>10} rows | "
        f"sf0.1 {hi:8.3f}s {rhi:>10} rows | wall {hi / lo:.1f}x",
        flush=True,
    )

    print("\nCAPPED (the scale path) sf0.1 -> sf1:", flush=True)
    for cap in (100, 20):
        lo, rlo = run(spark, sfs[1], cap)
        hi, rhi = run(spark, sfs[2], cap)
        norm = (hi / rhi) / (lo / rlo) if rlo and rhi else float("nan")
        print(
            f"  cap {cap:>3} sf0.1 {lo:8.3f}s {rlo:>10} rows | "
            f"sf1 {hi:8.3f}s {rhi:>10} rows | wall {hi / lo:.1f}x | "
            f"per-output-row {norm:.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
