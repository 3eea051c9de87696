#!/usr/bin/env python3
"""r13 scale probe (r12 verdict item 6): decade-probe lr_train ITSELF.

SCALE_PROBE_r12 probed the frozen-weight SCORING path (lr_prob_col
gating, zero added exchanges); this probes TRAINING — the part whose
per-iteration work is 3 corpus-sized aggregations (score pass, gradient
groupBy, sparse-Gram self-join) with bounded (d+1)² driver state.

Measured per corpus (sf0.1 documents vs the deterministic 10× .probe/sf1
replica, n_buckets=256, bigrams, n_iter=4):

* wall for lr_train end-to-end (best of 2);
* the Hessian fanout bound: the per-doc design self-join expands each
  doc with k distinct buckets into k² Gram terms, so we report
  sum(k), sum(k²), avg/max k over the corpus — the probe-measured
  version of the documented "quadratic in min(distinct grams, cap)"
  bound;
* fit invariance: the sf0.1-trained weights re-trained under a
  different partitioning must be bit-identical (the decimal(28,18)
  order-proof claim at 10× volume).

Run: python scripts/probe_r13_lrtrain.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tundradb_spark.session import get_spark

N_BUCKETS = 256
N_ITER = 4


def fanout_stats(docs, n_buckets):
    """k = distinct hashed buckets per doc (the design row count per
    doc); the Gram self-join emits k² terms per doc."""
    from tundradb_spark.pipeline.classify import _lr_design

    design = _lr_design(
        docs.filter(F.col("label").isNotNull()),
        "text", "doc_id", n_buckets, bigrams=True,
    )
    per_doc = design.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("k")
    )
    row = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("k").alias("sum_k"),
        F.sum(F.col("k") * F.col("k")).alias("sum_k2"),
        F.avg("k").alias("avg_k"),
        F.max("k").alias("max_k"),
    ).collect()[0]
    return row


def train_wall(docs, runs=2):
    from tundradb_spark.pipeline.classify import lr_train

    walls = []
    weights = None
    for _ in range(runs):
        t0 = time.perf_counter()
        w = lr_train(
            docs, n_buckets=N_BUCKETS, n_iter=N_ITER, bigrams=True
        )
        rows = sorted(map(tuple, w.collect()))
        walls.append(time.perf_counter() - t0)
        weights = rows
    return min(walls), weights


def main():
    spark = get_spark("probe-r13-lrtrain")
    spark.sparkContext.setLogLevel("ERROR")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cells = [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", os.path.join(repo, ".probe", "sf1")),
    ]
    results = {}
    for name, path in cells:
        docs = (
            spark.read.parquet(f"{path}/documents.parquet")
            .withColumn("label", (F.col("lang") == "en").cast("int"))
        )
        st = fanout_stats(docs, N_BUCKETS)
        wall, weights = train_wall(docs)
        results[name] = (st, wall, weights)
        print(
            f"[{name}] docs={st['n_docs']:>7,} wall={wall:6.1f}s  "
            f"design rows sum_k={st['sum_k']:,} gram terms "
            f"sum_k2={st['sum_k2']:,}  avg_k={st['avg_k']:.1f} "
            f"max_k={st['max_k']} (cap {N_BUCKETS})",
            flush=True,
        )

    (st0, w0, wt0), (st1, w1, wt1) = results["sf0.1"], results["sf1"]
    print(f"wall ratio sf1/sf0.1 = {w1 / w0:.2f}x on "
          f"{st1['n_docs'] / st0['n_docs']:.1f}x docs, "
          f"{st1['sum_k2'] / st0['sum_k2']:.1f}x gram terms")

    # partition-invariance of the fit at sf1: retrain on a repartitioned
    # frame; decimal(28,18) additive moments must make it bit-identical
    from tundradb_spark.pipeline.classify import lr_train

    docs1 = (
        spark.read.parquet(f"{cells[1][1]}/documents.parquet")
        .withColumn("label", (F.col("lang") == "en").cast("int"))
        .repartition(7, "lang")
    )
    wt1b = sorted(map(tuple, lr_train(
        docs1, n_buckets=N_BUCKETS, n_iter=N_ITER, bigrams=True
    ).collect()))
    print(f"sf1 fit partition-invariant: {wt1b == wt1}")
    spark.stop()


if __name__ == "__main__":
    main()
