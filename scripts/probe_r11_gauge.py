#!/usr/bin/env python3
"""r11 (r10 verdict item 5): decade probe for the dedup recall gauge's
sampled mode.

r10 measured the FULL gauge at sf1: 192 s wall, 0.08x per output pair —
the operator is linear, the ANSWER is not (truth pairs + mined pairs
grow with the corpus's duplicate mass).  The sampled mode thins the
corpus by the deterministic md5 hash-coin BEFORE every stage, so pair
volume scales ~fraction² and the wall follows.  This probe times the
gauge at sf0.1 and the 10x ``.probe/sf1`` replica, full vs sampled
(fraction 0.5 — the q_dedup_recall_sampled setting — and 0.25), and
prints wall + the gauge row (n_true/n_pred stay the evidence that the
sampled run measures the same thing, just on fewer pairs).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tundradb_spark.session import get_spark

COPY_OFFSET = 1_000_000
NUM_HASHES, BANDS, SHINGLE_K = 12, 4, 5


def corpus_at(spark, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return docs.unionAll(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + COPY_OFFSET).alias("doc_id"), "text"
        )
    )


def main() -> None:
    from tundradb_spark.pipeline.dedup import recall_gauge

    sf01 = "/root/testdata/sf0.1"
    sf1 = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".probe", "sf1",
    )
    spark = get_spark("probe-r11-gauge")
    spark.sparkContext.setLogLevel("ERROR")

    walls: dict[tuple[str, str], float] = {}
    for label, sf in [("sf0.1", sf01), ("sf1", sf1)]:
        corpus = corpus_at(spark, sf)
        for mode, frac in [("full", None), ("f=0.5", 0.5), ("f=0.25", 0.25)]:
            t0 = time.perf_counter()
            row = recall_gauge(
                corpus,
                num_hashes=NUM_HASHES,
                bands=BANDS,
                shingle_k=SHINGLE_K,
                sample_fraction=frac,
            ).collect()[0]
            wall = time.perf_counter() - t0
            walls[(label, mode)] = wall
            print(
                f"[{label} {mode:>6}] wall={wall:7.1f}s n_true={row['n_true']}"
                f" n_pred={row['n_pred']} recall={row['recall']}",
                flush=True,
            )
    for mode in ["full", "f=0.5", "f=0.25"]:
        r = walls[("sf1", mode)] / walls[("sf0.1", mode)]
        print(f"wall ratio sf0.1->sf1 [{mode}]: {r:.1f}x")
    print(
        "sampled-vs-full wall at sf1: "
        f"0.5 -> {walls[('sf1', 'f=0.5')] / walls[('sf1', 'full')]:.2f}x, "
        f"0.25 -> {walls[('sf1', 'f=0.25')] / walls[('sf1', 'full')]:.2f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
