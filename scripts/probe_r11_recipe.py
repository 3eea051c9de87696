#!/usr/bin/env python3
"""r11 (r10 verdict item 7): the END-TO-END recipe dress rehearsal.

Every decade probe so far measured one operator at a time; this one
composes the full training-data pipeline the way a deployment would run
it — decontaminate (held-out benchmark anti-join) → prepare_corpus
(PII gate → repetition gate → exact dedup → chunk → deterministic
sample) → pack_chunks (sequence packing) — as ONE lazy plan, and times
that plan at sf0.1 and at the 10x ``.probe/sf1`` replica
(scripts/make_probe_sf1.py's honest growth model: same duplication
rate, no cross-replica matches).

Reported per SF: wall (best of ``runs`` after one warmup), input docs,
output packed-chunk rows, and the ratios — wall ratio, output ratio,
and wall-per-output-row ratio (the house metric: answer growth must not
read as operator blow-up).  Also prints the per-stage row counts once
per SF so a stage that silently eats the corpus shows itself.

Peak shuffle: per-stage shuffle-write bytes from the live Spark UI REST
API (``/api/v1/applications/<id>/stages``) — the probe reports the
LARGEST single-stage shuffle write and the total, per SF, plus the
count of Exchange nodes in the physical plan (the structural claim:
the composition adds no surprise shuffles over its stages' own).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tundradb_spark.session import get_spark

DECON_BENCH_MOD, DECON_N = 17, 5
RUNS = int(os.environ.get("PROBE_RUNS", "2"))


def build_pipeline(spark, sf_dir: str):
    from tundradb_spark.pipeline.decontaminate import decontaminate
    from tundradb_spark.pipeline.recipe import prepare_corpus
    from tundradb_spark.pipeline.sampling import pack_chunks

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    bench = docs.filter(F.col("doc_id") % DECON_BENCH_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % DECON_BENCH_MOD != 0)
    clean = decontaminate(corpus, bench, n=DECON_N)
    chunks = prepare_corpus(
        clean,
        max_bigram_rep=0.5,
        chunk_tokens=32,
        chunk_overlap=8,
        sample_bp=8000,
        sample_seed=97,
    )
    return pack_chunks(chunks, seq_tokens=1024, n_shards=32)


def stage_counts(spark, sf_dir: str) -> dict:
    from tundradb_spark.pipeline.decontaminate import decontaminate
    from tundradb_spark.pipeline.recipe import prepare_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    bench = docs.filter(F.col("doc_id") % DECON_BENCH_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % DECON_BENCH_MOD != 0)
    clean = decontaminate(corpus, bench, n=DECON_N)
    chunks = prepare_corpus(
        clean, max_bigram_rep=0.5, chunk_tokens=32, chunk_overlap=8,
        sample_bp=8000, sample_seed=97,
    )
    return {
        "docs": docs.count(),
        "corpus": corpus.count(),
        "after_decontaminate": clean.count(),
        "chunks_sampled": chunks.count(),
    }


def shuffle_stats(spark) -> tuple[int, int]:
    """(max single-stage shuffle-write bytes, total shuffle-write bytes)
    across all completed stages of this app, via the live UI REST API."""
    import json
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            stages = json.load(r)
    except Exception as exc:  # UI disabled → report unavailable, not crash
        print(f"shuffle stats unavailable: {exc}", flush=True)
        return -1, -1
    writes = [s.get("shuffleWriteBytes", 0) for s in stages]
    return (max(writes) if writes else 0, sum(writes))


def main() -> None:
    sf01 = "/root/testdata/sf0.1"
    sf1 = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".probe", "sf1",
    )
    if not os.path.isdir(sf1):
        print("building .probe/sf1 ...", flush=True)
        import make_probe_sf1

        make_probe_sf1.build()

    # UI on: the shuffle-byte probe reads the REST stage metrics (the
    # library default disables the UI; this is a measurement script)
    spark = get_spark(
        "probe-r11-recipe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for label, sf in [("sf0.1", sf01), ("sf1", sf1)]:
        counts = stage_counts(spark, sf)
        plan = build_pipeline(spark, sf)
        n_out = plan.count()
        n_exchanges = (
            plan._jdf.queryExecution().executedPlan().toString()
            .count("Exchange")
        )
        plan.write.format("noop").mode("overwrite").save()  # warmup
        pre_max, pre_total = shuffle_stats(spark)
        ts = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            build_pipeline(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
        post_max, post_total = shuffle_stats(spark)
        # per-timed-run shuffle volume: delta over RUNS runs
        run_shuffle = (
            (post_total - pre_total) // max(RUNS, 1)
            if post_total >= 0 and pre_total >= 0
            else -1
        )
        results[label] = {
            "wall": min(ts), "rows_out": n_out,
            "exchanges": n_exchanges, "peak_stage_shuffle": post_max,
            "run_shuffle": run_shuffle, **counts,
        }
        print(
            f"[{label}] wall={min(ts):.2f}s out={n_out} "
            f"exchanges={n_exchanges} "
            f"peak_stage_shuffle={post_max} run_shuffle={run_shuffle} "
            f"stages={counts}",
            flush=True,
        )

    lo, hi = results["sf0.1"], results["sf1"]
    wall_ratio = hi["wall"] / lo["wall"]
    out_ratio = hi["rows_out"] / max(lo["rows_out"], 1)
    print(f"wall ratio (10x data): {wall_ratio:.2f}x")
    print(f"output-row ratio:      {out_ratio:.2f}x")
    print(f"per-output-row ratio:  {wall_ratio / out_ratio:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
