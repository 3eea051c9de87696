#!/usr/bin/env python3
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full computation + row
materialization, no driver-side collect overhead). Best of 2 runs per query
(first run pays codegen/JIT; a cluster amortizes that over far more data).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from tundradb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("BENCH_RUNS", "2"))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("tundradb-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # warm the JVM/codegen paths once with the cheapest query
    try:
        materialize(qs["q_topk"](spark, SF_DIR))
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        best = float("inf")
        for _ in range(max(1, RUNS)):
            t0 = time.perf_counter()
            materialize(fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
