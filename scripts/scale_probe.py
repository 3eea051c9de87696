#!/usr/bin/env python3
"""Scale probe: time selected queries at sf0.01 and sf0.1 (10x the data)
and print the time ratio — the near-linear-or-better evidence the plan
audits claim.  A ratio well above ~10 on 10x data flags a super-linear
operator (the round-3 SimHash banding bug was caught exactly this way).

Usage: python scripts/scale_probe.py [query ...]   (default: round-4 set)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from tundradb_spark.session import get_spark

DEFAULT = [
    "q_text_repetition",
    "q_text_lm",
    "q_pii_scan",
    "q_quantiles",
    "q_ann_pq",
    "q_bfs_levels",
    "q_dedup_apply",
]
SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def best(fn, spark, sf, runs=2) -> float:
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    print(f"{'query':<20} {'sf0.01':>8} {'sf0.1':>8} {'ratio(10x data)':>16}")
    for n in names:
        lo = best(qs[n], spark, SFS[0])
        hi = best(qs[n], spark, SFS[1])
        print(f"{n:<20} {lo:>8.3f} {hi:>8.3f} {hi / lo:>15.1f}x")


if __name__ == "__main__":
    main()
