#!/usr/bin/env python3
"""Scale probe: time selected queries at sf0.01 and sf0.1 (10x the data)
and print the time ratio — the near-linear-or-better evidence the plan
audits claim.  A ratio well above ~10 on 10x data flags a super-linear
operator (the round-3 SimHash banding bug was caught exactly this way).

Round-5 additions (verdict item 5): the storage-path probes.
``--indexed`` rows time the SAME ANN query twice — compute path
(TUNDRA_ANN_USE_INDEX unset) vs on-disk partition-pruned index
(TUNDRA_ANN_USE_INDEX=1, index build excluded via warmup) — so the table
shows both the data-scaling ratio AND that the indexed probe beats its
compute twin at sf0.1.

Round-7 additions (verdict items 3 & 8):

* ``--norm`` rows add a ``per-output-row`` column: time ratio divided by
  output-row ratio.  A query whose OUTPUT grows super-linearly by
  construction (duplicated-segment volume in a boilerplate-heavy corpus)
  can show a >1x wall ratio with perfectly flat work per output row —
  the normalized column separates "operator is super-linear" from
  "answer is bigger".
* ``--sf1`` probes sf0.1 → a generated 10x replica (``.probe/sf1``,
  built on demand by scripts/make_probe_sf1.py) — the sf0.01 base is
  overhead-dominated enough to hide super-linearity.

Usage: python scripts/scale_probe.py [query ...]   (default: round-5 set)
       python scripts/scale_probe.py --norm [query ...]
       python scripts/scale_probe.py --sf1 [query ...]
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
    "q_hist_quantiles",   # the bounded-memory twin — must hold ~1x
    "q_ann_pq",
    "q_bfs_levels",
    "q_dedup_apply",
    "q_dedup_incremental",  # r6 banded-index probe — watch for regression
    "q_pipeline_e2e",
]
#: r6 borderline rows — probe with the per-output-row column
NORM_DEFAULT = ["q_dedup_exact", "q_pipeline_e2e"]
#: r6 verdict item 8: worst standard rows, re-based at sf0.1→sf1
SF1_DEFAULT = ["q_quantiles", "q_dedup_exact", "q_text_scores"]
#: ANN queries with a persisted-index twin (TUNDRA_ANN_USE_INDEX=1)
INDEXED = ["q_ann_ivf", "q_ann_lsh"]
SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def best(fn, spark, sf, runs=2, warmup=False) -> float:
    if warmup:  # absorbs one-time index builds (bench.py's convention)
        fn(spark, sf).write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def probe_pair(qs, names, spark, sfs, labels, norm=False) -> None:
    head = f"{'query':<26} {labels[0]:>8} {labels[1]:>8} {'ratio(10x data)':>16}"
    if norm:
        head += f" {'rows ' + labels[0]:>12} {'rows ' + labels[1]:>12} {'per-output-row':>15}"
    print(head)
    for n in names:
        lo = best(qs[n], spark, sfs[0])
        hi = best(qs[n], spark, sfs[1])
        line = f"{n:<26} {lo:>8.3f} {hi:>8.3f} {hi / lo:>15.1f}x"
        if norm:
            rlo = qs[n](spark, sfs[0]).count()
            rhi = qs[n](spark, sfs[1]).count()
            per_row = (hi / rhi) / (lo / rlo) if rlo and rhi else float("nan")
            line += f" {rlo:>12} {rhi:>12} {per_row:>14.1f}x"
        print(line)


def main() -> None:
    args = sys.argv[1:]
    norm = "--norm" in args
    sf1 = "--sf1" in args
    names = [a for a in args if not a.startswith("--")]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**entry_mod.queries(), **entry_mod.parked_queries()}
    if sf1:
        from make_probe_sf1 import build

        hi_dir = build()  # idempotent — skips existing tables
        probe_pair(
            qs,
            names or SF1_DEFAULT,
            spark,
            ["/root/testdata/sf0.1", hi_dir],
            ["sf0.1", "sf1"],
            norm=norm,
        )
        return
    if norm:
        probe_pair(
            qs, names or NORM_DEFAULT, spark, SFS, ["sf0.01", "sf0.1"],
            norm=True,
        )
        return
    probe_pair(qs, names or DEFAULT, spark, SFS, ["sf0.01", "sf0.1"])
    if names and not set(INDEXED) & set(names):
        return
    for n in INDEXED:
        os.environ.pop("TUNDRA_ANN_USE_INDEX", None)
        lo_c = best(qs[n], spark, SFS[0])
        hi_c = best(qs[n], spark, SFS[1])
        os.environ["TUNDRA_ANN_USE_INDEX"] = "1"
        try:
            lo_i = best(qs[n], spark, SFS[0], warmup=True)
            hi_i = best(qs[n], spark, SFS[1], warmup=True)
        finally:
            os.environ.pop("TUNDRA_ANN_USE_INDEX", None)
        print(f"{n + ' [compute]':<26} {lo_c:>8.3f} {hi_c:>8.3f} {hi_c / lo_c:>15.1f}x")
        print(
            f"{n + ' [indexed]':<26} {lo_i:>8.3f} {hi_i:>8.3f} {hi_i / lo_i:>15.1f}x"
            f"   vs compute at sf0.1: {hi_i / hi_c:.2f}x"
        )


if __name__ == "__main__":
    main()
