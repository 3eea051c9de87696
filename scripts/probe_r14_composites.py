#!/usr/bin/env python3
"""r14 scale probe (r13 verdict item 5): decade-probe the r13/r14
composites at sf1.

Subjects — the driver rows themselves, run verbatim at sf0.1 and on the
deterministic 10x ``.probe/sf1`` replica (best-of-2 each):

* q_gate_funnel     — claim: ONE corpus scan + a gates×groups map-side
                      groupBy (output size is data-independent).
* q_quality_drift   — claim: inline zero-shuffle scorer composed into
                      distribution_drift (bins×groups partials).
* q_split_leakage   — claim: MinHash pair mine (banded, never
                      all-pairs) + pair-graph-sized audit joins.
* q_curation_report — claim: TWO corpus scans (funnel + dedup hash
                      groupBy) + channel-sized everything else.

For each subject: wall ratio at 10x data, and the physical plan's
exchange count at both scales (a composite whose exchange count GROWS
with data would be a re-planning bug).

Run: python scripts/probe_r14_composites.py     (machine otherwise quiet)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from tundradb_spark.plans import audit
from tundradb_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".probe", "sf1",
)
SUBJECTS = [
    "q_gate_funnel",
    "q_quality_drift",
    "q_split_leakage",
    "q_curation_report",
]


def fn(name):
    if name in entry.queries():
        return entry.queries()[name]
    return entry.parked_queries()[name]


def run(spark, name, sf_dir, n=2):
    walls = []
    for _ in range(n):
        t0 = time.monotonic()
        fn(name)(spark, sf_dir).collect()
        walls.append(time.monotonic() - t0)
    return min(walls), walls


def main():
    spark = get_spark("probe-r14", cpus=32)
    out = {}
    for name in SUBJECTS:
        ex01 = audit.count_exchanges(fn(name)(spark, SF01))
        ex1 = audit.count_exchanges(fn(name)(spark, SF1))
        b01, w01 = run(spark, name, SF01)
        b1, w1 = run(spark, name, SF1)
        out[name] = {
            "sf0.1_best": round(b01, 3),
            "sf1_best": round(b1, 3),
            "ratio": round(b1 / b01, 2),
            "walls_sf0.1": [round(w, 3) for w in w01],
            "walls_sf1": [round(w, 3) for w in w1],
            "exchanges_sf0.1": ex01,
            "exchanges_sf1": ex1,
        }
        print(name, json.dumps(out[name]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
