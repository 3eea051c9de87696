#!/usr/bin/env python3
"""r10 scale probe for neighborhood_similarity (r9 verdict item 5).

q_node_similarity seats the operator on the fixed-size layered
triangle graph, so the driver row cannot show data scaling.  The wedge
join inside :func:`neighborhood_similarity` is IDENTICAL in shape to
link_prediction's (``Σ_z deg(z)²`` candidates over the middle vertex),
so its uncapped worst case is the same hub blow-up r9 measured —
but two things differ and deserve their own numbers:

* ``include_adjacent=True`` (the operator default, and what
  q_node_similarity uses) SKIPS link_prediction's left-anti join
  against the edge set, so candidate volume is strictly larger than
  link_prediction's at the same cap;
* the Jaccard normalization joins the vertex-sized degree frame TWICE
  (per side) instead of aggregating Adamic–Adar weights in the wedge
  groupBy.

Same harness as ``probe_r9_linkpred.py``: the ZIPF-skewed doc→token
bipartite graph (documents as outer vertices, tokens as middle
vertices whose hub degree grows with the corpus), one timed ``count``
per cell.  Cells:

* UNCAPPED at sf0.01 → sf0.1 — the blow-up, measured where feasible;
* capped (``max_degree`` 100 and 20) at sf0.1 → sf1, both
  ``include_adjacent`` settings — the scale path, with the anti-join's
  cost visible as the True/False delta.  (The sf1 replica suffixes
  tokens per replica, so cross-replica matches are impossible and
  linear growth is the correct expectation, not an artifact.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tundradb_spark.graphs.algorithms import neighborhood_similarity
from tundradb_spark.session import get_spark

from probe_r9_linkpred import bipartite


def run(spark, sf_dir: str, max_degree, include_adjacent: bool):
    g = bipartite(spark, sf_dir)
    df = neighborhood_similarity(
        g,
        max_degree=max_degree,
        min_common=2,
        include_adjacent=include_adjacent,
    )
    t0 = time.perf_counter()
    rows = df.count()
    return time.perf_counter() - t0, rows


def main() -> None:
    from make_probe_sf1 import build

    sf1 = build()
    spark = get_spark("probe-nodesim")
    spark.sparkContext.setLogLevel("ERROR")
    sfs = ["/root/testdata/sf0.01", "/root/testdata/sf0.1", sf1]

    print("UNCAPPED (the blow-up, measured where feasible):", flush=True)
    lo, rlo = run(spark, sfs[0], None, True)
    hi, rhi = run(spark, sfs[1], None, True)
    print(
        f"  none   sf0.01 {lo:8.3f}s {rlo:>10} rows | "
        f"sf0.1 {hi:8.3f}s {rhi:>10} rows | wall {hi / lo:.1f}x",
        flush=True,
    )

    print("\nCAPPED (the scale path) sf0.1 -> sf1:", flush=True)
    for cap in (100, 20):
        for adj in (True, False):
            lo, rlo = run(spark, sfs[1], cap, adj)
            hi, rhi = run(spark, sfs[2], cap, adj)
            norm = (hi / rhi) / (lo / rlo) if rlo and rhi else float("nan")
            print(
                f"  cap {cap:>3} include_adjacent={str(adj):<5} "
                f"sf0.1 {lo:8.3f}s {rlo:>10} rows | "
                f"sf1 {hi:8.3f}s {rhi:>10} rows | wall {hi / lo:.1f}x | "
                f"per-output-row {norm:.1f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
