#!/usr/bin/env python3
"""r11 decade probe for the two corpus-monitoring operators added this
round: distribution_drift (PSI/JSD/TV between snapshot halves of the
events table) and corpus_diff (md5 snapshot delta over documents).

Both are claimed 100 TB-shaped on the same argument: ONE
map-side-combined pass per snapshot (drift) / ONE id hash join (diff),
with everything downstream groups-x-bins or delta sized.  The probe
times each at sf0.1 and the 10x ``.probe/sf1`` replica (best-of-2
after a warmup) and prints output sizes so sub-linearity per output
row is checkable, plus the exchange count as the shuffle-shape pin.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tundradb_spark.plans import audit
from tundradb_spark.session import get_spark


def drift_at(spark, sf_dir: str):
    from tundradb_spark.operators.analytics import distribution_drift

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return distribution_drift(
        ev.filter("event_id % 3 < 2"),
        ev.filter("event_id % 3 = 2"),
        bounds=(0.0, 500.0),
        n_bins=20,
        min_n=50,
    )


def diff_at(spark, sf_dir: str):
    from tundradb_spark.pipeline.dedup import corpus_diff

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.filter("doc_id % 11 != 0")
    new = docs.filter("doc_id % 13 != 0").select(
        "doc_id",
        F.expr(
            "case when doc_id % 7 = 0 then text || ' v2' else text end"
        ).alias("text"),
    )
    return corpus_diff(old, new)


def token_drift_at(spark, sf_dir: str):
    from tundradb_spark.pipeline.text import token_drift

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cur = docs.select(
        F.expr(
            "case when doc_id % 7 = 0 then text || ' v2' else text end"
        ).alias("text")
    )
    return token_drift(docs, cur)


def key_skew_at(spark, sf_dir: str):
    from tundradb_spark.operators.relational import key_skew

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return key_skew(li, "l_suppkey", top_n=10)


def join_fanout_at(spark, sf_dir: str):
    from tundradb_spark.operators.relational import join_fanout

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return join_fanout(li, od, "l_orderkey", "o_orderkey", top_n=10)


def row_diff_at(spark, sf_dir: str):
    from tundradb_spark.pipeline.dedup import row_diff

    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    old = od.filter("o_orderkey % 11 != 0")
    new = od.filter("o_orderkey % 13 != 0").selectExpr(
        "o_orderkey",
        "case when o_orderkey % 7 = 0 then 'X' else o_orderstatus end"
        " as o_orderstatus",
        "o_orderpriority",
    )
    return row_diff(
        old, new, "o_orderkey", ["o_orderstatus", "o_orderpriority"]
    )


def trend_at(spark, sf_dir: str):
    from tundradb_spark.operators.analytics import value_trend

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return value_trend(ev, epoch_us=1_704_067_200_000_000, min_n=100)


def main() -> None:
    sf01 = "/root/testdata/sf0.1"
    sf1 = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".probe", "sf1",
    )
    spark = get_spark("probe-r11-drift")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[tuple[str, str], tuple[float, int, int]] = {}
    for op, build in [
        ("drift", drift_at),
        ("corpus_diff", diff_at),
        ("token_drift", token_drift_at),
        ("key_skew", key_skew_at),
        ("join_fanout", join_fanout_at),
        ("trend", trend_at),
        ("row_diff", row_diff_at),
    ]:
        for label, sf in [("sf0.1", sf01), ("sf1", sf1)]:
            df = build(spark, sf)
            n_ex = audit.count_exchanges(df)
            walls = []
            for _ in range(3):  # first run is the warmup
                t0 = time.perf_counter()
                n = build(spark, sf).count()
                walls.append(time.perf_counter() - t0)
            wall = min(walls[1:])
            results[(op, label)] = (wall, n, n_ex)
            print(
                f"[{op} {label}] wall={wall:6.2f}s out={n:>7,}"
                f" exchanges={n_ex}"
            )
    for op in (
        "drift", "corpus_diff", "token_drift", "key_skew",
        "join_fanout", "trend", "row_diff",
    ):
        w0, n0, e0 = results[(op, "sf0.1")]
        w1, n1, e1 = results[(op, "sf1")]
        ratio = w1 / w0
        out_ratio = n1 / max(n0, 1)
        per_row = ratio / out_ratio if out_ratio else float("inf")
        print(
            f"{op}: 10x data -> {ratio:.2f}x wall, {out_ratio:.2f}x output"
            f" rows, {per_row:.2f}x per output row;"
            f" exchanges {e0} -> {e1}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
