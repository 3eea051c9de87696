#!/usr/bin/env python3
"""Capture .explain("formatted") for every seated query into
plans/$PLANS_ROUND/<query>_<tag>.txt (the optimization round's plan
evidence; PLANS_ROUND defaults to r15).

Usage: python scripts/capture_plans.py <tag> [query ...]
       (tag = "before" | "after"; no query list = all seated)

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) — same data the
bench times, so scan statistics and AQE initial plans match the bench's.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_ROUND", "r15"),
)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    import __spark_entry__ as entry_mod
    from tundradb_spark.session import get_spark

    spark = get_spark("tundradb-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    picked = names if names else list(qs)
    os.makedirs(OUT_DIR, exist_ok=True)
    failed = []
    for name in picked:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 - record, keep capturing
            failed.append(name)
            plan = f"PLAN CAPTURE FAILED: {exc}\n"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        print(f"{name:26s} exchanges={n_exch:2d} -> {path}")
    if failed:
        print(f"FAILED: {failed}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
