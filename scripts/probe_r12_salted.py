"""r12 skew probe: does salted_join actually kill the straggler?

Constructs a deliberately skewed equi-join from the sf1 replica (one key
carries ~35% of the 6M-row probe side), then times the plain join vs
salted_join, with AQE's runtime skew-split OFF (the regime the operator
exists for: skews AQE cannot reach) and ON (to show AQE handles the
plain shuffle-join case by itself — the operator is for the residue).

Usage: PYTHONPATH=. python scripts/probe_r12_salted.py [sf_dir]
"""

import sys
import time

from pyspark.sql import SparkSession, functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else ".probe/sf1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.ui.enabled", "false")
    # keep the probe honest: no broadcast shortcut around the skew
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from tundradb_spark.operators.relational import salted_join  # noqa: E402

li = spark.read.parquet(f"{SF}/lineitem.parquet")
b = spark.range(1000).select(
    F.col("id").alias("kk")
).crossJoin(spark.range(5).select(F.col("id").alias("payload")))


def timed(df):
    # best-of-2: single-run walls at this scale carry multi-second
    # scheduler/GC noise (the README's measured ±9% and beyond)
    best, n = None, None
    for _ in range(2):
        t0 = time.time()
        n = df.count()
        t = time.time() - t0
        best = t if best is None or t < best else best
    return best, n


def max_reducer_rows(df, *cols):
    """EXACT straggler metric, no timing noise: the largest row count
    any one reducer key receives in the join shuffle."""
    return (
        df.groupBy(*cols).count().agg(F.max("count")).collect()[0][0]
    )


for hot_mod in (350, 700):
    # hot_mod/1000 of the rows land on key 0; the rest spread evenly
    a = li.select(
        F.expr(
            f"cast(case when l_orderkey % 1000 < {hot_mod} then 0"
            " else l_orderkey % 1000 end as long)"
        ).alias("k"),
        F.col("l_quantity").alias("v"),
    )
    n_a = a.count()
    hot_share = a.filter("k = 0").count() / n_a
    plain_max = max_reducer_rows(a, "k")
    a_s = a.withColumn(
        "__salt",
        F.when(F.col("k") == 0,
               F.pmod(F.xxhash64("k", "v"), F.lit(32)))
        .otherwise(F.lit(0)),
    )
    salted_max = max_reducer_rows(a_s, "k", "__salt")
    print(
        f"[balance] hot_share={hot_share:.2f}"
        f" max_reducer_rows plain={plain_max:,}"
        f" salted={salted_max:,}"
        f" ({plain_max / salted_max:.1f}x flatter)"
    )
    for skew_fix in (False, True):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_fix).lower()
        )
        plain_t, plain_n = timed(a.join(b, a["k"] == b["kk"]))
        salted_t, salted_n = timed(
            salted_join(a, b, "k", "kk", hot_keys=["0"], salt=32)
        )
        assert plain_n == salted_n, (plain_n, salted_n)
        print(
            f"[AQE skew-join {'ON ' if skew_fix else 'OFF'}]"
            f" hot_share={hot_share:.2f} rows_a={n_a:,}"
            f" out_rows={plain_n:,}"
            f" plain={plain_t:6.2f}s salted={salted_t:6.2f}s"
            f" speedup={plain_t / salted_t:4.2f}x"
        )
spark.stop()
