"""HyperLogLog + Bloom filter sketches: oracle-exactness, mergeability,
accuracy bounds, and join-pruning behavior."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tundradb_spark.pipeline import sketches as sk

DOCS = "/root/testdata/sf0.001/documents.parquet"
ORDERS = "/root/testdata/sf0.001/orders.parquet"
CUSTOMER = "/root/testdata/sf0.001/customer.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def test_hll_matches_duckdb_oracle_bit_for_bit(spark, docs):
    got = {
        r["source"]: (r["n_buckets"], r["est_distinct"])
        for r in sk.hll_distinct(docs, "doc_id", "source", p=9).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    want = {
        g: (nb, est)
        for g, nb, est in con.execute(
            sk.hll_sql("documents", "doc_id", "source", p=9)
        ).fetchall()
    }
    assert got == want


def test_hll_accuracy_within_rse_bound(spark):
    # 15k distinct keys, one group — standard error ≈ 1.04/sqrt(m)
    df = spark.range(15000).select(
        F.concat(F.lit("key"), F.col("id")).alias("k"), F.lit("g").alias("g")
    )
    for p, m in ((9, 512), (11, 2048)):
        est = sk.hll_distinct(df, "k", "g", p=p).first()["est_distinct"]
        rse = 1.04 / (m**0.5)
        assert abs(est - 15000) / 15000 < 3 * rse, (p, est)


def test_hll_registers_merge_is_union(spark, docs):
    """Sketching two disjoint halves and max-merging the registers gives
    exactly the whole-corpus registers — the property that makes the
    sketch shuffle-bounded and incrementally maintainable."""
    lo = docs.filter(F.col("doc_id") < 250)
    hi = docs.filter(F.col("doc_id") >= 250)
    merged = (
        sk.hll_registers(lo, "doc_id", "source")
        .unionByName(sk.hll_registers(hi, "doc_id", "source"))
        .groupBy("source", "bucket")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    whole = sk.hll_registers(docs, "doc_id", "source")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hll_distinct_insensitive_to_duplication(spark, docs):
    """Distinct estimation must ignore multiplicity: the corpus unioned
    with itself three times sketches identically."""
    tripled = docs.unionByName(docs).unionByName(docs)
    one = sorted(map(tuple, sk.hll_distinct(docs, "doc_id", "source").collect()))
    three = sorted(
        map(tuple, sk.hll_distinct(tripled, "doc_id", "source").collect())
    )
    assert one == three


def test_hll_rejects_bad_precision(spark, docs):
    with pytest.raises(ValueError):
        sk.hll_registers(docs, "doc_id", "source", p=3)
    with pytest.raises(ValueError):
        sk.hll_registers(docs, "doc_id", "source", p=15)


def test_bloom_no_false_negatives_and_low_fpp(spark):
    members = spark.range(0, 2000).select(F.col("id").alias("k"))
    words = sk.bloom_build(members, "k")
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    hits = (
        probe.filter(sk.bloom_contains("k", words, 65536, 5, 101))
        .select("k")
        .collect()
    )
    hit_set = {r["k"] for r in hits}
    assert set(range(2000)) <= hit_set  # zero false negatives
    fp = len(hit_set) - 2000
    # fpp(2000, 65536, 5) ≈ 3.6e-5 → expect ~0-3 false positives in 18k probes
    assert fp <= 20, fp


def test_bloom_semi_join_equals_plain_semi_join(spark):
    orders = spark.read.parquet(ORDERS)
    cust = spark.read.parquet(CUSTOMER).filter(F.col("c_acctbal") > 5000)
    keys = cust.select(F.col("c_custkey").alias("o_custkey"))
    got = sk.bloom_semi_join(orders, keys, "o_custkey")
    got_keys = sorted(r["o_orderkey"] for r in got.collect())
    want_keys = sorted(
        r["o_orderkey"]
        for r in orders.join(keys, "o_custkey", "left_semi").collect()
    )
    assert got_keys == want_keys and len(got_keys) > 0


def test_bloom_prefilter_is_in_scan_stage(spark):
    """The bloom predicate must evaluate BEFORE the join's exchange —
    i.e. appear as a Filter under the scan side, not after the join."""
    orders = spark.read.parquet(ORDERS)
    cust = spark.read.parquet(CUSTOMER).filter(F.col("c_acctbal") > 5000)
    keys = cust.select(F.col("c_custkey").alias("o_custkey"))
    plan = (
        sk.bloom_semi_join(orders, keys, "o_custkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the literal-array membership test compiles to element_at(...) & mask
    filter_pos = plan.find("element_at")
    join_pos = plan.find("Join")
    assert filter_pos != -1 and join_pos != -1
    # executedPlan prints top-down: the Filter must be BELOW the join node
    assert filter_pos > join_pos


def test_bloom_build_rejects_bad_bits(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        sk.bloom_build(df, "k", m_bits=1000)


class TestCountMin:
    def test_never_undercounts_and_tight_on_sparse(self, spark):
        from tundradb_spark.pipeline import sketches as sk2

        # 26 keys with known frequencies 1..26
        rows = [(chr(ord("a") + i),) for i in range(26) for _ in range(i + 1)]
        df = spark.createDataFrame(rows, "k string")
        sketch = sk2.cm_build(df, "k", d=4, w=512)
        keys = spark.createDataFrame([(chr(ord("a") + i),) for i in range(26)], "k string")
        est = {r["k"]: r["est_count"] for r in sk2.cm_estimate(sketch, keys, "k", d=4, w=512).collect()}
        for i in range(26):
            true = i + 1
            assert est[chr(ord("a") + i)] >= true
            # 351 items in 512 cells x 4 rows: collisions are rare
            assert est[chr(ord("a") + i)] <= true + 4

    def test_unseen_key_estimates_zero_on_empty_cells(self, spark):
        from tundradb_spark.pipeline import sketches as sk2

        df = spark.createDataFrame([("x",), ("y",)], "k string")
        sketch = sk2.cm_build(df, "k", d=4, w=4096)
        keys = spark.createDataFrame([("never-seen",)], "k string")
        est = sk2.cm_estimate(sketch, keys, "k", d=4, w=4096).first()["est_count"]
        assert est == 0

    def test_merge_is_sum(self, spark):
        from tundradb_spark.pipeline import sketches as sk2

        docs = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        lo = docs.filter(F.col("o_orderkey") % 2 == 0)
        hi = docs.filter(F.col("o_orderkey") % 2 == 1)
        merged = (
            sk2.cm_build(lo, "o_custkey", d=3, w=256)
            .unionByName(sk2.cm_build(hi, "o_custkey", d=3, w=256))
            .groupBy("row_idx", "col_idx")
            .agg(F.sum("cnt").alias("cnt"))
        )
        whole = sk2.cm_build(docs, "o_custkey", d=3, w=256)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_matches_duckdb_oracle_bit_for_bit(self, spark):
        import duckdb

        from tundradb_spark.pipeline import sketches as sk2

        path = "/root/testdata/sf0.001/orders.parquet"
        orders = spark.read.parquet(path)
        sketch = sk2.cm_build(orders, "o_custkey", d=4, w=512)
        keys = orders.select("o_custkey").distinct().filter(F.col("o_custkey") < 60)
        got = sorted(
            (r["o_custkey"], r["est_count"])
            for r in sk2.cm_estimate(sketch, keys, "o_custkey", d=4, w=512).collect()
        )
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM '{path}'")
        sql = sk2.cm_sql(
            "orders",
            "o_custkey",
            "(SELECT DISTINCT o_custkey FROM orders WHERE o_custkey < 60)",
            "o_custkey",
            "o_custkey",
            d=4,
            w=512,
        )
        want = sorted(con.execute(sql).fetchall())
        assert got == want

    def test_validation(self, spark):
        from tundradb_spark.pipeline import sketches as sk2

        df = spark.createDataFrame([("x",)], "k string")
        with pytest.raises(ValueError):
            sk2.cm_build(df, "k", d=0)


class TestStreamCmCounts:
    def test_stream_merge_equals_batch_sketch(self, spark, tmp_path):
        import os

        from tundradb_spark.pipeline import sketches as sk2
        from tundradb_spark.streaming import read_cm_estimate, stream_cm_counts

        src = str(tmp_path / "csrc")
        cm = str(tmp_path / "cm")
        ckpt = str(tmp_path / "cck")
        os.makedirs(src)
        schema = "k string"

        def rows(lo, hi):
            return [(f"key{i % 50}",) for i in range(lo, hi)]

        spark.createDataFrame(rows(0, 400), schema).coalesce(1).write.mode(
            "append").parquet(src)
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1).parquet(src)
        q = stream_cm_counts(stream, cm, ckpt, "k", d=4, w=256)
        try:
            q.processAllAvailable()
            spark.createDataFrame(rows(400, 1000), schema).coalesce(1).write.mode(
                "append").parquet(src)
            q.processAllAvailable()
        finally:
            q.stop()
        keys = spark.createDataFrame([(f"key{i}",) for i in range(50)], schema)
        got = sorted(
            map(tuple, read_cm_estimate(spark, cm, keys, "k", d=4, w=256).collect())
        )
        allrows = spark.createDataFrame(rows(0, 1000), schema)
        want = sorted(
            map(
                tuple,
                sk2.cm_estimate(
                    sk2.cm_build(allrows, "k", d=4, w=256), keys, "k", d=4, w=256
                ).collect(),
            )
        )
        assert got == want
        # frequencies are exactly 20 per key here; CM never undercounts
        assert all(c >= 20 for _, c in got)
