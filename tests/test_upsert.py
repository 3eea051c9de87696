"""Bucket-partitioned keyed upsert: partial rewrite, untouched buckets'
files byte-identical, point-lookup pruning."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from tundradb_spark.sources.upsert import (
    read_keyed,
    upsert_keyed,
    write_keyed,
)

CUSTOMER = "/root/testdata/sf0.001/customer.parquet"


def _file_state(path):
    return {
        f: (os.path.getmtime(f), os.path.getsize(f))
        for f in glob.glob(f"{path}/bucket=*/*.parquet")
    }


class TestKeyedUpsert:
    def test_upsert_replaces_and_inserts(self, spark, tmp_path):
        path = str(tmp_path / "cust")
        cust = spark.read.parquet(CUSTOMER)
        write_keyed(cust, path, "c_custkey", n_buckets=16)
        assert read_keyed(spark, path).count() == cust.count()

        updates = spark.createDataFrame(
            [(3, "REPLACED", 0, 99.0, "BUILDING"),
             (10_000_001, "NEWCUST", 1, 1.0, "AUTOMOBILE")],
            cust.schema,
        )
        n = upsert_keyed(spark, path, updates, "c_custkey", n_buckets=16)
        assert 1 <= n <= 2  # the two keys touch at most two buckets

        back = read_keyed(spark, path)
        assert back.count() == cust.count() + 1  # one replace + one insert
        assert (
            back.filter(F.col("c_custkey") == 3).first()["c_name"] == "REPLACED"
        )
        assert back.filter(F.col("c_custkey") == 10_000_001).count() == 1
        # no duplicate keys anywhere
        assert (
            back.groupBy("c_custkey").count().filter(F.col("count") > 1).count()
            == 0
        )

    def test_untouched_buckets_not_rewritten(self, spark, tmp_path):
        path = str(tmp_path / "cust2")
        cust = spark.read.parquet(CUSTOMER)
        write_keyed(cust, path, "c_custkey", n_buckets=16)
        before = _file_state(path)

        updates = spark.createDataFrame(
            [(7, "TOUCHED", 0, 1.0, "MACHINERY")], cust.schema
        )
        n = upsert_keyed(spark, path, updates, "c_custkey", n_buckets=16)
        assert n == 1
        after = _file_state(path)
        changed_dirs = {
            os.path.dirname(f)
            for f in set(before) ^ set(after)
            | {f for f in before if f in after and before[f] != after[f]}
        }
        # exactly one bucket directory saw any file change
        assert len(changed_dirs) == 1

    def test_point_lookup_prunes_to_one_bucket(self, spark, tmp_path):
        path = str(tmp_path / "cust3")
        cust = spark.read.parquet(CUSTOMER)
        write_keyed(cust, path, "c_custkey", n_buckets=16)
        df = read_keyed(spark, path, "c_custkey", 42, n_buckets=16)
        row = df.first()
        assert row is not None and row["c_custkey"] == 42
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "bucket" in plan

    def test_empty_update_is_noop(self, spark, tmp_path):
        path = str(tmp_path / "cust4")
        cust = spark.read.parquet(CUSTOMER)
        write_keyed(cust, path, "c_custkey", n_buckets=8)
        empty = cust.filter(F.lit(False))
        assert upsert_keyed(spark, path, empty, "c_custkey", n_buckets=8) == 0

    def test_validation(self, spark, tmp_path):
        cust = spark.read.parquet(CUSTOMER)
        with pytest.raises(ValueError):
            write_keyed(cust, str(tmp_path / "x"), "c_custkey", n_buckets=0)
        with pytest.raises(ValueError):
            write_keyed(
                cust.withColumn("bucket", F.lit(1)),
                str(tmp_path / "y"),
                "c_custkey",
            )

    def test_point_lookup_non_string_key_types(self, spark, tmp_path):
        """Spark CAST(bool AS STRING) renders 'true'; a Python str(value)
        bucket recomputation would look in the wrong bucket and silently
        return nothing."""
        path = str(tmp_path / "boolkey")
        df = spark.createDataFrame(
            [(True, "yes"), (False, "no")], "flag boolean, v string"
        )
        write_keyed(df, path, "flag", n_buckets=8)
        row = read_keyed(spark, path, "flag", True, n_buckets=8).first()
        assert row is not None and row["v"] == "yes"

    def test_point_lookup_int_literal_on_double_key(self, spark, tmp_path):
        """An int literal probing a double key column must hash as the
        column-typed rendering ('1.0'), not the Python literal's ('1')."""
        path = str(tmp_path / "dblkey")
        df = spark.createDataFrame([(1.0, "one"), (2.5, "two")], "price double, v string")
        write_keyed(df, path, "price", n_buckets=8)
        row = read_keyed(spark, path, "price", 1, n_buckets=8).first()
        assert row is not None and row["v"] == "one"


def test_upsert_rejects_duplicate_keys_in_batch(spark, tmp_path):
    # r6 advice: a batch carrying the same key twice would silently break
    # the one-row-per-key invariant — must raise instead
    from tundradb_spark.sources.upsert import upsert_keyed, write_keyed

    path = str(tmp_path / "keyed")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    write_keyed(base, path, "k")
    dupes = spark.createDataFrame([(1, "x"), (1, "y")], "k long, v string")
    with pytest.raises(ValueError, match="duplicate"):
        upsert_keyed(spark, path, dupes, "k")
