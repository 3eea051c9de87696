"""Bucket-partitioned keyed storage with partial-rewrite upsert.

Capability extension over the reference (whose snapshot layer is
whole-table shards with dirty-SHARD incremental commit —
``/root/reference/src/storage/snapshot.cpp``): the same
"rewrite only what changed" idea applied WITHIN one logical table, at
hash-bucket granularity, for plain parquet without a table format.

Layout: ``path/bucket=B/`` where ``B = h32(key) % n_buckets`` — the
portable hash, so ANY engine can locate a key's bucket.  An upsert
computes the distinct buckets its updates touch, merges old+new rows for
ONLY those buckets, and rewrites them with dynamic partition overwrite;
untouched buckets' files are never opened, read, or written.  At 100 TB
with n_buckets sized so a bucket is a few GB, a point-update batch
touching k buckets costs O(k·bucket), not O(table) — the Hive-style
partition-overwrite upsert pattern, with the bucket doubling as a
key-pruning index (``bucket = h(key) % N`` pushes to the scan as a
partition filter for point lookups).

Not a transaction log: concurrent writers need external coordination
(same single-writer assumption as the snapshot layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tundradb_spark.pipeline.hashing import h32

#: reserved partition column
BUCKET_COL = "bucket"


def _bucket(key_col: str, n_buckets: int):
    return (h32(F.col(key_col).cast("string")) % n_buckets).cast("int")


def write_keyed(
    df: DataFrame,
    path: str,
    key: str,
    n_buckets: int = 64,
) -> None:
    """Initial write of a keyed table: one hash-partition shuffle, one
    directory per bucket.  ``n_buckets`` is fixed for the table's life
    (recorded in the layout; changing it means a full rewrite) — size it
    so a bucket holds a few GB at the target scale."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if BUCKET_COL in df.columns:
        raise ValueError(f"input may not carry a '{BUCKET_COL}' column")
    (
        df.withColumn(BUCKET_COL, _bucket(key, n_buckets))
        .repartition(F.col(BUCKET_COL))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def upsert_keyed(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    n_buckets: int = 64,
) -> int:
    """Upsert ``updates`` into a :func:`write_keyed` table: rows whose key
    exists are REPLACED, new keys are inserted — rewriting ONLY the
    buckets the update keys hash into (dynamic partition overwrite).

    The merge reads just those buckets (``bucket IN (...)`` is a
    partition filter — non-touched directories are never opened), drops
    old rows whose key appears in the update batch via a broadcast-able
    anti-join, unions the new rows, and overwrites the touched
    partitions in place.

    Returns the number of buckets rewritten.
    """
    if BUCKET_COL in updates.columns:
        raise ValueError(f"updates may not carry a '{BUCKET_COL}' column")
    staged = updates.withColumn(BUCKET_COL, _bucket(key, n_buckets))
    # ONE job yields both the touched-bucket list (bounded by n_buckets)
    # and the duplicate-key check — no extra action on the mutation path
    stats = (
        staged.groupBy(BUCKET_COL, key)
        .count()
        .groupBy(BUCKET_COL)
        .agg(F.max("count").alias("__mx"))
        .collect()
    )
    if any(r["__mx"] > 1 for r in stats):
        raise ValueError(
            f"updates batch contains duplicate '{key}' values — the keyed "
            "table holds one row per key; dedupe the batch (pick a "
            "last-wins ordering) before upserting"
        )
    touched = [r[BUCKET_COL] for r in stats]
    if not touched:
        return 0
    existing = spark.read.parquet(path).filter(F.col(BUCKET_COL).isin(touched))
    survivors = existing.join(
        staged.select(key).distinct(), key, "left_anti"
    )
    merged = survivors.unionByName(staged.select(*survivors.columns))
    (
        merged.repartition(F.col(BUCKET_COL))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )
    return len(touched)


def read_keyed(
    spark: SparkSession,
    path: str,
    key: str | None = None,
    value=None,
    n_buckets: int = 64,
) -> DataFrame:
    """Read a keyed table; with ``key``/``value`` given, a point lookup
    that prunes to the single bucket directory: the bucket is recomputed
    as a LITERAL so the predicate becomes a PartitionFilter — one
    directory opened out of ``n_buckets`` (must match the written
    layout).

    The bucket is computed by evaluating the SAME Spark expression the
    writer used over a 1-row frame (a ~ms local job) — a Python
    ``str(value)`` re-implementation would diverge from Spark's
    ``CAST(value AS STRING)`` rendering for booleans ('True' vs 'true'),
    floats, dates, and decimals, silently filtering the wrong bucket.
    The literal is first cast to the KEY COLUMN's type so e.g. an int
    ``1`` probing a double column hashes as '1.0' (what the writer
    hashed), not '1'."""
    df = spark.read.parquet(path)
    if key is None:
        return df.drop(BUCKET_COL)
    key_type = dict(df.dtypes)[key]
    b = (
        spark.range(1)
        .select(
            (h32(F.lit(value).cast(key_type).cast("string")) % n_buckets)
            .cast("int")
            .alias("b")
        )
        .first()["b"]
    )
    return df.filter(
        (F.col(BUCKET_COL) == b) & (F.col(key) == value)
    ).drop(BUCKET_COL)
