"""Z-order (Morton-curve) clustering — multi-column data skipping.

The lakehouse OPTIMIZE ZORDER technique (Delta/Iceberg): interleave the
bits of several normalized columns into one Morton key, range-partition and
sort the data by it, and write parquet.  Every output file then covers a
small hyper-rectangle of the key space, so a selective predicate on ANY of
the z-ordered columns touches few files/row-groups — parquet min/max stats
skip the rest.  A single-column sort gives skipping on one column only;
the Morton curve buys locality on all of them at once.

Spark-first: the bit interleave is a codegen'd integer expression, the
normalization bounds come from one aggregate, and the physical clustering
is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` — exactly one
range shuffle regardless of column count.  Capped at 3 columns × 20 bits
(60 bits) so the key stays a positive long on every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MAX_BITS = 20


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each (already
    normalized, non-negative) integer column.  Column j's bit i lands at
    output position ``i * len(cols) + j`` — the standard Z-curve."""
    n = len(cols)
    if not 1 <= n <= 3:
        raise ValueError(f"zorder_key takes 1-3 columns, got {n}")
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}], got {bits}")
    z = None
    for j, c in enumerate(cols):
        c = c.cast("long")
        for i in range(bits):
            term = F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
            )
            z = term if z is None else z + term
    return z.alias("zkey")


def with_zorder(
    df: DataFrame, cols: list[str], bits: int = 16
) -> DataFrame:
    """Attach ``zkey``: each column min-max-normalized to ``[0, 2^bits)``
    (one broadcast aggregate for the bounds), then Morton-interleaved.
    Constant columns normalize to 0.  Nulls normalize to 0 (sort first)."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__mx_{c}") for c in cols],
    )
    top = float((1 << bits) - 1)
    withb = df.crossJoin(F.broadcast(bounds))
    norm = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = mx - mn
        scaled = F.when(
            span > 0.0,
            F.floor(
                (F.coalesce(F.col(c).cast("double"), mn) - mn) / span * top
            ),
        ).otherwise(F.lit(0))
        norm.append(scaled.cast("long"))
    return withb.withColumn("zkey", zorder_key(norm, bits)).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Cluster ``df`` on the Morton key of ``cols`` and write parquet:
    ``repartitionByRange(n_files, zkey)`` (one range shuffle; Spark
    samples the key distribution so files are balanced) +
    ``sortWithinPartitions`` (row-groups inside a file stay tight too).
    Each output file covers a compact region of every z-ordered column, so
    parquet min/max stats prune files for selective predicates on ANY of
    them."""
    keyed = with_zorder(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
