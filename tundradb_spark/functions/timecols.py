"""Schema-robust event-time column accessors.

The driver's ``events.ts`` has shipped as BOTH parquet
TIMESTAMP(NANOS) — which Spark reads as raw int64 nanos under
``spark.sql.legacy.parquet.nanosAsLong`` (the reference's own clock
representation, include/common/clock.hpp:24-33) — and as µs-precision
TIMESTAMP (read as TIMESTAMP_NTZ).  Every consumer goes through these
two accessors instead of assuming one physical type, so a testdata
regeneration can't break the query surface again.

Session timezone is pinned to UTC (session.ensure_runtime_confs), so the
NTZ→LTZ cast is an identity on the underlying instant and ``unix_micros``
is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dtype(df: DataFrame, col: str) -> str:
    for name, dtype in df.dtypes:
        if name == col:
            return dtype
    raise KeyError(f"column {col!r} not in {[n for n, _ in df.dtypes]}")


def epoch_micros(df: DataFrame, col: str = "ts") -> Column:
    """``col`` as µs-since-epoch BIGINT, whatever its physical type.

    Integer types are treated as raw nanos (``div 1000`` — integer
    division, no double round-trip: ns epochs exceed 2^53).
    """
    dtype = _dtype(df, col)
    if dtype in ("bigint", "long", "int"):
        return F.expr(f"`{col}` div 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))


def event_timestamp(df: DataFrame, col: str = "ts") -> Column:
    """``col`` as a TIMESTAMP (LTZ — what watermarks/windows expect),
    whatever its physical type."""
    dtype = _dtype(df, col)
    if dtype in ("bigint", "long", "int"):
        return F.timestamp_micros(F.expr(f"`{col}` div 1000"))
    return F.col(col).cast("timestamp")
