"""Driver-contract invariants: the registry shape the CORRECTNESS gate
depends on, pinned so a rotation edit cannot silently break it."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_window_is_exactly_50_oracle_bearing_rows():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert len(qs) == 50, len(qs)
    assert set(qs) == set(os_), set(qs) ^ set(os_)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_parked_registry_is_oracle_consistent():
    pq, po = entry.parked_queries(), entry.parked_oracle_sql()
    assert set(pq) == set(po), set(pq) ^ set(po)
    assert not set(pq) & set(entry.queries()), (
        "a query may not be seated AND parked"
    )


def _flat_types(dt):
    """dt + every nested dataType (struct fields only — a top-level
    Array/Map is the failure class regardless of its element type)."""
    from pyspark.sql import types as T

    yield dt
    if isinstance(dt, T.StructType):
        for f in dt.fields:
            yield from _flat_types(f.dataType)


@pytest.mark.parametrize(
    "name", sorted(set(entry.queries()) | set(entry.parked_queries()))
)
def test_seated_schema_is_driver_canonicalizable(spark, name):
    """No seated OR parked query may return Array/Map (or struct-of-them)
    columns: the driver's pandas canonicalizer sorts+hashes cell values
    and dies on unhashable list/dict cells (r6's one red row, q_encode,
    was exactly this — correct values, uncheckable shape).  Digest such
    columns to a scalar (see q_encode's ids_md5) before seating.  Parked
    rows are covered too (r7 verdict item 7) so a future rotation can
    never seat an uncanonicalizable shape.

    r13 (r12 verdict items 2/3): DecimalType joins the banned class.
    Evidence, not theory: the ONLY seated r12 query with decimal output
    columns (q_join_fanout, decimal(38,0)) was the ONLY hash mismatch
    in six rounds, with bit-identical Spark-vs-DuckDB values verified —
    Spark's Decimal objects and DuckDB's decimal land as different
    pandas dtypes and a type-sensitive value hash diverges.  Keep
    decimal math INTERNAL; render outputs as string (exact counts) or
    the house round-to-double (metrics) before seating."""
    from pyspark.sql import types as T

    fn = {**entry.parked_queries(), **entry.queries()}[name]
    df = fn(spark, SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if any(
            isinstance(t, (T.ArrayType, T.MapType, T.DecimalType))
            for t in _flat_types(f.dataType)
        )
    ]
    assert not bad, (
        f"{name}: driver-unhashable Array/Map/Decimal columns {bad} — "
        "digest/render them to scalars (string or rounded double) before "
        "seating (driver canonicalizer contract)"
    )
