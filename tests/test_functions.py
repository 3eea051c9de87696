"""Tests for the scalar function surface (SURVEY.md §2.9 SF1-SF4)."""

import pytest

from pyspark.sql import functions as F

from tundradb_spark.functions import scalar as sf


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


def test_string_predicates(spark):
    c = F.lit("hello world")
    assert _one(spark, sf.contains(c, "lo wo"))
    assert _one(spark, sf.starts_with(c, "hell"))
    assert _one(spark, sf.ends_with(c, "world"))
    assert not _one(spark, sf.contains(c, "xyz"))


def test_null_safe_eq_reference_semantics(spark):
    # NULL = NULL → true (reference src/query/query.cpp:84-96), unlike SQL
    null = F.lit(None).cast("string")
    assert _one(spark, sf.null_safe_eq(null, None))
    assert not _one(spark, sf.null_safe_ne(null, None))
    assert not _one(spark, sf.null_safe_eq(null, "x"))
    assert _one(spark, sf.null_safe_ne(null, "x"))


def test_array_append(spark):
    arr = F.array(F.lit(1), F.lit(2))
    assert _one(spark, sf.array_append_value(arr, 3)) == [1, 2, 3]
    assert _one(spark, sf.array_append_all(arr, [3, 4])) == [1, 2, 3, 4]
    # appending to NULL starts a fresh array (reference Value concat)
    null_arr = F.lit(None).cast("array<int>")
    assert _one(spark, sf.array_append_value(null_arr, 7)) == [7]


def test_map_get(spark):
    m = F.create_map(F.lit("k"), F.lit(42))
    assert _one(spark, sf.map_get(m, "k")) == 42
    assert _one(spark, sf.map_get(m, "missing")) is None


@pytest.mark.parametrize(
    "text,typ,expected",
    [
        ("42", "long", 42),
        ("'42'", "long", 42),
        ("3.5", "double", 3.5),
        ('"quoted"', "string", "quoted"),
        ("true", "bool", True),
        ("0", "boolean", False),
        ("NULL", "string", None),
    ],
)
def test_coerce_literal(text, typ, expected):
    assert sf.coerce_literal(text, typ) == expected


def test_coerce_literal_bad_bool():
    with pytest.raises(ValueError):
        sf.coerce_literal("maybe", "bool")


def test_lsh_bands_validation():
    """ADVICE r4: band_bits > n_planes silently produced an empty index;
    non-divisible n_planes silently ignored trailing planes."""
    import pytest

    from tundradb_spark.pipeline.hashing import lsh_bands

    assert lsh_bands(16, 8) == 2
    assert lsh_bands(60, 15) == 4
    with pytest.raises(ValueError):
        lsh_bands(16, 24)  # bands would be 0
    with pytest.raises(ValueError):
        lsh_bands(16, 5)  # trailing planes dropped
    with pytest.raises(ValueError):
        lsh_bands(0, 8)
