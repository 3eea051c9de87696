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


class TestVariantPropertyMaps:
    """r7: VARIANT property columns carry the reference's full
    map<utf8, dense_union> semantics (include/arrow/utils.hpp:127-137) —
    per-KEY AND per-ROW runtime types — natively, where the
    map<string,string> fallback collapses to a dominant type."""

    def _db(self, spark):
        from pyspark.sql import functions as F

        from tundradb_spark import Database

        rows = [
            (1, '{"k": 69, "tag": "a"}'),
            (2, '{"k": 99, "tag": 7}'),        # tag switches type per row
            (3, '{"k": "high", "tag": "b"}'),  # k is a STRING here
            (4, '{"k": 12.5}'),                # k is a DOUBLE here
            (5, '{"other": 1}'),               # k absent
        ]
        df = spark.createDataFrame(rows, "id long, props_json string").select(
            "id", F.parse_json("props_json").alias("props")
        )
        db = Database(spark)
        db.register_node_table("ev", df, "id", resume_counter=False)
        return db

    def test_where_literal_type_selects_per_row_types(self, spark):
        from tundradb_spark import Query

        db = self._db(spark)
        # bigint literal: numeric k rows compare numerically; the STRING
        # k row null-outs (per-value coercion failure, the reference's
        # dense_union behavior) instead of comparing lexicographically
        got = db.query(
            Query.from_("e:ev").where("e.props.k", ">", 50).select("e.id AS id")
        )
        assert sorted(r["id"] for r in got.collect()) == [1, 2]
        # string literal: matches the string-typed row only
        got2 = db.query(
            Query.from_("e:ev")
            .where("e.props.k", "=", "high")
            .select("e.id AS id")
        )
        assert [r["id"] for r in got2.collect()] == [3]

    def test_select_string_realization(self, spark):
        from tundradb_spark import Query

        db = self._db(spark)
        got = {
            r["id"]: r["k"]
            for r in db.query(
                Query.from_("e:ev").select("e.id AS id", "e.props.k AS k")
            ).collect()
        }
        assert got[1] == "69" and got[3] == "high" and got[5] is None

    def test_per_row_type_switch_on_same_key(self, spark):
        from tundradb_spark import Query

        db = self._db(spark)
        # 'tag' is a string in row 1, a bigint in row 2 — the SAME key:
        # exactly what map<string,string> cannot represent without
        # collapsing; numeric comparison must pick row 2 only
        got = db.query(
            Query.from_("e:ev").where("e.props.tag", ">", 3).select("e.id AS id")
        )
        assert [r["id"] for r in got.collect()] == [2]

    def test_nested_set_on_variant_raises_clearly(self, spark):
        from tundradb_spark.errors import QueryError

        db = self._db(spark)
        with pytest.raises(QueryError, match="VARIANT property column"):
            db.update_by_id("ev", 1, {"props.k": 5})

    def test_non_identifier_keys_use_bracket_paths(self, spark):
        # r8 (advice): '$.' + key silently returned NULL for every row
        # when the key contains '.', spaces, '$', '['… — such keys must
        # route through quoted bracket segments, and a key with BOTH
        # quote characters (inexpressible) must raise, not null out
        from pyspark.sql import functions as F

        from tundradb_spark.errors import QueryError
        from tundradb_spark.functions.scalar import (
            _variant_path,
            variant_get_string,
        )

        assert _variant_path(("a", "b")) == "$.a.b"
        assert _variant_path(("a.b",)) == '$["a.b"]'
        assert _variant_path(('say "hi"',)) == "$['say \"hi\"']"
        with pytest.raises(QueryError, match="both quote"):
            _variant_path(("""both ' and \"""",))

        df = spark.createDataFrame(
            [('{"a.b": 7, "c d": "x"}',)], "j string"
        ).select(F.parse_json("j").alias("v"))
        row = df.select(
            variant_get_string(F.col("v"), ("a.b",)).alias("ab"),
            variant_get_string(F.col("v"), ("c d",)).alias("cd"),
        ).first()
        assert row["ab"] == "7" and row["cd"] == "x"
