"""Bucketed graph persistence: the co-located-join layout must (a) return
exactly the unbucketed results and (b) run the adjacency join with ZERO
shuffle exchanges once broadcast is disabled (the bucket layout satisfies
the join's required distribution)."""

import pytest
from pyspark.sql import functions as F

from tundradb_spark.database import Database
from tundradb_spark.plans import audit
from tundradb_spark.query import Query
from tundradb_spark.sources.bucketed import load_graph_bucketed, save_graph_bucketed
from tests.conftest import rows_set


@pytest.fixture(scope="module")
def graphs(spark, tmp_path_factory):
    src = Database(spark)
    users = [(i, f"u{i}", 20 + i % 30) for i in range(200)]
    comps = [(i, f"c{i}", 100 * i) for i in range(20)]
    src.register_node_table(
        "users", spark.createDataFrame(users, "id long, name string, age long")
    )
    src.register_node_table(
        "companies", spark.createDataFrame(comps, "id long, name string, size long")
    )
    edges = [(i, i, i % 20, 0) for i in range(200)]
    src.register_edge_table(
        "WORKS_AT",
        spark.createDataFrame(
            edges, "id long, source_id long, target_id long, created_ts long"
        ),
    )
    loc = str(tmp_path_factory.mktemp("bucketed_graph"))
    save_graph_bucketed(src, "tb", loc, n_buckets=4)
    return src, load_graph_bucketed(spark, loc)


def _match(db):
    return db.query(
        Query.from_("u:users")
        .where("u.age", ">", 30)
        .traverse("u", "WORKS_AT", "c:companies", "inner")
        .select("u.id AS uid", "u.name AS uname", "c.name AS cname")
    )


def test_bucketed_results_identical(graphs):
    src, bucketed = graphs
    assert rows_set(_match(bucketed)) == rows_set(_match(src))


def test_bucketed_join_no_shuffle(graphs, spark):
    _, bucketed = graphs
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed.get_edge_table("WORKS_AT").join(
            bucketed.get_table("users").select(
                F.col("id").alias("source_id"), "age"
            ),
            "source_id",
        )
        # both scans are bucketed on the join key -> no Exchange anywhere
        assert audit.count_exchanges(df) == 0, audit.formatted_plan(df)
        assert "SortMergeJoin" in audit.formatted_plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_match_no_fact_shuffle(graphs, spark):
    # the full MATCH path over the bucketed layout: with broadcast off, the
    # users-edge adjacency join must ride the bucket distribution
    _, bucketed = graphs
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _match(bucketed)
        plan = audit.formatted_plan(df)
        # the companies hop joins on target_id (not the bucket key) and may
        # shuffle; the users-side adjacency join must not — allow at most
        # that one exchange pair, and require a bucket-riding SMJ
        assert audit.count_exchanges(df) <= 2, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_table_ident_rejects_unsafe_names():
    """ADVICE r4: idents are interpolated into raw SQL — leading digits
    and non-ASCII alphanumerics must be rejected, not passed through."""
    import pytest

    from tundradb_spark.errors import QueryError
    from tundradb_spark.sources.bucketed import _table_ident

    assert _table_ident("g", "node", "customer") == "g__node__customer"
    with pytest.raises(QueryError):
        _table_ident("1g", "node", "customer")  # leading digit
    with pytest.raises(QueryError):
        _table_ident("g", "node", "ｃｕｓｔ")  # non-ASCII alnum
    with pytest.raises(QueryError):
        _table_ident("g", "node", "cust; DROP TABLE x")
