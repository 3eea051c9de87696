"""Driver contract for the spark-graft builder (PySpark target).

Every ``queries()`` entry routes through the engine
(``tundradb_spark.Database`` + ``Query``) over the graph mapping of the
driver's TPC-H-ish tables (``tundradb_spark/graphs/tpch.py``), exercising
the operator inventory of SURVEY.md §2; ``oracle_sql()`` holds the DuckDB
equivalent with IDENTICAL output column names.

Float determinism: monetary SUMs go through ``cast decimal(18,2)`` on both
sides so results are exact and partition-order independent, then cast back
to double for a type-stable comparison.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from tundradb_spark.graphs.tpch import load_graph
from tundradb_spark.pipeline.queries import PIPELINE_ORACLES, PIPELINE_QUERIES
from tundradb_spark.query import Query, where as W


def _bt(name: str):
    return F.col("`" + name + "`")


# ---------------------------------------------------------------------------
# queries — each (spark, sf_dir) -> DataFrame, via the engine
# ---------------------------------------------------------------------------


def q_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 node scan + F1/F2 predicates + P1 projection."""
    db = load_graph(spark, sf_dir)
    q = (
        Query.from_("c:customer")
        .where(
            (W("c.c_acctbal", ">", 5000.0) & W("c.c_mktsegment", "=", "BUILDING"))
            | W("c.c_name", "starts_with", "Customer#00000001")
        )
        .select(
            "c.id AS c_custkey",
            "c.c_name AS c_name",
            "c.c_acctbal AS c_acctbal",
            "c.c_mktsegment AS c_mktsegment",
        )
    )
    return db.query(q)


def q_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 single INNER hop (customer —IN_NATION→ nation)."""
    db = load_graph(spark, sf_dir)
    q = (
        Query.from_("c:customer")
        .where("c.c_acctbal", ">", 7500.0)
        .traverse("c", "IN_NATION", "n:nation", "inner")
        .select("c.id AS c_custkey", "c.c_name AS c_name", "n.n_name AS n_name")
    )
    return db.query(q)


def q_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained INNER hops customer→nation→region with a far-side filter."""
    db = load_graph(spark, sf_dir)
    q = (
        Query.from_("c:customer")
        .traverse("c", "IN_NATION", "n:nation", "inner")
        .traverse("n", "IN_REGION", "r:region", "inner")
        .where("r.r_name", "=", "ASIA")
        .where("c.c_acctbal", "<", 0.0)
        .select("c.id AS c_custkey", "n.n_name AS n_name", "r.r_name AS r_name")
    )
    return db.query(q)


def q_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 LEFT: every high-balance customer, orders null-padded."""
    db = load_graph(spark, sf_dir)
    q = (
        Query.from_("c:customer")
        .where("c.c_acctbal", ">", 9000.0)
        .traverse("c", "HAS_ORDER", "o:orders", "left")
        .select(
            "c.id AS c_custkey",
            "c.c_acctbal AS c_acctbal",
            "o.id AS o_orderkey",
            "o.o_totalprice AS o_totalprice",
        )
    )
    return db.query(q)


def q_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 RIGHT cross-schema: all orders kept, filtered customers padded."""
    db = load_graph(spark, sf_dir)
    q = (
        Query.from_("c:customer")
        .where("c.c_acctbal", ">", 9900.0)
        .traverse("c", "HAS_ORDER", "o:orders", "right")
        .where("o.o_totalprice", ">", 300000.0)
        .select(
            "c.id AS c_custkey",
            "c.c_name AS c_name",
            "o.id AS o_orderkey",
            "o.o_totalprice AS o_totalprice",
        )
    )
    return db.query(q)


def q_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 FULL outer (cross-schema) with filters inlined on both sides."""
    db = load_graph(spark, sf_dir)
    q = (
        Query.from_("c:customer")
        .where("c.c_acctbal", ">", 9900.0)
        .traverse("c", "HAS_ORDER", "o:orders", "full")
        .where("o.o_totalprice", ">", 400000.0)
        .select(
            "c.id AS c_custkey",
            "c.c_acctbal AS c_acctbal",
            "o.id AS o_orderkey",
            "o.o_totalprice AS o_totalprice",
        )
    )
    return db.query(q)


def q_edge_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4-style typed edges: HAS_ITEM carries lineitem properties; edge alias
    filter + edge columns in the output."""
    db = load_graph(spark, sf_dir)
    q = (
        Query.from_("o:orders")
        .traverse("o", "li:HAS_ITEM", "p:part", "inner")
        .where("li.l_quantity", ">=", 49.0)
        .where("p.p_size", ">", 40)
        .select(
            "o.id AS o_orderkey",
            "p.id AS p_partkey",
            "li.l_quantity AS quantity",
            "li.l_extendedprice AS extendedprice",
            "p.p_size AS p_size",
        )
    )
    return db.query(q)


def q_branching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two hops off the same alias → per-source cartesian (J11 row merge)."""
    db = load_graph(spark, sf_dir)
    q = (
        Query.from_("c:customer")
        .where("c.c_acctbal", ">", 9950.0)
        .traverse("c", "IN_NATION", "n:nation", "inner")
        .traverse("c", "HAS_ORDER", "o:orders", "inner")
        .select(
            "c.id AS c_custkey",
            "n.n_name AS n_name",
            "o.id AS o_orderkey",
            "o.o_orderstatus AS o_orderstatus",
        )
    )
    return db.query(q)


def q_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation (capability extension §2.5: the reference
    has no aggregations; Spark groupBy/agg with partial map-side combine)."""
    db = load_graph(spark, sf_dir)
    q = (
        Query.from_("l:lineitem")
        .where("l.l_quantity", "<", 48.0)
        .group_by("l.l_returnflag", "l.l_linestatus")
        .agg("count", "*", "count_order")
        .agg("sum", "l.l_quantity", "sum_qty")
        .agg("sum", "l.l_extendedprice", "sum_price", cast="decimal(18,2)")
        .agg("avg", "l.l_quantity", "avg_qty")
    )
    df = db.query(q)
    return df.select(
        _bt("l.l_returnflag").alias("l_returnflag"),
        _bt("l.l_linestatus").alias("l_linestatus"),
        F.col("count_order"),
        F.col("sum_qty"),
        F.col("sum_price").cast("double").alias("sum_price"),
        F.round(F.col("avg_qty"), 6).alias("avg_qty"),
    )


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT (declared-but-unimplemented in the reference, O1)."""
    db = load_graph(spark, sf_dir)
    q = (
        Query.from_("o:orders")
        .order_by("o.o_totalprice desc", "o.id")
        .limit(10)
        .select("o.id AS o_orderkey", "o.o_totalprice AS o_totalprice")
    )
    return db.query(q)


def q_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 MAP column: nested path in WHERE and SELECT (P2/SF3)."""
    db = load_graph(spark, sf_dir)
    q = (
        Query.from_("e:events")
        .where("e.props_map.k", ">", 90)
        .where("e.event_type", "=", "purchase")
        .select("e.id AS event_id", "e.props_map.k AS k_val")
    )
    return db.query(q)


def q_edge_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW EDGES-style count (D11 — the reference's only count)."""
    db = load_graph(spark, sf_dir)
    return db.get_edge_table("HAS_ITEM").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.count_distinct(F.col("source_id")).alias("n_sources"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_scan_filter": q_scan_filter,
    "q_inner_join": q_inner_join,
    "q_two_hop": q_two_hop,
    "q_left_join": q_left_join,
    "q_right_join": q_right_join,
    "q_full_join": q_full_join,
    "q_edge_props": q_edge_props,
    "q_branching": q_branching,
    "q_agg_pricing": q_agg_pricing,
    "q_topk": q_topk,
    "q_map_access": q_map_access,
    "q_edge_count": q_edge_count,
    # training-data pipeline operators (dedup / similarity / text / multimodal)
    **PIPELINE_QUERIES,
}

ORACLES: dict[str, str] = {
    "q_scan_filter": """
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer
        WHERE (c_acctbal > 5000.0 AND c_mktsegment = 'BUILDING')
           OR c_name LIKE 'Customer#00000001%'
    """,
    "q_inner_join": """
        SELECT c.c_custkey AS c_custkey, c.c_name AS c_name, n.n_name AS n_name
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > 7500.0
    """,
    "q_two_hop": """
        SELECT c.c_custkey AS c_custkey, n.n_name AS n_name, r.r_name AS r_name
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA' AND c.c_acctbal < 0.0
    """,
    "q_left_join": """
        SELECT c.c_custkey AS c_custkey, c.c_acctbal AS c_acctbal,
               o.o_orderkey AS o_orderkey, o.o_totalprice AS o_totalprice
        FROM (SELECT * FROM customer WHERE c_acctbal > 9000.0) c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    """,
    "q_right_join": """
        SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
               o.o_orderkey AS o_orderkey, o.o_totalprice AS o_totalprice
        FROM (SELECT * FROM customer WHERE c_acctbal > 9900.0) c
        RIGHT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
          ON o.o_custkey = c.c_custkey
    """,
    "q_full_join": """
        SELECT c.c_custkey AS c_custkey, c.c_acctbal AS c_acctbal,
               o.o_orderkey AS o_orderkey, o.o_totalprice AS o_totalprice
        FROM (SELECT * FROM customer WHERE c_acctbal > 9900.0) c
        FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
          ON o.o_custkey = c.c_custkey
    """,
    "q_edge_props": """
        SELECT l.l_orderkey AS o_orderkey, p.p_partkey AS p_partkey,
               l.l_quantity AS quantity, l.l_extendedprice AS extendedprice,
               p.p_size AS p_size
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_quantity >= 49.0 AND p.p_size > 40
    """,
    "q_branching": """
        SELECT c.c_custkey AS c_custkey, n.n_name AS n_name,
               o.o_orderkey AS o_orderkey, o.o_orderstatus AS o_orderstatus
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE c.c_acctbal > 9950.0
    """,
    "q_agg_pricing": """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS count_order,
               SUM(l_quantity) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price,
               ROUND(AVG(l_quantity), 6) AS avg_qty
        FROM lineitem
        WHERE l_quantity < 48.0
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_topk": """
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    "q_map_access": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
          AND event_type = 'purchase'
    """,
    "q_edge_count": """
        SELECT COUNT(*) AS n_edges,
               COUNT(DISTINCT l_orderkey) AS n_sources
        FROM lineitem
    """,
    **PIPELINE_ORACLES,
}


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_two_hop(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
