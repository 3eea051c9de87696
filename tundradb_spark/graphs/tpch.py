"""Map the driver's TPC-H-ish parquet tables onto the engine's graph model.

FIXTURES.md ("Driver testdata note") prescribes exactly this: FK columns
become edge tables, entity tables become node schemas, so the reference's
join/filter/projection semantics are exercised at scale on real data.

Node schemas (id = the table's primary key):
    customer, nation, region, supplier, part, orders

Edge types (source → target, built from FK projections of the same scans —
Catalyst prunes the edge scan down to the 2-3 columns used):
    IN_NATION        customer → nation
    SUPP_IN_NATION   supplier → nation
    IN_REGION        nation → region
    HAS_ORDER        customer → orders
    HAS_ITEM         orders → part     (props: l_suppkey, l_quantity,
                     l_extendedprice, l_discount, l_returnflag, l_shipdate;
                     edge id = l_orderkey*16 + l_linenumber, collision-free
                     since l_linenumber ≤ 7 in TPC-H)
"""

from __future__ import annotations

import weakref

from pyspark.sql import SparkSession, functions as F

from tundradb_spark.catalog import MAX_TS
from tundradb_spark.database import Database
from tundradb_spark.session import ensure_runtime_confs

#: valid-time at which the synthetic "reprice" update happens (see
#: load_versioned_orders)
REPRICE_VT = 1_000

# Read-only Database instances cached per (session, sf_dir): the contract
# queries never mutate the TPC-H graph, and re-registering 8 node + 5 edge
# tables per query dominated the round-1 bench floor (~1.5s/query flat).
# WeakKeyDictionary so a stopped/garbage-collected session drops its cache.
_GRAPH_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, Database]]" = (
    weakref.WeakKeyDictionary()
)
_VERSIONED_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, Database]]" = (
    weakref.WeakKeyDictionary()
)


def load_versioned_orders(spark: SparkSession, sf_dir: str) -> Database:
    """A bitemporally versioned ``orders_v`` node table built
    deterministically from the orders scan, exercising the reference's
    version-chain model (include/memory/node_arena.hpp:40-81,
    docs/README_temporal_versioning.md:78-100) at driver-data scale:

    - version 0: every order as created at vt=0; for 'F' (fulfilled) orders
      the valid interval is closed at REPRICE_VT by a later update.
    - version 1: the update — 'F' orders get o_totalprice doubled (an exact
      IEEE-754 scaling, so oracle comparison is bit-stable), valid from
      REPRICE_VT, open-ended.

    AS-OF vt < REPRICE_VT sees original prices; vt >= REPRICE_VT sees the
    repriced rows. Resolution is ``resolve_as_of``: an interval filter that
    pushes to the scan plus one per-id window pick.
    """
    ensure_runtime_confs(spark)
    cached = _VERSIONED_CACHE.setdefault(spark, {})
    if sf_dir in cached:
        return cached[sf_dir]
    db = Database(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    max_ts = F.lit(MAX_TS).cast("long")
    zero = F.lit(0).cast("long")
    is_f = F.col("o_orderstatus") == "F"
    v0 = (
        orders.withColumn("valid_from", zero)
        .withColumn(
            "valid_to",
            F.when(is_f, F.lit(REPRICE_VT).cast("long")).otherwise(max_ts),
        )
        .withColumn("tx_from", zero)
        .withColumn("tx_to", max_ts)
        .withColumn("version_id", zero)
    )
    v1 = (
        orders.filter(is_f)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("valid_from", F.lit(REPRICE_VT).cast("long"))
        .withColumn("valid_to", max_ts)
        .withColumn("tx_from", F.lit(REPRICE_VT).cast("long"))
        .withColumn("tx_to", max_ts)
        .withColumn("version_id", F.lit(1).cast("long"))
    )
    db.register_node_table(
        "orders_v",
        v0.unionByName(v1),
        "o_orderkey",
        resume_counter=False,
        pre_versioned=True,
    )
    # shared across every later query in the process: a mutation would
    # silently poison them all, so fail loudly instead (round-2 ADVICE)
    db.read_only = True
    cached[sf_dir] = db
    return db


def load_graph(spark: SparkSession, sf_dir: str) -> Database:
    ensure_runtime_confs(spark)
    cached = _GRAPH_CACHE.setdefault(spark, {})
    if sf_dir in cached:
        return cached[sf_dir]
    db = Database(spark)
    read = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731

    db.register_node_table("customer", read("customer"), "c_custkey", resume_counter=False)
    db.register_node_table("nation", read("nation"), "n_nationkey", resume_counter=False)
    db.register_node_table("region", read("region"), "r_regionkey", resume_counter=False)
    db.register_node_table("supplier", read("supplier"), "s_suppkey", resume_counter=False)
    db.register_node_table("part", read("part"), "p_partkey", resume_counter=False)
    db.register_node_table("orders", read("orders"), "o_orderkey", resume_counter=False)
    db.register_node_table(
        "lineitem",
        read("lineitem").withColumn(
            "id", F.col("l_orderkey") * 16 + F.col("l_linenumber")
        ),
        resume_counter=False,
    )
    # events: the reference's MAP column realization (map<string,X> with
    # typed access, FIXTURES.md F6) — props JSON → map<string,long>
    db.register_node_table(
        "events",
        read("events").withColumn(
            "props_map", F.from_json("props", "map<string,bigint>")
        ),
        "event_id",
        resume_counter=False,
    )

    cust = read("customer")
    db.register_edge_table(
        "IN_NATION",
        cust.select(
            F.col("c_custkey").alias("id"),
            F.col("c_custkey").alias("source_id"),
            F.col("c_nationkey").alias("target_id"),
            F.lit(0).cast("long").alias("created_ts"),
        ),
    )
    supp = read("supplier")
    db.register_edge_table(
        "SUPP_IN_NATION",
        supp.select(
            F.col("s_suppkey").alias("id"),
            F.col("s_suppkey").alias("source_id"),
            F.col("s_nationkey").alias("target_id"),
            F.lit(0).cast("long").alias("created_ts"),
        ),
    )
    nat = read("nation")
    db.register_edge_table(
        "IN_REGION",
        nat.select(
            F.col("n_nationkey").alias("id"),
            F.col("n_nationkey").alias("source_id"),
            F.col("n_regionkey").alias("target_id"),
            F.lit(0).cast("long").alias("created_ts"),
        ),
    )
    orders = read("orders")
    db.register_edge_table(
        "HAS_ORDER",
        orders.select(
            F.col("o_orderkey").alias("id"),
            F.col("o_custkey").alias("source_id"),
            F.col("o_orderkey").alias("target_id"),
            F.lit(0).cast("long").alias("created_ts"),
        ),
    )
    li = read("lineitem")
    db.register_edge_table(
        "HAS_ITEM",
        li.select(
            (F.col("l_orderkey") * 16 + F.col("l_linenumber")).alias("id"),
            F.col("l_orderkey").alias("source_id"),
            F.col("l_partkey").alias("target_id"),
            F.lit(0).cast("long").alias("created_ts"),
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_returnflag",
            "l_shipdate",
        ),
    )
    db.read_only = True  # shared cached instance (see load_versioned_orders)
    cached[sf_dir] = db
    return db
