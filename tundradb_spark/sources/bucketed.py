"""Bucketed graph persistence: co-located MATCH joins with no shuffle.

The snapshot layout (sources/snapshot.py) optimizes restore/commit; this
layout optimizes READ: node tables are written ``bucketBy(n, 'id')`` and
edge tables ``bucketBy(n, 'source_id')`` as Spark catalog tables, so the
adjacency equi-join every MATCH hop compiles to (edge.source_id = node.id)
finds BOTH sides already hash-distributed on the join key — Spark elides
the Exchange entirely (plan-test-pinned).  At 100 TB this removes the
dominant cost of a deep traversal: none of the fact-sized tables are ever
repartitioned over the network; only dimension-sized hops still broadcast.

Write-side cost: one clustering shuffle per table, paid once.  Bucket count
is the parallelism floor for shuffle-free reads — size it to
``max(table_bytes) / target_partition_bytes`` at deployment scale (the
128 MB parquet default), NOT to the test-cluster core count.

The reference persists adjacency as per-shard hash maps rebuilt in memory
on restore (include/core/edge_store.hpp:124-143); pre-clustered parquet is
the Spark-native equivalent — the "hash map" is the bucket layout itself.
"""

from __future__ import annotations

import json
import os
import re
from typing import TYPE_CHECKING

from pyspark.sql import SparkSession

from tundradb_spark.errors import QueryError

if TYPE_CHECKING:  # pragma: no cover
    from tundradb_spark.database import Database

_GRAPH_META = "_graph.json"


def _table_ident(prefix: str, kind: str, name: str) -> str:
    ident = f"{prefix}__{kind}__{name}"
    # strict ASCII identifier: the ident is interpolated into raw SQL
    # (DROP TABLE IF EXISTS ...) and saveAsTable — leading digits and
    # non-ASCII alphanumerics (which isalnum() accepts) are rejected
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", ident):
        raise QueryError(f"bucketed table name not identifier-safe: {ident!r}")
    return ident


def save_graph_bucketed(
    db: "Database",
    prefix: str,
    location: str,
    n_buckets: int = 16,
) -> dict:
    """Persist every node/edge table of ``db`` bucketed on its join key.

    ``prefix`` namespaces the catalog table names
    (``{prefix}__n__{schema}`` / ``{prefix}__e__{type}``); ``location``
    roots the external parquet directories and holds a small manifest for
    :func:`load_graph_bucketed`.  Nodes are additionally ``sortBy('id')``
    within buckets, so the shuffle-free sort-merge join skips its sort too
    and id-range predicates prune row groups via parquet min/max.
    """
    os.makedirs(location, exist_ok=True)
    spark = db.spark
    meta: dict = {"prefix": prefix, "n_buckets": n_buckets, "nodes": {}, "edges": {}}
    for name in db.catalog.node_schemas:
        ident = _table_ident(prefix, "n", name)
        spark.sql(f"DROP TABLE IF EXISTS {ident}")
        (
            db.get_table(name)
            .write.mode("overwrite")
            .option("path", os.path.join(location, "n", name))
            .bucketBy(n_buckets, "id")
            .sortBy("id")
            .format("parquet")
            .saveAsTable(ident)
        )
        meta["nodes"][name] = ident
    for etype in list(db._edges):
        ident = _table_ident(prefix, "e", etype)
        spark.sql(f"DROP TABLE IF EXISTS {ident}")
        (
            db.get_edge_table(etype)
            .write.mode("overwrite")
            .option("path", os.path.join(location, "e", etype))
            .bucketBy(n_buckets, "source_id")
            .sortBy("source_id")
            .format("parquet")
            .saveAsTable(ident)
        )
        meta["edges"][etype] = ident
    with open(os.path.join(location, _GRAPH_META), "w") as f:
        json.dump(meta, f)
    return meta


def load_graph_bucketed(spark: SparkSession, location: str) -> "Database":
    """Rebuild a read-only Database over the bucketed catalog tables.

    Every MATCH hop then joins two pre-clustered scans: zero Exchange on
    the fact side (the bucket layout IS the required distribution) —
    ``tests/test_bucketed.py`` pins the shuffle-free plan and result
    equality with the unbucketed graph.
    """
    from tundradb_spark.database import Database

    with open(os.path.join(location, _GRAPH_META)) as f:
        meta = json.load(f)
    db = Database(spark)
    for name, ident in meta["nodes"].items():
        db.register_node_table(name, spark.table(ident), resume_counter=False)
    for etype, ident in meta["edges"].items():
        db.register_edge_table(etype, spark.table(ident))
    db.read_only = True
    return db
