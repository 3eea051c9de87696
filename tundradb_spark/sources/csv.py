"""CSV graph loading — S9 (reference ``bench/tundra_runner.cpp:33-70,149``:
the bench runner bootstraps users/companies/friend/works_at CSVs into the
database).

Spark-first: ``spark.read.csv`` does the heavy lifting (header, schema
inference or an explicit DDL schema, distributed parse); rows land in the
engine through the same bulk paths every other source uses
(``register_node_table`` / ``bulk_insert`` / ``bulk_connect``), so CSV
ingest scales exactly like parquet ingest — no driver-side row loops.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    from tundradb_spark.database import Database


def _read(db: "Database", path: str, schema: str | None) -> DataFrame:
    reader = db.spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def load_csv_nodes(
    db: "Database",
    schema_name: str,
    path: str,
    id_col: str | None = "id",
    schema: str | None = None,
) -> int:
    """Load a node CSV into ``schema_name``.

    With ``id_col`` present in the file the table is registered zero-copy
    (ids taken from the file, counter resumed past max). Without one,
    engine-contiguous ids are assigned via ``bulk_insert`` (the schema is
    created from the frame when missing). Pass an explicit ``schema`` DDL
    string (``"id long, name string"``) to skip inferSchema's extra pass
    over the file.
    Returns the number of rows loaded — taken from the ingest path's own
    aggregation (register's max+count agg / bulk_insert's size pass), so a
    load is exactly ONE pass over the data (plus inference when no
    ``schema`` is given).
    """
    df = _read(db, path, schema)
    if id_col is not None and id_col in df.columns:
        return db.register_node_table(schema_name, df, id_col=id_col)
    if schema_name not in db.catalog.node_schemas:
        db.create_schema(
            schema_name,
            {f.name: f.dataType.simpleString() for f in df.schema.fields},
        )
    return db.bulk_insert(schema_name, df)


def load_csv_edges(
    db: "Database",
    edge_type: str,
    path: str,
    source_col: str = "source_id",
    target_col: str = "target_id",
    schema: str | None = None,
) -> int:
    """Load an edge CSV (``source_col, target_col`` + any property columns)
    into ``edge_type`` via the distributed ``bulk_connect`` path. Property
    columns beyond the endpoints must already exist on the edge schema
    (``db.create_edge_schema``). Returns the number of edges loaded (from
    bulk_connect's id-assignment size pass — no extra scan; pass an
    explicit ``schema`` to also skip inferSchema's pass)."""
    df = _read(db, path, schema)
    df = df.withColumnRenamed(source_col, "source_id").withColumnRenamed(
        target_col, "target_id"
    )
    return db.bulk_connect(edge_type, df)
