"""tundradb-spark: a PySpark-native graph analytics engine.

A ground-up rebuild of the capabilities of the reference system
dmgcodevil/tundradb (an embeddable C++ graph database with typed node/edge
schemas, a Cypher-inspired query language whose MATCH patterns carry SQL
join semantics, bitemporal versioning, and Parquet snapshots) — re-expressed
on the Spark DataFrame/SQL stack so the same queries run declaratively
through Catalyst at cluster scale.

Design stance (see SURVEY.md):
- one DataFrame per node schema (`id` + declared fields), one per edge type
  (`id, source_id, target_id, created_ts` + properties)
- MATCH compiles to a join tree; Catalyst does pushdown/pruning/reordering
- bitemporal AS-OF is an interval filter + newest-visible window pick
- snapshots are versioned Parquet directories with a JSON manifest
- everything beyond the reference surface (aggregation, windows, dedup,
  similarity search, text analysis, streaming) is plain Spark on the same
  tables
"""

from tundradb_spark.database import Database
from tundradb_spark.errors import QueryError, SchemaError
from tundradb_spark.query import CompareOp, Query, TraverseType
from tundradb_spark.session import get_spark

__all__ = [
    "Database",
    "Query",
    "CompareOp",
    "TraverseType",
    "QueryError",
    "SchemaError",
    "get_spark",
]

__version__ = "0.1.0"
