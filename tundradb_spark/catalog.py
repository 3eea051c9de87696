"""Schema catalog + per-schema ID allocation.

Reference parity:
- node schemas are fixed/explicit; the registry prepends a synthetic
  ``id: int64`` column (reference: src/schema/schema.cpp:168-170).
- node IDs auto-increment per schema starting at 0
  (reference: include/core/node.hpp:112-125, README.md:140).
- edge tables always carry ``id, source_id, target_id, created_ts``
  plus declared property columns (reference: src/core/edge_store.cpp:467-470).

Counters live in the catalog (driver-side, single-writer like the embedded
reference) and are persisted into the snapshot manifest so they survive
restarts (reference guards the same bug class at
include/core/edge_store.hpp:124-143).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from tundradb_spark.errors import SchemaError

ID_COL = "id"
EDGE_STRUCTURAL_FIELDS = ("id", "source_id", "target_id", "created_ts")

# Bitemporal version columns (reference: include/memory/node_arena.hpp:40-81).
VERSION_COLS = ("valid_from", "valid_to", "tx_from", "tx_to", "version_id")
MAX_TS = (1 << 63) - 1  # UINT64_MAX analog: "open" interval end / "now"

_TYPE_ALIASES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "str": T.StringType(),
    "int64": T.LongType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "int32": T.IntegerType(),
    "int": T.IntegerType(),
    "float64": T.DoubleType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}


def parse_type(t: str | T.DataType) -> T.DataType:
    """Resolve a TundraQL/utility type name to a Spark DataType.

    Accepts the reference's TundraQL type keywords (STRING, INT64, FLOAT64,
    BOOL, ARRAY, MAP — antlr/TundraQL.g4:138-141) plus common Spark names and
    parameterized forms like ``array<string>`` / ``map<string,string>``.
    """
    if isinstance(t, T.DataType):
        return t
    s = t.strip().lower()
    if s in _TYPE_ALIASES:
        return _TYPE_ALIASES[s]
    if s.startswith("array<") and s.endswith(">"):
        return T.ArrayType(parse_type(s[6:-1]))
    if s.startswith("map<") and s.endswith(">"):
        k, v = s[4:-1].split(",", 1)
        return T.MapType(parse_type(k), parse_type(v))
    if s == "map":
        # Reference MAP is string-keyed heterogeneous (map<utf8, dense_union>,
        # include/arrow/utils.hpp:127-137); the Spark realization is
        # map<string,string> with typed cast on access (SURVEY.md §7).
        return T.MapType(T.StringType(), T.StringType())
    try:
        return T.DataType.fromDDL(t)  # full DDL fallback, e.g. "decimal(10,2)"
    except Exception as exc:  # noqa: BLE001
        raise SchemaError(f"unknown type: {t!r}") from exc


@dataclass
class NodeSchema:
    name: str
    struct: T.StructType  # includes leading id column
    version: int = 1

    @property
    def field_names(self) -> list[str]:
        return [f.name for f in self.struct.fields]


@dataclass
class EdgeSchema:
    """Declared property columns of a typed edge (CREATE EDGE SCHEMA)."""

    name: str
    props: T.StructType = field(default_factory=T.StructType)

    def full_struct(self) -> T.StructType:
        fields = [
            T.StructField("id", T.LongType(), False),
            T.StructField("source_id", T.LongType(), False),
            T.StructField("target_id", T.LongType(), False),
            T.StructField("created_ts", T.LongType(), False),
        ]
        return T.StructType(fields + list(self.props.fields))


class Catalog:
    """In-memory registry of node schemas, edge schemas, and ID counters."""

    def __init__(self) -> None:
        self.node_schemas: dict[str, NodeSchema] = {}
        self.edge_schemas: dict[str, EdgeSchema] = {}
        self.node_id_counters: dict[str, int] = {}
        self.edge_id_counter: int = 0

    # -- node schemas -----------------------------------------------------
    def create_node_schema(
        self, name: str, fields: dict[str, str | T.DataType]
    ) -> NodeSchema:
        if ID_COL in fields:
            raise SchemaError(f"'{ID_COL}' is reserved (auto-prepended)")
        struct = T.StructType(
            [T.StructField(ID_COL, T.LongType(), False)]
            + [T.StructField(k, parse_type(v), True) for k, v in fields.items()]
        )
        if name in self.node_schemas:
            # Reference tolerates duplicate CREATE SCHEMA (emplace keeps the
            # first, src/schema/schema.cpp:174-185) — so re-declaring after a
            # snapshot restore must not fail. We no-op on an identical
            # re-declaration and error only on a conflicting one.
            if self.node_schemas[name].struct == struct:
                return self.node_schemas[name]
            raise SchemaError(f"schema already exists with different fields: {name}")
        schema = NodeSchema(name=name, struct=struct)
        self.node_schemas[name] = schema
        self.node_id_counters.setdefault(name, 0)
        return schema

    def get_node_schema(self, name: str) -> NodeSchema:
        if name not in self.node_schemas:
            raise SchemaError(f"unknown schema: {name}")
        return self.node_schemas[name]

    def next_node_id(self, schema: str, n: int = 1) -> int:
        """Reserve n consecutive ids; returns the first."""
        self.get_node_schema(schema)
        first = self.node_id_counters.get(schema, 0)
        self.node_id_counters[schema] = first + n
        return first

    # -- edge schemas ------------------------------------------------------
    def create_edge_schema(
        self, name: str, props: dict[str, str | T.DataType]
    ) -> EdgeSchema:
        if name in self.edge_schemas and self.edge_schemas[name].props.fields:
            raise SchemaError(f"edge schema already exists: {name}")
        for p in props:
            if p in EDGE_STRUCTURAL_FIELDS:
                raise SchemaError(f"edge property '{p}' collides with structural field")
        struct = T.StructType(
            [T.StructField(k, parse_type(v), True) for k, v in props.items()]
        )
        schema = EdgeSchema(name=name, props=struct)
        self.edge_schemas[name] = schema
        return schema

    def get_or_create_edge_schema(self, name: str) -> EdgeSchema:
        # Untyped edges (no CREATE EDGE SCHEMA) are legal in the reference:
        # they just have the structural columns.
        if name not in self.edge_schemas:
            self.edge_schemas[name] = EdgeSchema(name=name)
        return self.edge_schemas[name]

    def next_edge_id(self, n: int = 1) -> int:
        first = self.edge_id_counter
        self.edge_id_counter = first + n
        return first

    # -- manifest (snapshot persistence of catalog state) ------------------
    def to_manifest(self) -> dict:
        return {
            "node_schemas": {
                n: {"ddl": s.struct.json(), "version": s.version}
                for n, s in self.node_schemas.items()
            },
            "edge_schemas": {n: s.props.json() for n, s in self.edge_schemas.items()},
            "node_id_counters": dict(self.node_id_counters),
            "edge_id_counter": self.edge_id_counter,
        }

    @classmethod
    def from_manifest(cls, m: dict) -> Catalog:
        cat = cls()
        for n, meta in m.get("node_schemas", {}).items():
            struct = T.StructType.fromJson(__import__("json").loads(meta["ddl"]))
            cat.node_schemas[n] = NodeSchema(n, struct, meta.get("version", 1))
        for n, props_json in m.get("edge_schemas", {}).items():
            props = T.StructType.fromJson(__import__("json").loads(props_json))
            cat.edge_schemas[n] = EdgeSchema(n, props)
        cat.node_id_counters = dict(m.get("node_id_counters", {}))
        cat.edge_id_counter = m.get("edge_id_counter", 0)
        return cat
