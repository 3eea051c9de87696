"""Query IR + fluent builder.

Mirrors the *semantics* of the reference query model
(include/query/query.hpp:524-683 fluent builder; Traverse clauses at
query.hpp:263-294; TraverseType at query.hpp:259; CompareOp at
query.hpp:74-84; LogicalExpr trees at query.hpp:374-428) but compiles to a
Spark DataFrame plan instead of an imperative executor.

Capability extensions beyond the reference surface (the reference declares
ORDER_BY / LIMIT in its clause enum but never implements them,
include/query/query.hpp:168; it has no aggregations at all): ``group_by``,
``agg``, ``order_by``, ``limit``, ``distinct`` — free on Spark.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from enum import Enum
from typing import Any

from tundradb_spark.errors import QueryError


class CompareOp(str, Enum):
    EQ = "="
    NE = "!="
    GT = ">"
    LT = "<"
    GE = ">="
    LE = "<="
    CONTAINS = "CONTAINS"
    STARTS_WITH = "STARTS_WITH"
    ENDS_WITH = "ENDS_WITH"

    @classmethod
    def parse(cls, op: "str | CompareOp") -> "CompareOp":
        if isinstance(op, CompareOp):
            return op
        s = op.strip().upper()
        aliases = {"==": "=", "<>": "!=", ">=": ">=", "<=": "<="}
        s = aliases.get(s, s)
        for m in cls:
            if m.value == s or m.name == s:
                return m
        raise QueryError(f"unknown compare op: {op!r}")


class TraverseType(str, Enum):
    INNER = "inner"
    LEFT = "left"
    RIGHT = "right"
    FULL = "full"
    # extensions (SURVEY.md §2.4 J14): the reference uses semi/anti joins
    # internally (INNER source-pruning is a semi-join, src/query/join.cpp:64-65;
    # RIGHT-self subtraction an anti-join, join.cpp:187-188) but never exposes
    # them in the language. We do: a SEMI/ANTI hop filters the source alias by
    # edge existence without binding the target's columns into the output.
    SEMI = "semi"
    ANTI = "anti"

    @classmethod
    def parse(cls, t: "str | TraverseType") -> "TraverseType":
        if isinstance(t, TraverseType):
            return t
        s = t.strip().lower()
        for m in cls:
            if m.value == s or m.name.lower() == s:
                return m
        raise QueryError(f"unknown traverse/join type: {t!r}")


@dataclass(frozen=True)
class FieldRef:
    """A (possibly nested) field reference like ``u.age`` or ``u.props.role``.

    Reference: include/query/query.hpp:86-161 (alias + field + nested_path).
    """

    alias: str
    field: str
    nested_path: tuple[str, ...] = ()

    @classmethod
    def parse(cls, ref: str) -> "FieldRef":
        parts = ref.split(".")
        if len(parts) < 2:
            raise QueryError(f"field ref must be alias.field[.key...]: {ref!r}")
        return cls(parts[0], parts[1], tuple(parts[2:]))

    def __str__(self) -> str:
        return ".".join([self.alias, self.field, *self.nested_path])


class Expr:
    """WHERE expression tree node."""

    def aliases(self) -> set[str]:
        raise NotImplementedError

    def __and__(self, other: "Expr") -> "Expr":
        return Logical(self, "AND", other)

    def __or__(self, other: "Expr") -> "Expr":
        return Logical(self, "OR", other)


@dataclass
class Compare(Expr):
    ref: FieldRef
    op: CompareOp
    value: Any

    def aliases(self) -> set[str]:
        return {self.ref.alias}


@dataclass
class Logical(Expr):
    left: Expr
    op: str  # AND | OR
    right: Expr

    def aliases(self) -> set[str]:
        return self.left.aliases() | self.right.aliases()


def where(ref: str, op: str | CompareOp, value: Any) -> Compare:
    """Standalone predicate constructor for composing AND/OR trees:

    ``where("u.age", ">", 30) & (where("u.name", "=", "x") | ...)``
    """
    return Compare(FieldRef.parse(ref), CompareOp.parse(op), value)


@dataclass(frozen=True)
class Traverse:
    """One MATCH hop: (src_alias)-[edge_alias:EDGE_TYPE]->(tgt_alias:Schema).

    ``<-[...]-`` patterns are normalized at parse time by swapping
    source/target (reference: apps/tundra_shell.cpp:570-577), so direction
    is always source→target here.
    """

    source_alias: str
    edge_type: str
    target_alias: str
    target_schema: str
    traverse_type: TraverseType = TraverseType.INNER
    edge_alias: str | None = None
    # schema of the source alias, needed only when the hop BINDS its source
    # (a reversed pattern like (c:C)<-[:E]-(u:U) traverses u→c with u new;
    # the reference loads the source table on demand, traverse_executor.cpp:61-69)
    source_schema: str | None = None


@dataclass
class AggSpec:
    group_cols: list[str]
    # (fn, field-or-*, out_name, input_cast-or-None)
    aggs: list[tuple[str, str, str, str | None]]


@dataclass
class RankSpec:
    partition_by: list[str]
    order_by: list[tuple[str, bool]]  # (col, ascending)
    alias: str = "rn"
    top: int | None = None
    fn: str = "row_number"


@dataclass
class Query:
    """Immutable-ish query description; execute with ``Database.query``."""

    from_alias: str = ""
    from_schema: str = ""
    clauses: list[Any] = dc_field(default_factory=list)  # Expr | Traverse in order
    select_fields: list[str] = dc_field(default_factory=list)
    agg_spec: AggSpec | None = None
    rank_spec: RankSpec | None = None
    order_by_specs: list[tuple[str, bool]] = dc_field(default_factory=list)
    limit_n: int | None = None
    distinct_flag: bool = False
    # temporal snapshot (reference: include/query/query.hpp:639-673)
    valid_time: int | None = None
    tx_time: int | None = None

    # -- construction ------------------------------------------------------
    @classmethod
    def from_(cls, spec: str) -> "Query":
        """``Query.from_("u:User")`` — FROM alias + schema."""
        alias, _, schema = spec.partition(":")
        if not schema:
            raise QueryError(f"FROM spec must be alias:Schema: {spec!r}")
        return cls(from_alias=alias.strip(), from_schema=schema.strip())

    def where(self, ref_or_expr: str | Expr, op: str | CompareOp = None, value: Any = None) -> "Query":
        if isinstance(ref_or_expr, Expr):
            self.clauses.append(ref_or_expr)
        else:
            self.clauses.append(where(ref_or_expr, op, value))
        return self

    def traverse(
        self,
        source_alias: str,
        edge_type: str,
        target_spec: str,
        traverse_type: str | TraverseType = TraverseType.INNER,
        edge_alias: str | None = None,
    ) -> "Query":
        """``.traverse("u", "FRIEND", "f:User", "inner")``.

        ``edge_type`` may embed an edge alias as ``"e:FRIEND"`` (matches the
        TundraQL ``-[e:FRIEND]->`` form, FIXTURES.md F4). ``source_alias``
        may be ``"u:User"`` when the hop introduces its source alias (the
        reversed-pattern case — the reference loads the source table on
        demand, traverse_executor.cpp:61-69).
        """
        if ":" in edge_type and edge_alias is None:
            edge_alias, _, edge_type = edge_type.partition(":")
            edge_alias = edge_alias.strip() or None
        t_alias, _, t_schema = target_spec.partition(":")
        if not t_schema:
            raise QueryError(f"target spec must be alias:Schema: {target_spec!r}")
        source_alias, _, source_schema = source_alias.partition(":")
        self.clauses.append(
            Traverse(
                source_schema=source_schema.strip() or None,
                source_alias=source_alias.strip(),
                edge_type=edge_type.strip(),
                target_alias=t_alias.strip(),
                target_schema=t_schema.strip(),
                traverse_type=TraverseType.parse(traverse_type),
                edge_alias=edge_alias,
            )
        )
        return self

    def select(self, *fields: str) -> "Query":
        self.select_fields = list(fields)
        return self

    # -- capability extensions (not in the reference language) -------------
    def group_by(self, *cols: str) -> "Query":
        if self.agg_spec is None:
            self.agg_spec = AggSpec(group_cols=list(cols), aggs=[])
        else:
            self.agg_spec.group_cols = list(cols)
        return self

    def agg(
        self,
        fn: str,
        field: str = "*",
        alias: str | None = None,
        cast: str | None = None,
    ) -> "Query":
        """Aggregate ``fn`` over ``field``. ``cast`` coerces the input first —
        e.g. ``cast="decimal(18,2)"`` makes a SUM over monetary doubles exact
        and partition-order independent (important for distributed runs)."""
        if self.agg_spec is None:
            self.agg_spec = AggSpec(group_cols=[], aggs=[])
        out = alias or f"{fn}_{field.replace('.', '_').replace('*', 'all')}"
        self.agg_spec.aggs.append((fn.lower(), field, out, cast))
        return self

    def rank_within(
        self,
        partition_by: list[str],
        order_by: list[str],
        alias: str = "rn",
        top: int | None = None,
        fn: str = "row_number",
    ) -> "Query":
        """Window-rank extension (§2.6 — the reference has no window
        functions). Ranks rows within each partition; ``top=k`` keeps only
        the k best per group (rank-then-filter: the filter runs in the same
        stage as the window, so k rows per group leave the shuffle).
        ``order_by`` entries are ``"col [asc|desc]"`` strings."""
        specs: list[tuple[str, bool]] = []
        for s in order_by:
            parts = s.rsplit(None, 1)
            if len(parts) == 2 and parts[1].lower() in ("asc", "desc"):
                specs.append((parts[0], parts[1].lower() == "asc"))
            else:
                specs.append((s, True))
        self.rank_spec = RankSpec(list(partition_by), specs, alias, top, fn)
        return self

    def order_by(self, *specs: str) -> "Query":
        """``.order_by("u.age desc", "u.name")``"""
        for s in specs:
            parts = s.rsplit(None, 1)
            if len(parts) == 2 and parts[1].lower() in ("asc", "desc"):
                self.order_by_specs.append((parts[0], parts[1].lower() == "asc"))
            else:
                self.order_by_specs.append((s, True))
        return self

    def limit(self, n: int) -> "Query":
        self.limit_n = n
        return self

    def distinct(self) -> "Query":
        self.distinct_flag = True
        return self

    # -- temporal (reference: query.hpp:639-673) ----------------------------
    def as_of_valid_time(self, ts: int) -> "Query":
        self.valid_time = ts
        return self

    def as_of_tx_time(self, ts: int) -> "Query":
        self.tx_time = ts
        return self

    def as_of(self, valid_time: int, tx_time: int) -> "Query":
        self.valid_time, self.tx_time = valid_time, tx_time
        return self

    # -- introspection -------------------------------------------------------
    @property
    def traverses(self) -> list[Traverse]:
        return [c for c in self.clauses if isinstance(c, Traverse)]

    @property
    def wheres(self) -> list[Expr]:
        return [c for c in self.clauses if isinstance(c, Expr)]
