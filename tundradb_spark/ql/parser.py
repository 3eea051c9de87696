"""TundraQL tokenizer + recursive-descent parser.

Implements the grammar of antlr/TundraQL.g4 (spec, not generated code):
statements end with ``;``, ``//`` comments are skipped, keywords are
case-sensitive upper-case (as in the reference grammar), identifiers are
``[a-zA-Z_][a-zA-Z_0-9]*``.

Extensions over the reference grammar (documented, deliberate):
- boolean literals ``true`` / ``false`` (the reference shell coerces them
  per-schema at apps/tundra_shell.cpp:205-377; we accept them as literals)
- negative numeric literals
- single-quoted strings in addition to double-quoted
- MATCH tail clauses the reference's own clause enum anticipated but never
  grew productions for (include/query/query.hpp:168 lists ORDER_BY/LIMIT):
  ``AS OF <vt> [TX <tt>]`` (bitemporal read), ``SELECT DISTINCT``,
  ``GROUP BY p, ...``, ``AGG fn(p|*) [AS name], ...``,
  ``ORDER BY p [ASC|DESC], ...``,
  ``LIMIT n`` — each maps 1:1 onto the engine's Query builder
  (query.py:246-323), so text and fluent queries share one execution path.
"""

from __future__ import annotations

import re
from typing import Any

from tundradb_spark.errors import QueryError
from tundradb_spark.ql import ast
from tundradb_spark.query import Compare, CompareOp, Expr, FieldRef, Logical

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+|//[^\n]*)
    | (?P<float>-?\d+\.\d+)
    | (?P<int>-?\d+)
    | (?P<string>"(?:[^"\\\r\n]|\\.)*"|'(?:[^'\\\r\n]|\\.)*')
    | (?P<ident>[a-zA-Z_][a-zA-Z_0-9]*)
    | (?P<op><=|>=|!=|<>|<-|->|[()\[\]{};,:=<>.\-*])
    """,
    re.VERBOSE,
)

KEYWORDS = {
    "CREATE", "SCHEMA", "NODE", "EDGE", "FROM", "TO", "WITH", "MATCH",
    "DELETE", "WHERE", "SELECT", "RETURN", "AS", "INNER", "LEFT", "RIGHT",
    "FULL", "AND", "OR", "UPDATE", "SET", "COMMIT", "UNIQUE", "SHOW",
    "EDGES", "TYPES", "EXPLAIN",
    # extension-surface keywords (see module docstring)
    "OF", "TX", "GROUP", "BY", "AGG", "ORDER", "ASC", "DESC", "LIMIT",
    "DISTINCT",
}

TYPE_NAMES = {
    "STRING": "string",
    "INT32": "int",
    "INT64": "long",
    "FLOAT": "float",
    "FLOAT64": "double",
    "BOOL": "boolean",
    "MAP": "map",
}


class Token:
    __slots__ = ("kind", "text", "pos")

    def __init__(self, kind: str, text: str, pos: int):
        self.kind = kind
        self.text = text
        self.pos = pos

    def __repr__(self) -> str:  # pragma: no cover
        return f"Token({self.kind}, {self.text!r})"


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise QueryError(f"TundraQL: bad character {text[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append(Token(kind, m.group(), m.start()))
    out.append(Token("eof", "", len(text)))
    return out


def split_statements(script: str) -> list[str]:
    """Split a script into ``;``-terminated statements, respecting string
    literals and comments (reference executeStatement splits one at a time,
    apps/tundra_shell.cpp:1955-1987)."""
    parts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(script)
    while i < n:
        c = script[i]
        if c in "\"'":
            q = c
            buf.append(c)
            i += 1
            while i < n:
                buf.append(script[i])
                if script[i] == "\\":
                    i += 1
                    if i < n:
                        buf.append(script[i])
                elif script[i] == q:
                    i += 1
                    break
                i += 1
            continue
        if c == "/" and script[i : i + 2] == "//":
            while i < n and script[i] != "\n":
                i += 1
            continue
        if c == ";":
            stmt = "".join(buf).strip()
            if stmt:
                parts.append(stmt + ";")
            buf = []
            i += 1
            continue
        buf.append(c)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail + ";")
    return parts


class Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = tokenize(text)
        self.i = 0

    # ------------------------------------------------------------- helpers
    def peek(self, ahead: int = 0) -> Token:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at(self, text: str) -> bool:
        return self.peek().text == text

    def at_kw(self, kw: str) -> bool:
        t = self.peek()
        return t.kind == "ident" and t.text == kw

    def accept(self, text: str) -> bool:
        if self.at(text):
            self.i += 1
            return True
        return False

    def expect(self, text: str) -> Token:
        t = self.next()
        if t.text != text:
            raise QueryError(
                f"TundraQL: expected {text!r} but got {t.text!r} at {t.pos} "
                f"in: {self.text}"
            )
        return t

    def ident(self) -> str:
        t = self.next()
        if t.kind != "ident":
            raise QueryError(f"TundraQL: expected identifier, got {t.text!r}")
        return t.text

    # ----------------------------------------------------------- literals
    def value(self) -> Any:
        t = self.peek()
        if t.kind == "string":
            self.i += 1
            body = t.text[1:-1]
            return re.sub(r"\\(.)", r"\1", body)
        if t.kind == "float":
            self.i += 1
            return float(t.text)
        if t.kind == "int":
            self.i += 1
            return int(t.text)
        if t.text == "{":
            return self.map_literal()
        if t.kind == "ident" and t.text in ("true", "false"):
            self.i += 1
            return t.text == "true"
        if t.kind == "ident" and t.text in ("null", "NULL"):
            self.i += 1
            return None
        raise QueryError(f"TundraQL: expected literal, got {t.text!r} at {t.pos}")

    def map_literal(self) -> dict[str, Any]:
        self.expect("{")
        out: dict[str, Any] = {}
        if not self.at("}"):
            while True:
                k = self.ident()
                if not self.accept("="):
                    self.expect(":")
                out[k] = self.value()
                if not self.accept(","):
                    break
        self.expect("}")
        return out

    def property_list(self) -> dict[str, Any]:
        out: dict[str, Any] = {}
        while True:
            k = self.ident()
            if not self.accept("="):
                self.expect(":")
            out[k] = self.value()
            if not self.accept(","):
                break
        return out

    # ----------------------------------------------------------- statement
    def parse(self) -> ast.Statement:
        t = self.peek()
        if t.kind != "ident":
            raise QueryError(f"TundraQL: unexpected {t.text!r}")
        kw = t.text
        stmt: ast.Statement
        if kw == "CREATE":
            stmt = self.create_statement()
        elif kw == "MATCH":
            stmt = self.match_statement()
        elif kw == "UPDATE":
            stmt = self.update_statement()
        elif kw == "DELETE":
            stmt = self.delete_statement()
        elif kw == "SHOW":
            stmt = self.show_statement()
        elif kw == "COMMIT":
            self.next()
            stmt = ast.Commit()
        elif kw == "EXPLAIN":
            self.next()
            if not self.at_kw("MATCH"):
                raise QueryError("TundraQL: EXPLAIN expects a MATCH statement")
            stmt = ast.Explain(self.match_statement())
        elif kw == "FUNNEL":
            stmt = self.funnel_statement()
        elif kw == "RETENTION":
            stmt = self.retention_statement()
        elif kw == "OUTLIERS":
            stmt = self.outliers_statement()
        elif kw == "CUSUM":
            stmt = self.cusum_statement()
        elif kw == "NGRAMS":
            stmt = self.ngrams_statement()
        elif kw == "MARKOV":
            stmt = self.markov_statement()
        elif kw == "SIMILARITY":
            stmt = self.similarity_statement()
        elif kw == "COOCCURRENCE":
            stmt = self.cooccurrence_statement()
        elif kw == "WINSORIZE":
            stmt = self.winsorize_statement()
        elif kw == "BENFORD":
            stmt = self.benford_statement()
        elif kw == "CALIBRATION":
            stmt = self.calibration_statement()
        elif kw == "RRF":
            stmt = self.rrf_statement()
        elif kw == "DRIFT":
            stmt = self.drift_statement()
        elif kw == "TOKENDRIFT":
            stmt = self.tokendrift_statement()
        elif kw == "DIFF":
            stmt = self.diff_statement()
        elif kw == "SKEW":
            stmt = self.skew_statement()
        elif kw == "FANOUT":
            stmt = self.fanout_statement()
        elif kw == "TREND":
            stmt = self.trend_statement()
        elif kw == "QUALITY":
            stmt = self.quality_statement()
        elif kw == "GATES":
            stmt = self.gates_statement()
        elif kw == "REPORT":
            stmt = self.report_statement()
        else:
            raise QueryError(f"TundraQL: unknown statement {kw!r}")
        self.accept(";")
        t = self.peek()
        if t.kind != "eof":
            raise QueryError(f"TundraQL: trailing input at {t.pos}: {t.text!r}")
        return stmt

    # ------------------------------------------------------------- CREATE
    def create_statement(self) -> ast.Statement:
        self.expect("CREATE")
        if self.at_kw("SCHEMA"):
            self.next()
            return self._create_schema(is_edge=False)
        if self.at_kw("EDGE") and self.peek(1).text == "SCHEMA":
            self.next()
            self.next()
            return self._create_schema(is_edge=True)
        if self.at_kw("NODE"):
            self.next()
            return self._create_node()
        unique = False
        if self.at_kw("UNIQUE"):
            self.next()
            unique = True
        if self.at_kw("EDGE"):
            self.next()
            return self._create_edge(unique)
        raise QueryError(f"TundraQL: bad CREATE at {self.peek().pos}")

    def _create_schema(self, is_edge: bool) -> ast.CreateSchema:
        name = self.ident()
        self.expect("(")
        fields: dict[str, str] = {}
        while True:
            f = self.ident()
            self.expect(":")
            tname = self.ident()
            if tname not in TYPE_NAMES:
                raise QueryError(
                    f"TundraQL: unknown type {tname!r} (expected one of "
                    f"{sorted(TYPE_NAMES)})"
                )
            fields[f] = TYPE_NAMES[tname]
            if not self.accept(","):
                break
        self.expect(")")
        return ast.CreateSchema(name=name, fields=fields, is_edge=is_edge)

    def _create_node(self) -> ast.CreateNode:
        schema = self.ident()
        self.expect("(")
        props = self.property_list()
        self.expect(")")
        return_id = False
        if self.at_kw("RETURN"):
            self.next()
            if self.next().text != "id":
                raise QueryError("TundraQL: only RETURN id is supported")
            return_id = True
        return ast.CreateNode(schema=schema, props=props, return_id=return_id)

    def node_selector(self) -> ast.Selector:
        """``User(123)`` or ``(User{name="Alice"})``
        (TundraQL.g4:24-30)."""
        if self.accept("("):
            schema = self.ident()
            props = None
            if self.at("{"):
                self.expect("{")
                props = self.property_list()
                self.expect("}")
            self.expect(")")
            if props is None:
                raise QueryError("TundraQL: property selector needs {props}")
            return (schema, props)
        schema = self.ident()
        self.expect("(")
        t = self.next()
        if t.kind != "int":
            raise QueryError(f"TundraQL: selector id must be integer, got {t.text!r}")
        self.expect(")")
        return (schema, int(t.text))

    def _create_edge(self, unique: bool) -> ast.CreateEdge:
        etype = self.ident()
        self.expect("FROM")
        src = self.node_selector()
        self.expect("TO")
        tgt = self.node_selector()
        props: dict[str, Any] = {}
        if self.at_kw("WITH"):
            self.next()
            self.expect("(")
            props = self.property_list()
            self.expect(")")
        return ast.CreateEdge(
            edge_type=etype, source=src, target=tgt, props=props, unique=unique
        )

    # -------------------------------------------------------------- MATCH
    def node_pattern(self) -> ast.NodeRef:
        self.expect("(")
        alias = self.ident()
        schema = None
        if self.accept(":"):
            schema = self.ident()
        self.expect(")")
        return ast.NodeRef(alias=alias, schema=schema)

    def _edge_body(self) -> tuple[str | None, str | None, str]:
        """Inside ``[...]``: ``[:TYPE JOIN]`` / ``[e:TYPE JOIN]`` / ``[]``."""
        self.expect("[")
        edge_alias = None
        edge_type = None
        if self.accept(":"):
            edge_type = self.ident()
        elif self.peek().kind == "ident" and self.peek().text not in (
            "INNER", "LEFT", "RIGHT", "FULL", "SEMI", "ANTI",
        ):
            edge_alias = self.ident()
            self.expect(":")
            edge_type = self.ident()
        join = "inner"
        # SEMI/ANTI are engine extensions beyond the reference grammar
        # (TundraQL.g4:88 has only the four SQL join keywords)
        if self.peek().kind == "ident" and self.peek().text in (
            "INNER", "LEFT", "RIGHT", "FULL", "SEMI", "ANTI",
        ):
            join = self.next().text.lower()
        self.expect("]")
        return edge_alias, edge_type, join

    def path_pattern(self) -> tuple[list[ast.Hop], ast.NodeRef]:
        """One pathPattern; returns (hops, first node)."""
        first = self.node_pattern()
        hops: list[ast.Hop] = []
        cur = first
        while self.at("-") or self.at("<-"):
            if self.accept("<-"):
                edge_alias, edge_type, join = self._edge_body()
                self.expect("-")
                nxt = self.node_pattern()
                # <-[...]- : edge direction nxt -> cur (swap at parse time,
                # apps/tundra_shell.cpp:570-577)
                hops.append(
                    ast.Hop(
                        source=cur,
                        target=nxt,
                        edge_type=edge_type,
                        edge_alias=edge_alias,
                        join_type=join,
                        reversed=True,
                    )
                )
            else:
                self.expect("-")
                edge_alias, edge_type, join = self._edge_body()
                self.expect("->")
                nxt = self.node_pattern()
                hops.append(
                    ast.Hop(
                        source=cur,
                        target=nxt,
                        edge_type=edge_type,
                        edge_alias=edge_alias,
                        join_type=join,
                        reversed=False,
                    )
                )
            cur = nxt
        return hops, first

    def pattern_list(self) -> tuple[list[ast.Hop], list[ast.NodeRef]]:
        hops: list[ast.Hop] = []
        roots: list[ast.NodeRef] = []
        while True:
            h, first = self.path_pattern()
            if h:
                hops.extend(h)
            else:
                roots.append(first)
            if not self.accept(","):
                break
        return hops, roots

    def match_statement(self) -> ast.Match:
        self.expect("MATCH")
        hops, roots = self.pattern_list()
        as_of_vt = as_of_tt = None
        # AS OF <vt> [TX <tt>] — bitemporal read point for every scan in
        # the pattern (engine: Query.as_of_valid_time/as_of_tx_time)
        if self.at_kw("AS") and self.peek(1).text == "OF":
            self.next()
            self.next()
            t = self.next()
            if t.kind != "int":
                raise QueryError(
                    f"TundraQL: AS OF expects an integer timestamp, got {t.text!r}"
                )
            as_of_vt = int(t.text)
            if self.at_kw("TX"):
                self.next()
                t = self.next()
                if t.kind != "int":
                    raise QueryError(
                        f"TundraQL: TX expects an integer timestamp, got {t.text!r}"
                    )
                as_of_tt = int(t.text)
        where = None
        if self.at_kw("WHERE"):
            self.next()
            where = self.expression()
        select: list[tuple[str, str | None]] = []
        distinct = False
        if self.at_kw("SELECT"):
            self.next()
            if self.at_kw("DISTINCT"):
                self.next()
                distinct = True
            while True:
                path = self.dotted_path()
                as_name = None
                if self.at_kw("AS"):
                    self.next()
                    as_name = self.ident()
                select.append((path, as_name))
                if not self.accept(","):
                    break
        group_by: list[str] = []
        if self.at_kw("GROUP"):
            self.next()
            if not self.at_kw("BY"):
                raise QueryError("TundraQL: GROUP must be followed by BY")
            self.next()
            while True:
                group_by.append(self.dotted_path())
                if not self.accept(","):
                    break
        aggs: list[tuple[str, str, str | None]] = []
        if self.at_kw("AGG"):
            self.next()
            while True:
                fn = self.ident()
                self.expect("(")
                if self.accept("*"):
                    fld = "*"
                else:
                    fld = self.dotted_path()
                self.expect(")")
                as_name = None
                if self.at_kw("AS"):
                    self.next()
                    as_name = self.ident()
                aggs.append((fn.lower(), fld, as_name))
                if not self.accept(","):
                    break
        if group_by and not aggs:
            raise QueryError("TundraQL: GROUP BY requires an AGG clause")
        order_by: list[tuple[str, bool]] = []
        if self.at_kw("ORDER"):
            self.next()
            if not self.at_kw("BY"):
                raise QueryError("TundraQL: ORDER must be followed by BY")
            self.next()
            while True:
                path = self.dotted_path()
                asc = True
                if self.at_kw("ASC"):
                    self.next()
                elif self.at_kw("DESC"):
                    self.next()
                    asc = False
                order_by.append((path, asc))
                if not self.accept(","):
                    break
        limit = None
        if self.at_kw("LIMIT"):
            self.next()
            t = self.next()
            if t.kind != "int" or int(t.text) < 0:
                raise QueryError(
                    f"TundraQL: LIMIT expects a non-negative integer, got {t.text!r}"
                )
            limit = int(t.text)
        return ast.Match(
            hops=hops,
            roots=roots,
            where=where,
            select=select,
            distinct=distinct,
            group_by=group_by,
            aggs=aggs,
            order_by=order_by,
            limit=limit,
            as_of_vt=as_of_vt,
            as_of_tt=as_of_tt,
        )

    def dotted_path(self) -> str:
        parts = [self.ident()]
        while self.accept("."):
            parts.append(self.ident())
        return ".".join(parts)

    # -------------------------------------------------- WHERE expressions
    def expression(self) -> Expr:
        return self.or_expression()

    def or_expression(self) -> Expr:
        left = self.and_expression()
        while self.at_kw("OR"):
            self.next()
            right = self.and_expression()
            left = Logical(left=left, op="OR", right=right)
        return left

    def and_expression(self) -> Expr:
        left = self.primary_expression()
        while self.at_kw("AND"):
            self.next()
            right = self.primary_expression()
            left = Logical(left=left, op="AND", right=right)
        return left

    def primary_expression(self) -> Expr:
        # '(' starts a parenthesized expression only if it isn't a literal
        # comparison — the grammar has no '(' in term position, so any '('
        # here is grouping.
        if self.accept("("):
            e = self.expression()
            self.expect(")")
            return e
        return self.term()

    _OPS = {"=": "=", "!=": "!=", "<>": "!=", ">": ">", "<": "<", ">=": ">=", "<=": "<="}

    def term(self) -> Expr:
        left_is_field = self.peek().kind == "ident" and self.peek().text not in (
            "true", "false", "null", "NULL",
        )
        if left_is_field:
            left: Any = self.dotted_path()
        else:
            left = self.value()
        op_t = self.next()
        if op_t.text not in self._OPS:
            raise QueryError(f"TundraQL: expected comparison op, got {op_t.text!r}")
        op = CompareOp.parse(self._OPS[op_t.text])
        right_is_field = self.peek().kind == "ident" and self.peek().text not in (
            "true", "false", "null", "NULL",
        )
        if right_is_field:
            right: Any = self.dotted_path()
        else:
            right = self.value()
        if left_is_field and right_is_field:
            raise QueryError(
                "TundraQL: field-to-field comparison is not supported "
                "(the reference evaluates literals only, src/query/query.cpp:81-201)"
            )
        if not left_is_field and not right_is_field:
            raise QueryError("TundraQL: comparison needs a field reference")
        if left_is_field:
            return Compare(ref=FieldRef.parse(left), op=op, value=right)
        swapped = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}.get(op.value, op.value)
        return Compare(
            ref=FieldRef.parse(right), op=CompareOp.parse(swapped), value=left
        )

    # -------------------------------------------------------------- UPDATE
    def update_statement(self) -> ast.Update:
        self.expect("UPDATE")
        locator = None
        pattern = None
        match = None
        if self.at_kw("MATCH"):
            self.next()
            hops, roots = self.pattern_list()
            match = ast.Match(hops=hops, roots=roots, where=None, select=[])
        elif self.at("("):
            pattern = self.node_pattern()
        else:
            schema = self.ident()
            self.expect("(")
            t = self.next()
            if t.kind != "int":
                raise QueryError("TundraQL: UPDATE locator id must be integer")
            self.expect(")")
            locator = (schema, int(t.text))
        self.expect("SET")
        assignments: dict[str, Any] = {}
        while True:
            path = self.dotted_path()
            self.expect("=")
            assignments[path] = self.value()
            if not self.accept(","):
                break
        where = None
        if self.at_kw("WHERE"):
            self.next()
            where = self.expression()
        return ast.Update(
            locator=locator,
            pattern=pattern,
            match=match,
            assignments=assignments,
            where=where,
        )

    # -------------------------------------------------------------- DELETE
    def delete_statement(self) -> ast.Delete:
        self.expect("DELETE")
        if self.at_kw("EDGE"):
            self.next()
            etype = self.ident()
            efrom = eto = None
            if self.at_kw("FROM"):
                self.next()
                efrom = self.node_selector()
            if self.at_kw("TO"):
                self.next()
                eto = self.node_selector()
            return ast.Delete(edge_type=etype, edge_from=efrom, edge_to=eto)
        if self.at("("):
            hops, roots = self.pattern_list()
            where = None
            if self.at_kw("WHERE"):
                self.next()
                where = self.expression()
            if hops:
                return ast.Delete(
                    path=ast.Match(hops=hops, roots=roots, where=where, select=[]),
                    where=where,
                )
            return ast.Delete(pattern=roots[0], where=where)
        schema = self.ident()
        self.expect("(")
        t = self.next()
        if t.kind != "int":
            raise QueryError("TundraQL: DELETE locator id must be integer")
        self.expect(")")
        return ast.Delete(locator=(schema, int(t.text)))

    # ---------------------------------------------------------------- SHOW
    # -------------------------------------------- FUNNEL / RETENTION
    def _int_clause(self, kw: str) -> int:
        t = self.next()
        if t.kind != "int" or int(t.text) < 0:
            raise QueryError(
                f"TundraQL: {kw} expects a non-negative integer, "
                f"got {t.text!r}"
            )
        return int(t.text)

    def funnel_statement(self) -> ast.Funnel:
        """FUNNEL ON table STEPS 's1', 's2', … [USER col] [TS col]
        [TYPE col] [WITHIN µs]"""
        self.expect("FUNNEL")
        self.expect("ON")
        table = self.ident()
        self.expect("STEPS")
        steps: list[str] = []
        while True:
            t = self.peek()
            if t.kind == "string":
                steps.append(self.value())
            else:
                steps.append(self.ident())
            if not self.accept(","):
                break
        user_col, ts_col, type_col, within = "user_id", "ts", "event_type", None
        while True:
            if self.at_kw("USER"):
                self.next()
                user_col = self.ident()
            elif self.at_kw("TS"):
                self.next()
                ts_col = self.ident()
            elif self.at_kw("TYPE"):
                self.next()
                type_col = self.ident()
            elif self.at_kw("WITHIN"):
                self.next()
                within = self._int_clause("WITHIN")
            else:
                break
        return ast.Funnel(
            table=table,
            steps=tuple(steps),
            user_col=user_col,
            ts_col=ts_col,
            type_col=type_col,
            within_us=within,
        )

    def _num_clause(self, kw: str) -> float:
        t = self.next()
        if t.kind not in ("int", "float"):
            raise QueryError(
                f"TundraQL: {kw} expects a number, got {t.text!r}"
            )
        return float(t.text)

    def outliers_statement(self) -> ast.Outliers:
        """OUTLIERS ON table [GROUP col] [VALUE col] [ID col] [Z x]
        [ROBUST [K x]]"""
        self.expect("OUTLIERS")
        self.expect("ON")
        table = self.ident()
        group_col, value_col, id_col, z = "event_type", "value", "event_id", 3.0
        robust, k = False, 3.5
        while True:
            if self.at_kw("GROUP"):
                self.next()
                group_col = self.ident()
            elif self.at_kw("VALUE"):
                self.next()
                value_col = self.ident()
            elif self.at_kw("ID"):
                self.next()
                id_col = self.ident()
            elif self.at_kw("Z"):
                self.next()
                z = self._num_clause("Z")
            elif self.at_kw("ROBUST"):
                self.next()
                robust = True
            elif self.at_kw("K"):
                self.next()
                k = self._num_clause("K")
            else:
                break
        if not robust and k != 3.5:
            raise QueryError(
                "TundraQL: OUTLIERS K requires the ROBUST modifier "
                "(z-score mode takes Z)"
            )
        return ast.Outliers(
            table=table,
            group_col=group_col,
            value_col=value_col,
            id_col=id_col,
            z=z,
            robust=robust,
            k=k,
        )

    def cooccurrence_statement(self) -> ast.Cooccurrence:
        """COOCCURRENCE ON table [USER col] [TYPE col] [MIN m] [TOP n]
        [CAP c]"""
        self.expect("COOCCURRENCE")
        self.expect("ON")
        table = self.ident()
        user_col, type_col = "user_id", "event_type"
        min_users, top_n, cap = 1, None, None
        while True:
            if self.at_kw("USER"):
                self.next()
                user_col = self.ident()
            elif self.at_kw("TYPE"):
                self.next()
                type_col = self.ident()
            elif self.at_kw("MIN"):
                self.next()
                min_users = self._int_clause("MIN")
            elif self.at_kw("TOP"):
                self.next()
                top_n = self._int_clause("TOP")
            elif self.at_kw("CAP"):
                self.next()
                cap = self._int_clause("CAP")
            else:
                break
        return ast.Cooccurrence(
            table=table,
            user_col=user_col,
            type_col=type_col,
            min_users=min_users,
            top_n=top_n,
            max_types_per_user=cap,
        )

    def winsorize_statement(self) -> ast.Winsorize:
        """WINSORIZE ON table [GROUP col] [VALUE col] [ID col] [PLO x]
        [PHI x]"""
        self.expect("WINSORIZE")
        self.expect("ON")
        table = self.ident()
        group_col, value_col, id_col = "event_type", "value", "event_id"
        p_lo, p_hi = 0.01, 0.99
        while True:
            if self.at_kw("GROUP"):
                self.next()
                group_col = self.ident()
            elif self.at_kw("VALUE"):
                self.next()
                value_col = self.ident()
            elif self.at_kw("ID"):
                self.next()
                id_col = self.ident()
            elif self.at_kw("PLO"):
                self.next()
                p_lo = self._num_clause("PLO")
            elif self.at_kw("PHI"):
                self.next()
                p_hi = self._num_clause("PHI")
            else:
                break
        if not (0.0 <= p_lo <= p_hi <= 1.0):
            raise QueryError(
                "TundraQL: WINSORIZE needs 0 <= PLO <= PHI <= 1"
            )
        return ast.Winsorize(
            table=table,
            group_col=group_col,
            value_col=value_col,
            id_col=id_col,
            p_lo=p_lo,
            p_hi=p_hi,
        )

    def benford_statement(self) -> ast.Benford:
        """BENFORD ON table [GROUP col] [VALUE col] [MIN n]"""
        self.expect("BENFORD")
        self.expect("ON")
        table = self.ident()
        group_col, value_col, min_n = "event_type", "value", 100
        while True:
            if self.at_kw("GROUP"):
                self.next()
                group_col = self.ident()
            elif self.at_kw("VALUE"):
                self.next()
                value_col = self.ident()
            elif self.at_kw("MIN"):
                self.next()
                min_n = self._int_clause("MIN")
            else:
                break
        return ast.Benford(
            table=table,
            group_col=group_col,
            value_col=value_col,
            min_n=min_n,
        )

    def calibration_statement(self) -> ast.Calibration:
        """CALIBRATION ON table [PROB col] [LABEL col] [BINS n]"""
        self.expect("CALIBRATION")
        self.expect("ON")
        table = self.ident()
        prob_col, label_col, n_bins = "prob", "label", 10
        while True:
            if self.at_kw("PROB"):
                self.next()
                prob_col = self.ident()
            elif self.at_kw("LABEL"):
                self.next()
                label_col = self.ident()
            elif self.at_kw("BINS"):
                self.next()
                n_bins = self._int_clause("BINS")
            else:
                break
        if n_bins < 1:
            raise QueryError("TundraQL: CALIBRATION BINS must be >= 1")
        return ast.Calibration(
            table=table,
            prob_col=prob_col,
            label_col=label_col,
            n_bins=n_bins,
        )

    def rrf_statement(self) -> ast.Rrf:
        """RRF ON table_a WITH table_b [K k] [TOP n] [QUERY col] [ID col]
        [SCORE col]"""
        self.expect("RRF")
        self.expect("ON")
        table_a = self.ident()
        self.expect("WITH")
        table_b = self.ident()
        k, top_n = 60, None
        query_col, id_col, score_col = "query_id", "doc_id", "score"
        while True:
            if self.at_kw("K"):
                self.next()
                k = self._int_clause("K")
            elif self.at_kw("TOP"):
                self.next()
                top_n = self._int_clause("TOP")
            elif self.at_kw("QUERY"):
                self.next()
                query_col = self.ident()
            elif self.at_kw("ID"):
                self.next()
                id_col = self.ident()
            elif self.at_kw("SCORE"):
                self.next()
                score_col = self.ident()
            else:
                break
        if k < 1:
            raise QueryError("TundraQL: RRF K must be >= 1")
        if top_n is not None and top_n < 1:
            raise QueryError("TundraQL: RRF TOP must be >= 1")
        return ast.Rrf(
            table_a=table_a,
            table_b=table_b,
            k=k,
            top_n=top_n,
            query_col=query_col,
            id_col=id_col,
            score_col=score_col,
        )

    def drift_statement(self) -> ast.Drift:
        """DRIFT ON cur WITH ref [GROUP col] [VALUE col] [LO x] [HI y]
        [BINS n] [MIN n] [EPS x]"""
        self.expect("DRIFT")
        self.expect("ON")
        cur = self.ident()
        self.expect("WITH")
        ref = self.ident()
        group_col, value_col = "event_type", "value"
        lo, hi, n_bins, min_n, eps = 0.0, 1000.0, 10, 100, 1e-6
        while True:
            if self.at_kw("GROUP"):
                self.next()
                group_col = self.ident()
            elif self.at_kw("VALUE"):
                self.next()
                value_col = self.ident()
            elif self.at_kw("LO"):
                self.next()
                lo = self._num_clause("LO")
            elif self.at_kw("HI"):
                self.next()
                hi = self._num_clause("HI")
            elif self.at_kw("BINS"):
                self.next()
                n_bins = self._int_clause("BINS")
            elif self.at_kw("MIN"):
                self.next()
                min_n = self._int_clause("MIN")
            elif self.at_kw("EPS"):
                self.next()
                eps = self._num_clause("EPS")
            else:
                break
        # range/positivity checks live in the operator (shared with the
        # DataFrame API); fail fast here only on what the grammar owns
        if n_bins < 1:
            raise QueryError("TundraQL: DRIFT BINS must be >= 1")
        if min_n < 1:
            raise QueryError("TundraQL: DRIFT MIN must be >= 1")
        return ast.Drift(
            cur=cur,
            ref=ref,
            group_col=group_col,
            value_col=value_col,
            lo=lo,
            hi=hi,
            n_bins=n_bins,
            min_n=min_n,
            eps=eps,
        )

    def tokendrift_statement(self) -> ast.TokenDrift:
        """TOKENDRIFT ON cur WITH ref [TEXT col]"""
        self.expect("TOKENDRIFT")
        self.expect("ON")
        cur = self.ident()
        self.expect("WITH")
        ref = self.ident()
        text_col = "text"
        if self.at_kw("TEXT"):
            self.next()
            text_col = self.ident()
        return ast.TokenDrift(cur=cur, ref=ref, text_col=text_col)

    def diff_statement(self) -> ast.Diff:
        """DIFF ON new WITH old [ID col] [TEXT col | COLS c1, c2, …]
        [ALL] [SUMMARY]"""
        self.expect("DIFF")
        self.expect("ON")
        new = self.ident()
        self.expect("WITH")
        old = self.ident()
        id_col, text_col = "doc_id", "text"
        cols: list[str] | None = None
        include_unchanged = summary = False
        while True:
            if self.at_kw("ID"):
                self.next()
                id_col = self.ident()
            elif self.at_kw("TEXT"):
                self.next()
                text_col = self.ident()
            elif self.at_kw("COLS"):
                self.next()
                cols = [self.ident()]
                while self.peek().text == ",":
                    self.next()
                    cols.append(self.ident())
            elif self.at_kw("ALL"):
                self.next()
                include_unchanged = True
            elif self.at_kw("SUMMARY"):
                self.next()
                summary = True
            else:
                break
        if cols is not None and summary:
            raise QueryError(
                "TundraQL: DIFF SUMMARY applies to the text-corpus form "
                "only (COLS diffs have no summary operator)"
            )
        return ast.Diff(
            new=new,
            old=old,
            id_col=id_col,
            text_col=text_col,
            cols=tuple(cols) if cols is not None else None,
            include_unchanged=include_unchanged,
            summary=summary,
        )

    def trend_statement(self) -> ast.Trend:
        """TREND ON table EPOCH us [GROUP col] [VALUE col] [TS col]
        [MIN n]"""
        self.expect("TREND")
        self.expect("ON")
        table = self.ident()
        epoch_us = None
        group_col, value_col, ts_col, min_n = (
            "event_type", "value", "ts", 100,
        )
        while True:
            if self.at_kw("EPOCH"):
                self.next()
                epoch_us = self._int_clause("EPOCH")
            elif self.at_kw("GROUP"):
                self.next()
                group_col = self.ident()
            elif self.at_kw("VALUE"):
                self.next()
                value_col = self.ident()
            elif self.at_kw("TS"):
                self.next()
                ts_col = self.ident()
            elif self.at_kw("MIN"):
                self.next()
                min_n = self._int_clause("MIN")
            else:
                break
        if epoch_us is None:
            raise QueryError(
                "TundraQL: TREND requires EPOCH <µs> — the time origin "
                "is a data fact the caller fixes"
            )
        if min_n < 1:
            raise QueryError("TundraQL: TREND MIN must be >= 1")
        return ast.Trend(
            table=table,
            epoch_us=epoch_us,
            group_col=group_col,
            value_col=value_col,
            ts_col=ts_col,
            min_n=min_n,
        )

    def quality_statement(self) -> ast.Quality:
        """QUALITY ON docs WITH weights [BUCKETS n] [ID col] [TEXT col]
        [UNIGRAMS] [THRESHOLDS LABEL col [BINS n]]"""
        self.expect("QUALITY")
        self.expect("ON")
        table = self.ident()
        self.expect("WITH")
        weights = self.ident()
        n_buckets, id_col, text_col, bigrams = 256, "doc_id", "text", True
        label_col: str | None = None
        n_bins, saw_bins = 10, False
        while True:
            if self.at_kw("BUCKETS"):
                self.next()
                n_buckets = self._int_clause("BUCKETS")
            elif self.at_kw("ID"):
                self.next()
                id_col = self.ident()
            elif self.at_kw("TEXT"):
                self.next()
                text_col = self.ident()
            elif self.at_kw("UNIGRAMS"):
                self.next()
                bigrams = False
            elif self.at_kw("THRESHOLDS"):
                self.next()
                self.expect("LABEL")
                label_col = self.ident()
            elif self.at_kw("BINS"):
                self.next()
                n_bins = self._int_clause("BINS")
                saw_bins = True
            else:
                break
        if not 2 <= n_buckets <= 4096:
            raise QueryError(
                "TundraQL: QUALITY BUCKETS must be in [2, 4096] (must"
                " match the weight table's training dimension)"
            )
        if saw_bins and label_col is None:
            raise QueryError(
                "TundraQL: QUALITY BINS only applies to the THRESHOLDS"
                " form (THRESHOLDS LABEL col [BINS n])"
            )
        if not 1 <= n_bins <= 1000:
            raise QueryError(
                "TundraQL: QUALITY BINS must be in [1, 1000]"
            )
        return ast.Quality(
            table=table,
            weights=weights,
            n_buckets=n_buckets,
            id_col=id_col,
            text_col=text_col,
            bigrams=bigrams,
            label_col=label_col,
            n_bins=n_bins,
        )

    def gates_statement(self) -> ast.Gates:
        """GATES ON docs [GROUP col] [TEXT col] [MAXREP x]
        [WITH weights [BUCKETS n] [MIN q] [UNIGRAMS]]"""
        self.expect("GATES")
        self.expect("ON")
        table = self.ident()
        group_col, text_col, max_rep = "lang", "text", 0.5
        weights: str | None = None
        n_buckets, min_quality, bigrams = 256, 0.5, True
        saw_quality_clause = False
        while True:
            if self.at_kw("GROUP"):
                self.next()
                group_col = self.ident()
            elif self.at_kw("TEXT"):
                self.next()
                text_col = self.ident()
            elif self.at_kw("MAXREP"):
                self.next()
                max_rep = self._num_clause("MAXREP")
            elif self.at("WITH"):
                self.next()
                weights = self.ident()
            elif self.at_kw("BUCKETS"):
                self.next()
                n_buckets = self._int_clause("BUCKETS")
                saw_quality_clause = True
            elif self.at_kw("MIN"):
                self.next()
                min_quality = self._num_clause("MIN")
                saw_quality_clause = True
            elif self.at_kw("UNIGRAMS"):
                self.next()
                bigrams = False
                saw_quality_clause = True
            else:
                break
        # presence-tracked, not value-compared: `GATES ON docs MIN 0.5;`
        # (the forgot-WITH mistake typed with a default value) must fail
        # exactly like any other quality knob without a weight table
        if weights is None and saw_quality_clause:
            raise QueryError(
                "TundraQL: GATES BUCKETS/MIN/UNIGRAMS only apply to the"
                " learned-quality gate (WITH weights ...)"
            )
        if not 2 <= n_buckets <= 4096:
            raise QueryError(
                "TundraQL: GATES BUCKETS must be in [2, 4096] (must"
                " match the weight table's training dimension)"
            )
        if not 0.0 <= max_rep <= 1.0:
            raise QueryError("TundraQL: GATES MAXREP must be in [0, 1]")
        return ast.Gates(
            table=table,
            group_col=group_col,
            text_col=text_col,
            max_bigram_rep=max_rep,
            weights=weights,
            n_buckets=n_buckets,
            min_quality=min_quality,
            bigrams=bigrams,
        )

    def report_statement(self) -> ast.Report:
        """REPORT ON docs [GROUP col] [TEXT col] [ID col] [MAXREP x]
        [WITH weights [BUCKETS n] [MIN q] [UNIGRAMS]]
        [LABELED tbl [LABEL col] PRECISION p [BINS n]]
        [SPLIT col PAIRS tbl [SRC col] [DST col]]"""
        self.expect("REPORT")
        self.expect("ON")
        table = self.ident()
        group_col, text_col, id_col = "lang", "text", "doc_id"
        max_rep = 0.5
        weights: str | None = None
        n_buckets, min_quality, bigrams = 256, 0.5, True
        labeled: str | None = None
        label_col, target, cbins = "label", None, 10
        split_col: str | None = None
        pairs: str | None = None
        pair_src, pair_dst = "id_a", "id_b"
        saw_quality_clause = False
        saw_label_clause = False
        saw_pair_cols = False
        while True:
            if self.at_kw("GROUP"):
                self.next()
                group_col = self.ident()
            elif self.at_kw("TEXT"):
                self.next()
                text_col = self.ident()
            elif self.at_kw("ID"):
                self.next()
                id_col = self.ident()
            elif self.at_kw("MAXREP"):
                self.next()
                max_rep = self._num_clause("MAXREP")
            elif self.at("WITH"):
                self.next()
                weights = self.ident()
            elif self.at_kw("BUCKETS"):
                self.next()
                n_buckets = self._int_clause("BUCKETS")
                saw_quality_clause = True
            elif self.at_kw("MIN"):
                self.next()
                min_quality = self._num_clause("MIN")
                saw_quality_clause = True
            elif self.at_kw("UNIGRAMS"):
                self.next()
                bigrams = False
                saw_quality_clause = True
            elif self.at_kw("LABELED"):
                self.next()
                labeled = self.ident()
            elif self.at_kw("LABEL"):
                self.next()
                label_col = self.ident()
                saw_label_clause = True
            elif self.at_kw("PRECISION"):
                self.next()
                target = self._num_clause("PRECISION")
            elif self.at_kw("BINS"):
                self.next()
                cbins = self._int_clause("BINS")
                saw_label_clause = True
            elif self.at_kw("SPLIT"):
                self.next()
                split_col = self.ident()
            elif self.at_kw("PAIRS"):
                self.next()
                pairs = self.ident()
            elif self.at_kw("SRC"):
                self.next()
                pair_src = self.ident()
                saw_pair_cols = True
            elif self.at_kw("DST"):
                self.next()
                pair_dst = self.ident()
                saw_pair_cols = True
            else:
                break
        # the same presence contracts the operator enforces, surfaced at
        # PARSE time so a typo dies before any table is read
        if weights is None and saw_quality_clause:
            raise QueryError(
                "TundraQL: REPORT BUCKETS/MIN/UNIGRAMS only apply to the"
                " learned-quality gate (WITH weights ...)"
            )
        if labeled is not None and weights is None:
            raise QueryError(
                "TundraQL: REPORT LABELED needs the weight table"
                " (WITH weights ...) the threshold is measured for"
            )
        if (labeled is None) != (target is None):
            raise QueryError(
                "TundraQL: REPORT LABELED and PRECISION go together"
                " (a labeled table without a target, or vice versa,"
                " would silently fall back to the hand-set MIN)"
            )
        if labeled is None and saw_label_clause:
            raise QueryError(
                "TundraQL: REPORT LABEL/BINS only apply to the measured"
                " threshold (LABELED tbl ... PRECISION p)"
            )
        if pairs is None and saw_pair_cols:
            raise QueryError(
                "TundraQL: REPORT SRC/DST only apply to the duplicate-"
                "pair table (PAIRS tbl)"
            )
        if (split_col is None) != (pairs is None):
            raise QueryError(
                "TundraQL: REPORT SPLIT and PAIRS go together (the"
                " leakage section needs both the assignment column and"
                " the duplicate-pair table)"
            )
        if not 2 <= n_buckets <= 4096:
            raise QueryError(
                "TundraQL: REPORT BUCKETS must be in [2, 4096] (must"
                " match the weight table's training dimension)"
            )
        if not 0.0 <= max_rep <= 1.0:
            raise QueryError("TundraQL: REPORT MAXREP must be in [0, 1]")
        if target is not None and not 0.0 < target <= 1.0:
            raise QueryError(
                "TundraQL: REPORT PRECISION must be in (0, 1]"
            )
        if not 1 <= cbins <= 100000:
            raise QueryError("TundraQL: REPORT BINS must be in [1, 1e5]")
        return ast.Report(
            table=table,
            group_col=group_col,
            text_col=text_col,
            id_col=id_col,
            max_bigram_rep=max_rep,
            weights=weights,
            n_buckets=n_buckets,
            min_quality=min_quality,
            bigrams=bigrams,
            labeled=labeled,
            label_col=label_col,
            target_precision=target,
            calibration_bins=cbins,
            split_col=split_col,
            pairs=pairs,
            pair_src=pair_src,
            pair_dst=pair_dst,
        )

    def skew_statement(self) -> ast.Skew:
        """SKEW ON table KEY col [TOP n]"""
        self.expect("SKEW")
        self.expect("ON")
        table = self.ident()
        self.expect("KEY")
        key_col = self.ident()
        top_n = 20
        if self.at_kw("TOP"):
            self.next()
            top_n = self._int_clause("TOP")
        if top_n < 1:
            raise QueryError("TundraQL: SKEW TOP must be >= 1")
        return ast.Skew(table=table, key_col=key_col, top_n=top_n)

    def fanout_statement(self) -> ast.Fanout:
        """FANOUT ON table_a WITH table_b KEY col [KEYB col] [TOP n]"""
        self.expect("FANOUT")
        self.expect("ON")
        table_a = self.ident()
        self.expect("WITH")
        table_b = self.ident()
        self.expect("KEY")
        key_a = self.ident()
        key_b, top_n = None, 10
        while True:
            if self.at_kw("KEYB"):
                self.next()
                key_b = self.ident()
            elif self.at_kw("TOP"):
                self.next()
                top_n = self._int_clause("TOP")
            else:
                break
        if top_n < 1:
            raise QueryError("TundraQL: FANOUT TOP must be >= 1")
        return ast.Fanout(
            table_a=table_a,
            table_b=table_b,
            key_a=key_a,
            key_b=key_b,
            top_n=top_n,
        )

    def cusum_statement(self) -> ast.Cusum:
        """CUSUM ON table SLACK x THRESHOLD y [KEY col] [VALUE col]
        [TS col] [TIEBREAK col]"""
        self.expect("CUSUM")
        self.expect("ON")
        table = self.ident()
        slack = threshold = None
        key_col, value_col, ts_col, tiebreak = "user_id", "value", "ts", None
        while True:
            if self.at_kw("SLACK"):
                self.next()
                slack = self._num_clause("SLACK")
            elif self.at_kw("THRESHOLD"):
                self.next()
                threshold = self._num_clause("THRESHOLD")
            elif self.at_kw("KEY"):
                self.next()
                key_col = self.ident()
            elif self.at_kw("VALUE"):
                self.next()
                value_col = self.ident()
            elif self.at_kw("TS"):
                self.next()
                ts_col = self.ident()
            elif self.at_kw("TIEBREAK"):
                self.next()
                tiebreak = self.ident()
            else:
                break
        if slack is None or threshold is None:
            raise QueryError(
                "TundraQL: CUSUM requires SLACK and THRESHOLD clauses"
            )
        return ast.Cusum(
            table=table,
            slack=slack,
            threshold=threshold,
            key_col=key_col,
            value_col=value_col,
            ts_col=ts_col,
            tiebreak_col=tiebreak,
        )

    def ngrams_statement(self) -> ast.Ngrams:
        """NGRAMS ON table [N k] [USER col] [TS col] [TYPE col] [MIN m]
        [TOP n] [TIEBREAK col]"""
        self.expect("NGRAMS")
        self.expect("ON")
        table = self.ident()
        n, min_count, top_n = 3, 1, None
        user_col, ts_col, type_col, tiebreak = (
            "user_id", "ts", "event_type", None,
        )
        while True:
            if self.at_kw("N"):
                self.next()
                n = self._int_clause("N")
            elif self.at_kw("USER"):
                self.next()
                user_col = self.ident()
            elif self.at_kw("TS"):
                self.next()
                ts_col = self.ident()
            elif self.at_kw("TYPE"):
                self.next()
                type_col = self.ident()
            elif self.at_kw("MIN"):
                self.next()
                min_count = self._int_clause("MIN")
            elif self.at_kw("TOP"):
                self.next()
                top_n = self._int_clause("TOP")
            elif self.at_kw("TIEBREAK"):
                self.next()
                tiebreak = self.ident()
            else:
                break
        return ast.Ngrams(
            table=table,
            n=n,
            user_col=user_col,
            ts_col=ts_col,
            type_col=type_col,
            min_count=min_count,
            top_n=top_n,
            tiebreak_col=tiebreak,
        )

    def markov_statement(self) -> ast.Markov:
        """MARKOV ON table [USER col] [TS col] [TYPE col] [TIEBREAK col]
        [MIN m]"""
        self.expect("MARKOV")
        self.expect("ON")
        table = self.ident()
        user_col, ts_col, type_col = "user_id", "ts", "event_type"
        tiebreak, min_count = "event_id", 1
        while True:
            if self.at_kw("USER"):
                self.next()
                user_col = self.ident()
            elif self.at_kw("TS"):
                self.next()
                ts_col = self.ident()
            elif self.at_kw("TYPE"):
                self.next()
                type_col = self.ident()
            elif self.at_kw("TIEBREAK"):
                self.next()
                tiebreak = self.ident()
            elif self.at_kw("MIN"):
                self.next()
                min_count = self._int_clause("MIN")
            else:
                break
        return ast.Markov(
            table=table,
            user_col=user_col,
            ts_col=ts_col,
            type_col=type_col,
            tiebreak_col=tiebreak,
            min_count=min_count,
        )

    def similarity_statement(self) -> ast.Similarity:
        """SIMILARITY ON [EDGES] name [SRC col] [DST col] [MIN m]
        [MAXDEG d] [EXCLUDE ADJACENT]"""
        self.expect("SIMILARITY")
        self.expect("ON")
        edges = False
        if self.at_kw("EDGES"):
            self.next()
            edges = True
        table = self.ident()
        src = dst = None
        min_common, max_degree, include_adjacent = 1, None, True
        while True:
            if self.at_kw("SRC"):
                self.next()
                src = self.ident()
            elif self.at_kw("DST"):
                self.next()
                dst = self.ident()
            elif self.at_kw("MIN"):
                self.next()
                min_common = self._int_clause("MIN")
                if min_common < 1:
                    raise QueryError(
                        "TundraQL: SIMILARITY MIN must be >= 1"
                    )
            elif self.at_kw("MAXDEG"):
                self.next()
                max_degree = self._int_clause("MAXDEG")
            elif self.at_kw("EXCLUDE"):
                self.next()
                self.expect("ADJACENT")
                include_adjacent = False
            else:
                break
        return ast.Similarity(
            table=table,
            edges=edges,
            src=src,
            dst=dst,
            min_common=min_common,
            max_degree=max_degree,
            include_adjacent=include_adjacent,
        )

    def retention_statement(self) -> ast.Retention:
        """RETENTION ON table [USER col] [TS col] [PERIOD µs]
        [MAX OFFSET n]"""
        self.expect("RETENTION")
        self.expect("ON")
        table = self.ident()
        user_col, ts_col = "user_id", "ts"
        period_us, max_offset = 86_400_000_000, None
        while True:
            if self.at_kw("USER"):
                self.next()
                user_col = self.ident()
            elif self.at_kw("TS"):
                self.next()
                ts_col = self.ident()
            elif self.at_kw("PERIOD"):
                self.next()
                period_us = self._int_clause("PERIOD")
                if period_us < 1:
                    raise QueryError(
                        "TundraQL: PERIOD expects a positive integer"
                    )
            elif self.at_kw("MAX"):
                self.next()
                if not self.at_kw("OFFSET"):
                    raise QueryError(
                        "TundraQL: MAX must be followed by OFFSET"
                    )
                self.next()
                max_offset = self._int_clause("MAX OFFSET")
            else:
                break
        return ast.Retention(
            table=table,
            user_col=user_col,
            ts_col=ts_col,
            period_us=period_us,
            max_offset=max_offset,
        )

    def show_statement(self) -> ast.Show:
        self.expect("SHOW")
        if self.at_kw("EDGES"):
            self.next()
            return ast.Show(target="edges", edge_type=self.ident())
        if self.at_kw("EDGE"):
            self.next()
            if self.at_kw("TYPES"):
                self.next()
                return ast.Show(target="edge_types")
        raise QueryError("TundraQL: SHOW expects 'EDGES <type>' or 'EDGE TYPES'")


def parse_statement(text: str) -> ast.Statement:
    return Parser(text).parse()
