"""Scalar function surface (SURVEY.md §2.9).

The reference exposes exactly four scalar capabilities (everything else —
math/date/JSON — is absent): string predicates CONTAINS/STARTS_WITH/
ENDS_WITH (include/query/query.hpp:74-84, eval src/query/query.cpp:181-199),
array append (include/common/types.hpp:129-133), map key access
(FieldRef::nested_path, include/query/query.hpp:107-161), and literal
parsing/coercion in the shell (apps/tundra_shell.cpp:205-377). This module
is their engine-level home; the MATCH compiler and DML paths build on it.

Parity notes:
- ``null_safe_eq``: the reference's ``Eq`` treats ``NULL = NULL`` as true
  (src/query/query.cpp:84-96) — NOT SQL three-valued logic — hence ``<=>``.
- string predicates are implemented correctly; the reference's vectorized
  path silently degrades them to equality (src/query/query.cpp:635-649), a
  bug SURVEY.md says not to replicate.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, functions as F

# -- string predicates (SF1) -------------------------------------------------


def contains(col: Column, needle: str) -> Column:
    return col.contains(needle)


def starts_with(col: Column, prefix: str) -> Column:
    return col.startswith(prefix)


def ends_with(col: Column, suffix: str) -> Column:
    return col.endswith(suffix)


# -- null-safe comparison (F3 parity) ----------------------------------------


def null_safe_eq(col: Column, value: Any) -> Column:
    """``NULL = NULL → true`` (reference semantics, not SQL 3VL)."""
    return col.eqNullSafe(value if isinstance(value, Column) else F.lit(value))


def null_safe_ne(col: Column, value: Any) -> Column:
    return ~null_safe_eq(col, value)


# -- array append (SF2) ------------------------------------------------------


def array_append_value(col: Column, value: Any) -> Column:
    """``UPDATE ... APPEND`` single-element semantics
    (include/core/update_type.hpp:13-16): appending to a NULL array starts a
    fresh one, as the reference's Value-level concat does."""
    arr = F.coalesce(col, F.array())
    return F.concat(arr, F.array(F.lit(value)))


def array_append_all(col: Column, values: list[Any]) -> Column:
    arr = F.coalesce(col, F.array())
    return F.concat(arr, F.array(*[F.lit(v) for v in values]))


# -- map key access (SF3) ----------------------------------------------------


def map_get(col: Column, *path: str) -> Column:
    """Nested path read ``u.props.role`` → ``element_at`` chain. One level in
    the reference (map<string, value>); chaining supports nested maps."""
    for key in path:
        col = F.element_at(col, key)
    return col


def cast_for_literal(col: Column, value: Any) -> Column:
    """Typed access over mixed-type maps (reference P2 dominant-type
    inference, src/query/execution.cpp:32-207): heterogeneous map values
    load as the string fallback type ``map<string,string>``; when such a
    value meets a typed literal in a predicate, cast the value to the
    literal's type so the comparison is numeric/boolean, not lexicographic.
    A value that does not parse becomes NULL (``try_cast`` — ANSI-mode
    ``cast`` would throw on the first malformed value) — the same per-value
    coercion failure behavior as the reference. No-op when the map is
    already typed (bigint→bigint)."""
    if isinstance(value, bool):
        return col.try_cast("boolean")
    if isinstance(value, int):
        return col.try_cast("bigint")
    if isinstance(value, float):
        return col.try_cast("double")
    return col


# -- literal coercion (SF4) --------------------------------------------------

_TRUE = {"true", "t", "yes", "1"}
_FALSE = {"false", "f", "no", "0"}


def coerce_literal(text: str, target_type: str) -> Any:
    """Python-side literal coercion mirroring the shell's parseValueForField
    (apps/tundra_shell.cpp:205-377): strip quotes, parse numerics/bools by
    the field's declared type. Used by the TundraQL front end."""
    t = target_type.lower()
    s = text.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        s = s[1:-1]
    if s.upper() == "NULL":
        return None
    if t in ("long", "bigint", "int64", "int", "integer", "int32"):
        return int(float(s)) if "." in s else int(s)
    if t in ("double", "float64", "float"):
        return float(s)
    if t in ("boolean", "bool"):
        low = s.lower()
        if low in _TRUE:
            return True
        if low in _FALSE:
            return False
        raise ValueError(f"cannot coerce {text!r} to boolean")
    return s


# -- VARIANT property maps (dense_union parity) ------------------------------


def is_variant(dtype) -> bool:
    """True for Spark 4's VARIANT type — the engine's native realization
    of the reference's ``map<utf8, dense_union>`` property maps
    (include/arrow/utils.hpp:127-137): per-KEY AND per-ROW runtime types
    are preserved (the same key may hold a long in one row and a string
    in the next), where the ``map<string,string>`` fallback collapses
    everything to the dominant type at load."""
    from pyspark.sql import types as T

    return isinstance(dtype, T.VariantType)


_VARIANT_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _variant_path(path: tuple) -> str:
    """Variant JSON path for a key tuple.  Identifier-shaped keys use dot
    syntax; anything else (dots, spaces, brackets, ``$``…) is emitted as
    a quoted bracket segment — a bare ``'$.' + key`` would silently
    return NULL for every row on such keys instead of accessing them."""
    from tundradb_spark.errors import QueryError

    parts = ["$"]
    for seg in path:
        if _VARIANT_IDENT.match(seg):
            parts.append(f".{seg}")
        elif '"' not in seg:
            parts.append(f'["{seg}"]')
        elif "'" not in seg:
            parts.append(f"['{seg}']")
        else:
            raise QueryError(
                f"unsupported property key {seg!r}: contains both quote "
                "characters, which the variant path syntax cannot escape"
            )
    return "".join(parts)


def variant_get_for_literal(col: Column, path: tuple, value: Any) -> Column:
    """Typed per-key access over a VARIANT property map, the type chosen
    by the comparison literal (the dominant-type-inference contract of
    :func:`cast_for_literal`, but per VALUE instead of per column): a
    value whose runtime type cannot coerce to the literal's type becomes
    NULL (``try_variant_get``) — exactly the reference's per-value
    coercion failure behavior over dense_union."""
    if isinstance(value, bool):
        t = "boolean"
    elif isinstance(value, int):
        t = "bigint"
    elif isinstance(value, float):
        t = "double"
    else:
        t = "string"
    return F.try_variant_get(col, _variant_path(path), t)


def variant_get_string(col: Column, path: tuple) -> Column:
    """SELECT-side access over a VARIANT map: the string realization —
    the one representation every runtime type coerces into, mirroring
    the mixed-type→string fallback the map<string,string> path uses
    (SURVEY §7's sanctioned behavior, now without losing WHERE-side
    types)."""
    return F.try_variant_get(col, _variant_path(path), "string")
