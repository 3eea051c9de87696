from tundradb_spark.functions.scalar import (
    array_append_all,
    array_append_value,
    coerce_literal,
    contains,
    ends_with,
    map_get,
    null_safe_eq,
    null_safe_ne,
    starts_with,
)

__all__ = [
    "array_append_all",
    "array_append_value",
    "coerce_literal",
    "contains",
    "ends_with",
    "map_get",
    "null_safe_eq",
    "null_safe_ne",
    "starts_with",
]
