"""Dtype normalization between Arrow types and the reference's string-based
type selection.

The reference selects columns by the *string representation* of the backend
dtype (reference: selector.py:251-263, ingredients.py:180-195) — e.g.
``has_type(["Float64"])`` with polars spelling, ``["float64"]`` with pandas
spelling. This engine's schema is Arrow (``ray.data.Dataset.schema()``), so we
map every Arrow type to the set of aliases a user might ask for (polars
spelling, pandas spelling, arrow spelling) and match case-insensitively.
"""

from __future__ import annotations

import pyarrow as pa

# Numeric whitelist mirroring all_numeric_predictors (reference
# selector.py:284-287): signed ints + float32/64. Unsigned ints and float16
# are deliberately excluded to match the reference.
_NUMERIC_WHITELIST = {
    pa.int8(),
    pa.int16(),
    pa.int32(),
    pa.int64(),
    pa.float32(),
    pa.float64(),
}


def is_numeric_predictor_type(t: pa.DataType) -> bool:
    return t in _NUMERIC_WHITELIST


def is_temporal(t: pa.DataType) -> bool:
    return (
        pa.types.is_timestamp(t)
        or pa.types.is_duration(t)
        or pa.types.is_date(t)
        or pa.types.is_time(t)
    )


def type_aliases(t: pa.DataType) -> set[str]:
    """All lower-cased string aliases for an Arrow type."""
    names: set[str] = {str(t)}
    if pa.types.is_integer(t):
        # "int64" (pandas/arrow) and "Int64" (polars) lower-case to the same
        names.add(str(t))
    if t == pa.float64():
        names.update({"float64", "double"})
    if t == pa.float32():
        names.update({"float32", "float"})
    if t == pa.float16():
        names.update({"float16", "halffloat"})
    if pa.types.is_boolean(t):
        names.update({"bool", "boolean"})
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        names.update({"string", "utf8", "str", "large_string", "object"})
    if pa.types.is_dictionary(t):
        names.update({"categorical", "category", "dictionary"})
    if pa.types.is_timestamp(t):
        names.update({"datetime", "datetime64", f"datetime64[{t.unit}]", "timestamp"})
    if pa.types.is_duration(t):
        names.update({"duration", "timedelta", "timedelta64", f"timedelta64[{t.unit}]"})
    if pa.types.is_date(t):
        names.add("date")
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        names.update({"binary", "large_binary", "bytes"})
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        names.update({"list", "large_list"})
    return {n.lower() for n in names}


def matches_type(t: pa.DataType, wanted: list[str]) -> bool:
    aliases = type_aliases(t)
    return any(w.lower() in aliases for w in wanted)
