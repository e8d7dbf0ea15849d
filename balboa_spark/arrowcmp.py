"""Arrow-level type comparison for the oracle gate.

The driver's correctness hash is value-representation-sensitive: a
DuckDB HUGEINT (`sum(int)` → int128, exported via Arrow as
decimal128(38,0)) hashes differently from Spark's LongType even when
the Python values are equal ints.  Round 1 shipped 12 hash failures
invisible to a `str(int)`-based local comparator.  This module gives
the local gate the same sensitivity: compare the *Arrow* schema of the
Spark result and the DuckDB result, canonicalized just enough to
ignore distinctions the driver's value hash cannot see.

Canonical classes:
  - all signed/unsigned ints of width <= 64  -> "int"   (str(v) identical)
  - float32/float64                          -> "float" (formatted alike)
  - decimal(p, s)                            -> kept distinct (HUGEINT!)
  - timestamp (any unit/tz), date            -> "timestamp" / "date"
  - string/large_string, binary/large_binary -> "string" / "binary"
  - list/large_list                          -> "list<inner>"
"""

from __future__ import annotations

import pyarrow as pa


def canon_arrow_type(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_arrow_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{f.name}:{canon_arrow_type(f.type)}" for f in t
        )
        return f"struct<{inner}>"
    return str(t)


def spark_arrow_schema(df) -> dict[str, str]:
    """Column -> canonical type for a Spark DataFrame (via its Arrow
    export; `limit(0)` keeps it plan-only, no data pass)."""
    tbl = df.limit(0).toArrow()
    return {f.name: canon_arrow_type(f.type) for f in tbl.schema}


def duck_arrow_schema(rel) -> dict[str, str]:
    """Column -> canonical type for a DuckDB relation."""
    tbl = rel.limit(0).arrow()
    return {f.name: canon_arrow_type(f.type) for f in tbl.schema}


def type_mismatches(spark_df, duck_rel) -> list[str]:
    """Human-readable list of per-column canonical-type mismatches."""
    s = spark_arrow_schema(spark_df)
    d = duck_arrow_schema(duck_rel)
    out = []
    for name in sorted(set(s) | set(d)):
        st, dt = s.get(name), d.get(name)
        if st != dt:
            out.append(f"{name}: spark={st} oracle={dt}")
    return out
