"""Schema-on-read over semi-structured (JSON string) columns.

Event pipelines carry a free-form properties blob next to the typed
columns (the ``events.props`` column here; the reference's inputs are
all JSON-on-the-wire too — Suricata EVE, FEVER, Packetbeat at
format_*.go — but there the schema is known ahead of time and baked
into the decoder). These operators cover the OTHER case: the schema
is discovered from the data, then extraction is declared per-query.

Scale design:

- :func:`extract_json` is a pure projection (``get_json_object`` +
  cast, all JVM-side) — zero shuffle, survives whole-stage codegen,
  and Parquet still prunes the untouched columns because the JSON
  parse only touches its own column.
- :func:`json_key_profile` is ONE corpus pass: parse each blob once
  as ``map<string,string>``, explode the keys, and aggregate on
  (key, type) — output cardinality is the schema size (tiny at any
  corpus scale), with map-side partial aggregation doing almost all
  the work. Corrupt blobs surface as a counted ``_corrupt`` row, not
  an error, matching the skip-don't-crash contract of the ingest
  decoders (format_suricata.go's per-line error path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: classification regexes for scalar JSON value strings; order matters
#: (int is a subset of float syntax)
_INT_RE = r"^-?\d+$"
_FLOAT_RE = r"^-?\d+\.\d+([eE][+-]?\d+)?$|^-?\d+[eE][+-]?\d+$"


def json_field(json_col: Column, path: str, dtype: str = "string") -> Column:
    """Typed extraction of one ``$.path`` from a JSON string column —
    a pure column expression. Missing key, corrupt JSON, AND
    type-mismatched values all yield NULL: under Spark 4's default
    ANSI mode a plain cast of '1.5' to int would kill the whole job,
    so this must be try_cast — the same untrusted-string rule the
    ingest decoders follow."""
    return F.get_json_object(json_col, f"$.{path}").try_cast(dtype)


def extract_json(
    df: DataFrame, json_col: str, fields: dict[str, tuple[str, str]]
) -> DataFrame:
    """Project typed columns out of a JSON string column.

    ``fields`` maps output column name -> (json path, spark type),
    e.g. ``{"k": ("k", "int"), "tag": ("meta.tag", "string")}``.
    The JSON column itself is dropped from the result."""
    cols = [c for c in df.columns if c != json_col]
    return df.select(
        *cols,
        *[
            json_field(F.col(json_col), path, dtype).alias(name)
            for name, (path, dtype) in fields.items()
        ],
    )


def _classify(value: Column) -> Column:
    """Scalar type label for a JSON value rendered to string by the
    map<string,string> parse (objects/arrays render as JSON text)."""
    return (
        F.when(value.isNull(), F.lit("null"))
        .when(value.rlike(_INT_RE), F.lit("int"))
        .when(value.rlike(_FLOAT_RE), F.lit("float"))
        .when(value.isin("true", "false"), F.lit("bool"))
        .when(value.startswith("{"), F.lit("object"))
        .when(value.startswith("["), F.lit("array"))
        .otherwise(F.lit("string"))
    )


def json_key_profile(df: DataFrame, json_col: str) -> DataFrame:
    """Schema-on-read discovery: (key, type, n) over every blob —
    which keys exist, what types they carry, and how consistently.
    Rows that fail to parse as a JSON object are counted under the
    reserved key ``_corrupt`` (type ``corrupt``) instead of erroring."""
    parsed = df.select(
        F.from_json(F.col(json_col), "map<string,string>").alias("m"),
        F.col(json_col).alias("raw"),
    )
    keyed = parsed.select(
        F.when(
            F.col("m").isNull() & F.col("raw").isNotNull(),
            F.array(F.struct(F.lit("_corrupt").alias("key"), F.lit("corrupt").alias("type"))),
        )
        .otherwise(
            F.transform(
                F.map_entries(F.coalesce(F.col("m"), F.expr("map()"))),
                lambda e: F.struct(
                    e["key"].alias("key"), _classify(e["value"]).alias("type")
                ),
            )
        )
        .alias("kt")
    )
    return (
        keyed.select(F.explode("kt").alias("e"))
        .groupBy(F.col("e.key").alias("key"), F.col("e.type").alias("type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
