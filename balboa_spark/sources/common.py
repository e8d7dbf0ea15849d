"""Shared helpers for source normalizers.

Every normalizer is a pure ``DataFrame -> DataFrame`` function emitting
the INPUT_OBSERVATION shape (schemas.py) — the Spark restatement of the
reference's ``MakeObservationFunc`` flatMap contract (format/format.go:11).
Unparseable / filtered records emit 0 rows (the reference logs-and-skips;
declarative filters do the same without the log).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INPUT_COLS = (
    "count",
    "rcode",
    "rdata",
    "rrtype",
    "rrname",
    "sensor_id",
    "ts_start",
    "ts_end",
    "tags",
)


def finalize(
    df: DataFrame,
    *,
    count: Column | None = None,
    rcode: Column | None = None,
    rdata: Column,
    rrtype: Column,
    rrname: Column,
    sensor_id: Column,
    ts_start: Column,
    ts_end: Column | None = None,
) -> DataFrame:
    """Project to the canonical input-observation columns; drop rows
    missing any required field (parsers skip malformed records)."""
    out = df.select(
        (count if count is not None else F.lit(1)).cast("long").alias("count"),
        (rcode if rcode is not None else F.lit(None).cast("string")).alias("rcode"),
        rdata.cast("string").alias("rdata"),
        rrtype.cast("string").alias("rrtype"),
        rrname.cast("string").alias("rrname"),
        sensor_id.cast("string").alias("sensor_id"),
        ts_start.alias("ts_start"),
        (ts_end if ts_end is not None else ts_start).alias("ts_end"),
        F.array().cast("array<string>").alias("tags"),
    )
    return out.filter(
        F.col("rdata").isNotNull()
        & F.col("rrname").isNotNull()
        & F.col("rrtype").isNotNull()
        & F.col("ts_start").isNotNull()
    )


#: Sensor id used when the transport provides none (feeder_socket.go:57).
UNKNOWN_SENSOR = "[unknown]"


def sensor(col_or_none) -> Column:
    if col_or_none is None:
        return F.lit(UNKNOWN_SENSOR)
    if isinstance(col_or_none, str):
        return F.lit(col_or_none)
    return col_or_none
