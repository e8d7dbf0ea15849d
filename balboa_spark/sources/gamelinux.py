"""P5: gamelinux/PassiveDNS tabular normalizer.

Reference semantics (format/format_gamelinux.go:19-74): lines of exactly
9 ``||``-separated columns
``ts.nsec || client || server || class || rrname || rrtype || rdata || ttl || count``;
rows with a different column count are dropped; trailing dots stripped
from rrname/rdata; epoch(.frac) timestamp; count from column 9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from balboa_spark.functions.strings import strip_trailing_dot
from balboa_spark.sources.common import finalize, sensor


def normalize(raw: DataFrame, sensor_id=None, value_col: str = "value") -> DataFrame:
    """raw: one STRING column (default name 'value', as from
    spark.read.text) holding a gamelinux line."""
    parts = F.split(F.col(value_col), r"\|\|")
    df = raw.select(parts.alias("p")).filter(F.size("p") == 9)
    # exact epoch.frac parse: integer seconds + zero-padded micros
    # (a double round-trip would round the microsecond digits)
    tscol = F.element_at("p", 1)
    secs = F.split(tscol, r"\.").getItem(0).try_cast("long")
    frac = F.coalesce(F.split(tscol, r"\.").getItem(1), F.lit("0"))
    micros = F.substring(F.rpad(frac, 6, "0"), 1, 6).try_cast("long")
    ts = F.timestamp_micros(secs * 1000000 + micros)
    return finalize(
        df,
        count=F.element_at("p", 9).try_cast("long"),
        rdata=strip_trailing_dot(F.element_at("p", 7)),
        rrtype=F.element_at("p", 6),
        rrname=strip_trailing_dot(F.element_at("p", 5)),
        sensor_id=sensor(sensor_id),
        ts_start=ts,
    )
