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
    # Reference (format_gamelinux.go:30-44): timestamp must be exactly
    # 'X.X' (no-dot lines are dropped), and the fractional part is
    # passed VERBATIM as nanoseconds to time.Unix — '…. 408856' is
    # 408856 ns ≈ 0.4 ms, not 408856 µs. We truncate ns -> µs (Spark
    # timestamp precision; declared sub-µs deviation).
    tspieces = F.split(F.element_at("p", 1), r"\.")
    df = df.filter(F.size(tspieces) == 2)
    secs = tspieces.getItem(0).try_cast("long")
    nanos = tspieces.getItem(1).try_cast("long")
    ts = F.timestamp_micros(secs * 1000000 + F.floor(nanos / 1000).cast("long"))
    # non-integer count drops the row (strconv.Atoi error -> continue,
    # format_gamelinux.go:47-51); finalize only guards the key fields
    df = df.filter(F.element_at("p", 9).try_cast("long").isNotNull())
    return finalize(
        df,
        count=F.element_at("p", 9).try_cast("long"),
        rdata=strip_trailing_dot(F.element_at("p", 7)),
        rrtype=F.element_at("p", 6),
        rrname=strip_trailing_dot(F.element_at("p", 5)),
        sensor_id=sensor(sensor_id),
        ts_start=ts,
    )
