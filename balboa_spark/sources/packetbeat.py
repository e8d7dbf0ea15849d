"""P4: Packetbeat DNS normalizer.

Reference semantics (format/format_packetbeat.go:33-71): keep
``type == "dns"``; one row per ``dns.answers[]`` element; trailing dots
stripped from name/data (:56-57); timestamp layout
``2006-01-02T15:04:05.999Z07`` (millisecond precision, 'Z' or offset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from balboa_spark.functions.strings import normalize_ts_fraction, strip_trailing_dot
from balboa_spark.sources.common import finalize, sensor

#: Go layout Z07 accepts 'Z' or an hour offset; X covers both. The
#: fraction (.999 = any length in Go) is normalized to 6 digits.
TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSX"


def normalize(raw: DataFrame, sensor_id=None) -> DataFrame:
    ex = raw.filter(F.col("type") == "dns").select(
        F.try_to_timestamp(
            normalize_ts_fraction(F.col("`@timestamp`")), F.lit(TS_FMT)
        ).alias("_ts"),
        F.explode("dns.answers").alias("a"),
    )
    return finalize(
        ex,
        rdata=strip_trailing_dot(F.col("a.data")),
        rrtype=F.col("a.type"),
        rrname=strip_trailing_dot(F.col("a.name")),
        sensor_id=sensor(sensor_id),
        ts_start=F.col("_ts"),
    )
