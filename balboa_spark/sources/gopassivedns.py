"""P3: gopassivedns normalizer.

Reference semantics (format/format_gopassivedns.go:40-66): one JSON
record -> one row; q->rrname, a->rdata, atype->rrtype; timestamp layout
``2006-01-02 15:04:05.999999 -0700 MST`` (numeric offset + textual zone;
we parse the offset and drop the redundant zone name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from balboa_spark.functions.strings import normalize_ts_fraction
from balboa_spark.sources.common import finalize, sensor

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS xx"


def normalize(raw: DataFrame, sensor_id=None) -> DataFrame:
    # Go's parse accepts 0..n fraction digits (format_gopassivedns.go:47)
    ts = F.try_to_timestamp(
        normalize_ts_fraction(
            F.regexp_replace(F.col("tstamp"), r" [A-Z]{2,5}$", "")
        ),
        F.lit(TS_FMT),
    )
    return finalize(
        raw,
        rdata=F.col("a"),
        rrtype=F.col("atype"),
        rrname=F.col("q"),
        sensor_id=sensor(sensor_id),
        ts_start=ts,
    )
