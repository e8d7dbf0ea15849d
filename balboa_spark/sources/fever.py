"""P2: FEVER aggregate normalizer.

Reference semantics (format/format_fever.go:34-71): nested
``dns{rrname -> {rdata: [{rdata,count,rrtype,rcode,...}]}}``; two-level
explode; carries a pre-aggregated count and the message-level window
``[timestamp_start, timestamp_end]`` (RFC3339).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from balboa_spark.sources.common import finalize, sensor


def normalize(raw: DataFrame, sensor_id=None) -> DataFrame:
    ex = raw.select(
        F.try_to_timestamp(F.col("timestamp_start")).alias("_ts_start"),
        F.try_to_timestamp(F.col("timestamp_end")).alias("_ts_end"),
        F.explode("dns").alias("g_rrname", "g_val"),
    ).select(
        "_ts_start",
        "_ts_end",
        "g_rrname",
        F.explode("g_val.rdata").alias("r"),
    )
    return finalize(
        ex,
        count=F.col("r.count"),
        rcode=F.col("r.rcode"),
        rdata=F.col("r.rdata"),
        rrtype=F.col("r.rrtype"),
        rrname=F.col("g_rrname"),
        sensor_id=sensor(sensor_id),
        ts_start=F.col("_ts_start"),
        ts_end=F.col("_ts_end"),
    )
