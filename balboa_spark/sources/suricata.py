"""P1: Suricata EVE DNS v1/v2 normalizer.

Reference semantics (format/format_suricata.go:38-114):
- keep only ``event_type == "dns"`` and ``dns.type == "answer"``
- v2 "detailed" (``dns.answers`` present): one row per answer element
- v2 "grouped" (``dns.grouped`` present): map rrtype -> [rdata]; one row
  per (rrtype, rdata), rrname from the envelope
- v1: single row from dns.{rrname,rrtype,rdata}
- timestamp layout ``2006-01-02T15:04:05.999999-0700``
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from balboa_spark.functions.strings import normalize_ts_fraction
from balboa_spark.sources.common import finalize, sensor

#: Go layout 2006-01-02T15:04:05.999999-0700 (format_suricata.go:52).
#: Go accepts 0..n fraction digits; the fraction is normalized to
#: exactly 6 before the strict Spark pattern.
TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxx"


def normalize(raw: DataFrame, sensor_id=None) -> DataFrame:
    """raw: SURICATA_EVE-shaped DataFrame -> input observations."""
    dns = raw.filter(
        (F.col("event_type") == "dns") & (F.col("dns.type") == "answer")
    ).withColumn(
        "_ts",
        F.try_to_timestamp(normalize_ts_fraction(F.col("timestamp")), F.lit(TS_FMT)),
    )

    v2 = dns.filter(F.col("dns.version") == 2)

    # v2 dispatch (format_suricata.go:57-95): "detailed" when answers is
    # non-empty; otherwise the "grouped" map — grouped is the fallback,
    # not gated on its own presence.
    has_answers = F.col("dns.answers").isNotNull() & (F.size("dns.answers") > 0)

    detailed = v2.filter(has_answers).select(
        "_ts", "dns.rcode", F.explode("dns.answers").alias("a")
    )
    detailed = finalize(
        detailed,
        rcode=F.col("rcode"),
        rdata=F.col("a.rdata"),
        rrtype=F.col("a.rrtype"),
        rrname=F.col("a.rrname"),
        sensor_id=sensor(sensor_id),
        ts_start=F.col("_ts"),
    )

    grouped = (
        v2.filter(~has_answers & F.col("dns.grouped").isNotNull())
        .select(
            "_ts",
            "dns.rcode",
            "dns.rrname",
            F.explode("dns.grouped").alias("g_rrtype", "g_rdatas"),
        )
        .select(
            "_ts",
            "rcode",
            "rrname",
            "g_rrtype",
            F.explode("g_rdatas").alias("g_rdata"),
        )
    )
    grouped = finalize(
        grouped,
        rcode=F.col("rcode"),
        rdata=F.col("g_rdata"),
        rrtype=F.col("g_rrtype"),
        rrname=F.col("rrname"),
        sensor_id=sensor(sensor_id),
        ts_start=F.col("_ts"),
    )

    # v1 is the complement of v2: the reference routes EVERY version
    # != 2 through the v1 path (format_suricata.go:57,96), including
    # hypothetical version > 2 records.
    v1 = dns.filter(
        F.col("dns.version").isNull() | (F.col("dns.version") != 2)
    ).select("_ts", "dns.rcode", "dns.rrname", "dns.rrtype", "dns.rdata")
    v1 = finalize(
        v1,
        rcode=F.col("rcode"),
        rdata=F.col("rdata"),
        rrtype=F.col("rrtype"),
        rrname=F.col("rrname"),
        sensor_id=sensor(sensor_id),
        ts_start=F.col("_ts"),
    )

    return detailed.unionByName(grouped).unionByName(v1)
