"""Canonical schemas of the engine.

Two record shapes exist (reference observation/input_observation.go:12-23
and observation/observation.go:15-24):

- ``INPUT_OBSERVATION``: one normalized DNS-answer observation as emitted
  by any source parser, pre-aggregation.
- ``OBSERVATION``: one aggregated entry of the persistent `observations`
  table, unique on (rrname, sensor_id, rrtype, rdata)
  (reference backend/balboa-sqlite/sqlite-impl.c:159-173).

Deviations from the reference (declared, intentional):
- ``count`` is LongType; the C backend wraps at 2^32
  (rocksdb-impl.c:47-52) — we do not.
- timestamps are full TimestampType; the C backend stores u32 epoch
  seconds (second precision). API-edge formatting reproduces both the
  unix-seconds and RFC3339 forms (observation/observation.go:26-37).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

INPUT_OBSERVATION = StructType(
    [
        StructField("count", LongType(), False),
        StructField("rcode", StringType(), True),
        StructField("rdata", StringType(), False),
        StructField("rrtype", StringType(), False),
        StructField("rrname", StringType(), False),
        StructField("sensor_id", StringType(), False),
        StructField("ts_start", TimestampType(), False),
        StructField("ts_end", TimestampType(), False),
        StructField("tags", ArrayType(StringType()), True),
    ]
)

OBSERVATION = StructType(
    [
        StructField("rrname", StringType(), False),
        StructField("sensor_id", StringType(), False),
        StructField("rrtype", StringType(), False),
        StructField("rdata", StringType(), False),
        StructField("count", LongType(), False),
        StructField("first_seen", TimestampType(), False),
        StructField("last_seen", TimestampType(), False),
    ]
)

#: Group key of the aggregate table (order = canonical sort order, which
#: mirrors the reference's forward keyspace o\x1f<rrname>\x1f<sensor_id>
#: \x1f<rrtype>\x1f<rdata>, rocksdb-impl.c:772-783).
OBSERVATION_KEY = ("rrname", "sensor_id", "rrtype", "rdata")

#: Inverted-layout sort order (i\x1f<rdata>\x1f<sensor_id>\x1f<rrname>
#: \x1f<rrtype>, rocksdb-impl.c:789-800).
INVERTED_KEY = ("rdata", "sensor_id", "rrname", "rrtype")

# ---------------------------------------------------------------------------
# Raw wire-format schemas (schema-on-read for the 6 source formats, §2.2)
# ---------------------------------------------------------------------------

#: Suricata EVE DNS v1/v2 (format/format_suricata.go:15-34)
SURICATA_EVE = StructType(
    [
        StructField("timestamp", StringType()),
        StructField("event_type", StringType()),
        StructField(
            "dns",
            StructType(
                [
                    StructField("type", StringType()),
                    StructField("version", IntegerType()),
                    StructField("rrname", StringType()),
                    StructField("rrtype", StringType()),
                    StructField("rcode", StringType()),
                    StructField("ttl", IntegerType()),
                    StructField("rdata", StringType()),
                    StructField(
                        "answers",
                        ArrayType(
                            StructType(
                                [
                                    StructField("rrname", StringType()),
                                    StructField("rrtype", StringType()),
                                    StructField("ttl", IntegerType()),
                                    StructField("rdata", StringType()),
                                ]
                            )
                        ),
                    ),
                    StructField("grouped", MapType(StringType(), ArrayType(StringType()))),
                ]
            ),
        ),
    ]
)

#: FEVER aggregate (format/format_fever.go:15-30)
FEVER_AGGREGATE = StructType(
    [
        StructField("timestamp_start", StringType()),
        StructField("timestamp_end", StringType()),
        StructField(
            "dns",
            MapType(
                StringType(),
                StructType(
                    [
                        StructField(
                            "rdata",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("answering_host", StringType()),
                                        StructField("count", LongType()),
                                        StructField("rcode", StringType()),
                                        StructField("rdata", StringType()),
                                        StructField("rrtype", StringType()),
                                        StructField("type", StringType()),
                                    ]
                                )
                            ),
                        )
                    ]
                ),
            ),
        ),
    ]
)

#: gopassivedns (format/format_gopassivedns.go:16-36); only q/a/atype/tstamp consumed
GOPASSIVEDNS = StructType(
    [
        StructField("query_id", LongType()),
        StructField("rcode", IntegerType()),
        StructField("q", StringType()),
        StructField("qtype", StringType()),
        StructField("a", StringType()),
        StructField("atype", StringType()),
        StructField("ttl", IntegerType()),
        StructField("dst", StringType()),
        StructField("src", StringType()),
        StructField("tstamp", StringType()),
        StructField("elapsed", LongType()),
        StructField("sport", StringType()),
    ]
)

#: Packetbeat DNS (format/format_packetbeat.go:16-28)
PACKETBEAT = StructType(
    [
        StructField("type", StringType()),
        StructField("@timestamp", StringType()),
        StructField(
            "dns",
            StructType(
                [
                    StructField(
                        "answers",
                        ArrayType(
                            StructType(
                                [
                                    StructField("name", StringType()),
                                    StructField("class", StringType()),
                                    StructField("type", StringType()),
                                    StructField("data", StringType()),
                                    StructField("ttl", StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)

#: NMSG NewDomain, pre-decoded protobuf fields (format/newdomain.pb.go:23-43)
NMSG_NEWDOMAIN = StructType(
    [
        StructField("domain", StringType()),  # raw DNS wire-format labels, latin-1 safe
        StructField("time_seen", LongType()),
        StructField("rrname", StringType()),
        StructField("rrtype", IntegerType()),
        StructField("rdata", ArrayType(StringType())),
    ]
)
