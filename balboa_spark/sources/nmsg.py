"""P6: NMSG/NewDomain normalizer (pre-decoded protobuf fields).

Reference semantics (format/format_nmsg.go:83-110): rrname is a DNS
wire-format label sequence (:11-27); rrtype is numeric and mapped to a
mnemonic, unknown types dropped by the reference (:41-64 — we keep them
as 'TYPE<n>', a declared superset); A-type rdata is 4 raw bytes decoded
to a dotted quad (:66-79); only the FIRST rdata element is consumed
(:90-94); time_seen is epoch seconds.

The protobuf envelope itself (NMSG container / SIE vendor filtering,
feeder_nmsg_socket.go:64-68) is transport: a Kafka/file source delivers
the decoded fields. ``decode_nmsg_container`` below is the stub seam
for a real wire decoder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from balboa_spark.functions.net import rrtype_mnemonic
from balboa_spark.functions.strings import dns_wire_to_name
from balboa_spark.sources.common import finalize, sensor


def normalize(raw: DataFrame, sensor_id=None) -> DataFrame:
    """raw: NMSG_NEWDOMAIN-shaped DataFrame (binary fields as latin-1
    strings or BinaryType) -> input observations."""
    first_rdata = F.try_element_at("rdata", F.lit(1))
    rrtype_m = rrtype_mnemonic(F.col("rrtype"))
    # A records: 4 raw bytes -> dotted quad; others: rdata bytes as text
    rdata_bytes = first_rdata.cast("binary")
    octet = lambda i: F.conv(F.hex(F.substring(rdata_bytes, i, 1)), 16, 10)  # noqa: E731
    rdata = F.when(
        (F.col("rrtype") == 1) & (F.length(rdata_bytes) == 4),
        F.concat_ws(".", octet(1), octet(2), octet(3), octet(4)),
    ).otherwise(first_rdata.cast("string"))
    return finalize(
        raw.filter(F.size("rdata") > 0),
        rdata=rdata,
        rrtype=rrtype_m,
        rrname=dns_wire_to_name(F.col("rrname").cast("binary")),
        sensor_id=sensor(sensor_id),
        ts_start=F.timestamp_seconds(F.col("time_seen")),
    )


def decode_nmsg_container(raw: DataFrame) -> DataFrame:
    """Wire-level NMSG container decode (Farsight NMSG framing + SIE
    vendor-id==2 filter, feeder_nmsg_socket.go:46-72).

    The protobuf runtime is not available in this container — this is
    the clearly-marked seam where a mapInPandas batch decoder would
    parse the frames. The Spark-side contract (input: binary frames;
    output: NMSG_NEWDOMAIN schema) is fixed by schemas.NMSG_NEWDOMAIN.
    """
    raise NotImplementedError(
        "NMSG container decode requires a protobuf runtime; "
        "feed pre-decoded NMSG_NEWDOMAIN rows instead"
    )
