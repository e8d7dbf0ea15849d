"""P6: NMSG/NewDomain normalizer + wire-frame decoder.

Reference semantics (format/format_nmsg.go:83-110): rrname is a DNS
wire-format label sequence (:11-27); rrtype is numeric and mapped to a
mnemonic, unknown types kept as their decimal string (:62-63); A-type
rdata is exactly 4 raw bytes decoded to a dotted quad, else ''
(:66-71); NS/CNAME/MX rdata is itself a wire-format domain (:72-73);
only the FIRST rdata element is consumed (:90-94); time_seen is epoch
seconds.

Byte-safety: the NMSG_NEWDOMAIN schema carries raw bytes as latin-1
strings. Converting back to bytes MUST use encode(col, 'ISO-8859-1') —
cast('binary') UTF-8-encodes, turning every byte >= 0x80 into a 2-byte
sequence (which silently broke A records like 192.168.216.34 whose
octets exceed 127).

``decode_nmsg_container`` decodes serialized NewDomain protobuf
messages (format/newdomain.pb.go:23-43) without a protobuf runtime:
the message is plain varint + length-delimited fields, parsed by a
~40-line reader inside mapInPandas (Arrow-batched; the decode is the
rare genuinely-imperative path, §2.2 P6). The SIE transport framing
(NMSG container magic + vendor-id==2 filter, feeder_nmsg_socket.go:
46-72) stays at the transport edge — a Kafka/file source delivers one
serialized NewDomain per record.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from balboa_spark.functions.net import rrtype_mnemonic
from balboa_spark.functions.strings import dns_wire_to_name
from balboa_spark.sources.common import finalize, sensor

RRT_A, RRT_NS, RRT_CNAME, RRT_MX = 1, 2, 5, 15


def _latin1_bytes(c: Column) -> Column:
    """latin-1-safe string -> its original bytes (NOT cast('binary'),
    which UTF-8-encodes and corrupts bytes >= 0x80)."""
    return F.encode(c, "ISO-8859-1")


def _parse_domain(c: Column) -> Column:
    """parseDomainString (format/format_nmsg.go:11-27): wire labels ->
    dotted name; on parse failure / empty result, fall back to the raw
    string exactly like the reference's ``return string(rdata)``."""
    b = _latin1_bytes(c)
    decoded = dns_wire_to_name(b)
    return F.when(F.length(decoded) >= 1, decoded).otherwise(c)


def normalize(raw: DataFrame, sensor_id=None) -> DataFrame:
    """raw: NMSG_NEWDOMAIN-shaped DataFrame (byte fields as latin-1
    strings) -> input observations."""
    first_rdata = F.try_element_at("rdata", F.lit(1))
    rdata_bytes = _latin1_bytes(first_rdata)
    octet = lambda i: F.conv(F.hex(F.substring(rdata_bytes, i, 1)), 16, 10)  # noqa: E731
    rdata = (
        # A: exactly 4 bytes -> dotted quad, else '' (corrupt record,
        # format_nmsg.go:67-71 — the observation is still emitted)
        F.when(
            F.col("rrtype") == RRT_A,
            F.when(
                F.length(rdata_bytes) == 4,
                F.concat_ws(".", octet(1), octet(2), octet(3), octet(4)),
            ).otherwise(F.lit("")),
        )
        # NS/CNAME/MX: rdata is a wire-format domain (:72-73)
        .when(
            F.col("rrtype").isin(RRT_NS, RRT_CNAME, RRT_MX),
            _parse_domain(first_rdata),
        )
        # everything else: raw bytes as string (:74-75)
        .otherwise(first_rdata)
    )
    return finalize(
        raw.filter(F.size("rdata") > 0),
        rdata=rdata,
        rrtype=rrtype_mnemonic(F.col("rrtype")),
        rrname=_parse_domain(F.col("rrname")),
        sensor_id=sensor(sensor_id),
        ts_start=F.timestamp_seconds(F.col("time_seen")),
    )


# -- wire decode (no protobuf runtime needed) --------------------------------

#: SIE vendor id accepted by the UDP feeder (feeder_nmsg_socket.go:64-68)
SIE_VENDOR_ID = 2

_NMSG_MAGIC = b"NMSG"
_NMSG_FLAG_ZLIB = 0x01
_NMSG_FLAG_FRAGMENT = 0x02


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = val = 0
    while i < len(buf):
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7
        if shift > 63:
            break
    raise ValueError("truncated varint")


def parse_nmsg_container(buf: bytes) -> list[bytes]:
    """Farsight NMSG container -> list of NewDomain message payloads.

    Framing: magic 'NMSG', 1 byte flags, 1 byte version, 4-byte BE
    payload length, then a protobuf Nmsg message (field 1 = repeated
    NmsgPayload{vid=1, msgtype=2, time_sec=3, time_nsec=4, payload=5}).
    Payloads with vendor id != 2 (SIE) are skipped, mirroring the UDP
    feeder's filter (feeder_nmsg_socket.go:64-68). zlib-compressed
    containers (flag 0x01) are inflated; fragmented containers (flag
    0x02) are not reassembled here — a datagram-per-file landing dir
    never fragments below the MTU the feeder advertises.
    """
    if len(buf) < 10 or buf[:4] != _NMSG_MAGIC:
        raise ValueError("not an NMSG container")
    flags = buf[4]
    if flags & _NMSG_FLAG_FRAGMENT:
        raise ValueError("fragmented NMSG container not supported")
    length = int.from_bytes(buf[6:10], "big")
    payload = buf[10 : 10 + length]
    if flags & _NMSG_FLAG_ZLIB:
        import zlib

        payload = zlib.decompress(payload)
    out: list[bytes] = []
    i = 0
    while i < len(payload):
        tag, i = _read_varint(payload, i)
        field, wt = tag >> 3, tag & 7
        if wt == 2:
            ln, i = _read_varint(payload, i)
            data = payload[i : i + ln]
            i += ln
            if field != 1:
                continue
            # one NmsgPayload
            j, vid, inner = 0, None, None
            while j < len(data):
                t2, j = _read_varint(data, j)
                f2, w2 = t2 >> 3, t2 & 7
                if w2 == 0:
                    v, j = _read_varint(data, j)
                    if f2 == 1:
                        vid = v
                elif w2 == 2:
                    l2, j = _read_varint(data, j)
                    if f2 == 5:
                        inner = data[j : j + l2]
                    j += l2
                elif w2 == 5:
                    j += 4
                elif w2 == 1:
                    j += 8
                else:
                    raise ValueError(f"unsupported wire type {w2}")
            if vid == SIE_VENDOR_ID and inner is not None:
                out.append(inner)
        elif wt == 0:
            _, i = _read_varint(payload, i)
        elif wt == 5:
            i += 4
        elif wt == 1:
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
    return out


def parse_newdomain(buf: bytes) -> dict | None:
    """Decode one serialized NewDomain message
    (format/newdomain.pb.go:23-43). Returns None on malformed input
    (the reference logs and drops, format.go contract)."""
    i, n = 0, len(buf)
    out: dict = {
        "domain": None,
        "time_seen": None,
        "rrname": None,
        "rrtype": None,
        "rdata": [],
    }

    def varint() -> int:
        nonlocal i
        val, i = _read_varint(buf, i)
        return val

    try:
        while i < n:
            tag = varint()
            field, wt = tag >> 3, tag & 7
            if wt == 0:  # varint
                v = varint()
                if field == 2:
                    out["time_seen"] = v
                elif field == 4:
                    out["rrtype"] = v
            elif wt == 2:  # length-delimited
                ln = varint()
                if i + ln > n:
                    raise ValueError("truncated bytes field")
                data = buf[i : i + ln]
                i += ln
                if field == 1:
                    out["domain"] = data.decode("latin-1")
                elif field == 3:
                    out["rrname"] = data.decode("latin-1")
                elif field == 7:
                    out["rdata"].append(data.decode("latin-1"))
            elif wt == 5:  # fixed32
                i += 4
            elif wt == 1:  # fixed64
                i += 8
            else:
                raise ValueError(f"unsupported wire type {wt}")
        if i != n:
            raise ValueError("overrun")
    except ValueError:
        return None
    if out["rrname"] is None and out["domain"] is None:
        return None
    return out


def decode_nmsg_container(frames: DataFrame, frame_col: str = "frame") -> DataFrame:
    """Binary frames -> NMSG_NEWDOMAIN rows, via an Arrow-batched
    mapInPandas decoder. A frame is either a full NMSG container
    (magic 'NMSG': datagram as received by the UDP feeder — unwrapped
    with the SIE vendor filter) or a single serialized NewDomain
    message. Malformed frames/messages are dropped (the reference
    returns an error per frame and continues, format_nmsg.go:85-88)."""
    import pandas as pd

    from balboa_spark.schemas import NMSG_NEWDOMAIN

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for buf in pdf[frame_col]:
                if buf is None:
                    continue
                buf = bytes(buf)
                if buf[:4] == _NMSG_MAGIC:
                    try:
                        msgs = parse_nmsg_container(buf)
                    except ValueError:
                        continue
                else:
                    msgs = [buf]
                for m in msgs:
                    rec = parse_newdomain(m)
                    if rec is not None:
                        rows.append(rec)
            yield pd.DataFrame(
                rows, columns=["domain", "time_seen", "rrname", "rrtype", "rdata"]
            )

    return frames.mapInPandas(decode, schema=NMSG_NEWDOMAIN)
