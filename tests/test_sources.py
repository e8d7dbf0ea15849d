"""Parser/normalizer tests (§2.2 P1-P6), mirroring the reference's
per-format test strategy: valid, malformed, empty, wrong-type inputs
with asserted row counts (format/format_*_test.go).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from balboa_spark.sources.registry import normalize_json_lines

UTC = dt.timezone.utc


def lines_df(spark, *lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


# --- P1 Suricata ----------------------------------------------------------

SURI_V1 = (
    '{"timestamp": "2009-11-24T21:27:09.534255-0100", "event_type": "dns",'
    ' "dns": {"type": "answer", "rcode": "NOERROR", "rrname": "twitter.com",'
    ' "rrtype": "A", "ttl": 8, "rdata": "199.16.156.6"}}'
)
SURI_V2_DETAILED = (
    '{"timestamp": "2019-01-01T00:00:00.000001+0000", "event_type": "dns",'
    ' "dns": {"type": "answer", "version": 2, "rcode": "NOERROR",'
    ' "answers": [{"rrname": "a.example.com", "rrtype": "A", "ttl": 1, "rdata": "1.1.1.1"},'
    '             {"rrname": "a.example.com", "rrtype": "A", "ttl": 1, "rdata": "1.1.1.2"}]}}'
)
SURI_V2_GROUPED = (
    '{"timestamp": "2019-01-01T00:00:00.000001+0000", "event_type": "dns",'
    ' "dns": {"type": "answer", "version": 2, "rcode": "NOERROR", "rrname": "g.example.com",'
    ' "grouped": {"A": ["2.2.2.2", "2.2.2.3"], "CNAME": ["alias.example.com"]}}}'
)
SURI_BAD_TS = SURI_V1.replace("2009-11-24T21:27:09.534255-0100", "2009-11-24T21:")
SURI_WRONG_TYPE = SURI_V1.replace('"event_type": "dns"', '"event_type": "foo"')


def test_suricata_v1(spark):
    out = normalize_json_lines(lines_df(spark, SURI_V1), "suricata_dns", "s1").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.rrname, r.rrtype, r.rdata, r.rcode, r.sensor_id, r["count"]) == (
        "twitter.com", "A", "199.16.156.6", "NOERROR", "s1", 1
    )
    assert r.ts_start == dt.datetime(2009, 11, 24, 22, 27, 9, 534255)  # UTC = -0100 + 1h


def test_suricata_v2_detailed(spark):
    out = normalize_json_lines(lines_df(spark, SURI_V2_DETAILED), "suricata_dns", "s1").collect()
    assert sorted(r.rdata for r in out) == ["1.1.1.1", "1.1.1.2"]


def test_suricata_v2_grouped(spark):
    out = normalize_json_lines(lines_df(spark, SURI_V2_GROUPED), "suricata_dns", "s1").collect()
    got = sorted((r.rrtype, r.rdata) for r in out)
    assert got == [("A", "2.2.2.2"), ("A", "2.2.2.3"), ("CNAME", "alias.example.com")]
    assert all(r.rrname == "g.example.com" for r in out)


def test_suricata_negatives(spark):
    df = lines_df(spark, "babanana", SURI_BAD_TS, SURI_WRONG_TYPE, "")
    assert normalize_json_lines(df, "suricata_dns", "s1").count() == 0


def test_suricata_fraction_tolerance(spark):
    """Go's .999999 accepts 0..n fraction digits (time.Parse fractional
    rule); records without exactly 6 digits must not be dropped."""
    no_frac = SURI_V1.replace("2009-11-24T21:27:09.534255-0100", "2009-11-24T21:27:09-0100")
    three = SURI_V1.replace("2009-11-24T21:27:09.534255-0100", "2009-11-24T21:27:09.534-0100")
    nine = SURI_V1.replace("2009-11-24T21:27:09.534255-0100", "2009-11-24T21:27:09.534255999-0100")
    out = normalize_json_lines(lines_df(spark, no_frac, three, nine), "suricata_dns", "s1").collect()
    assert len(out) == 3
    ts = sorted(r.ts_start for r in out)
    assert ts[0] == dt.datetime(2009, 11, 24, 22, 27, 9)
    assert ts[1] == dt.datetime(2009, 11, 24, 22, 27, 9, 534000)
    assert ts[2] == dt.datetime(2009, 11, 24, 22, 27, 9, 534255)  # truncated past 6


def test_suricata_version_gt2_routes_v1(spark):
    """Every version != 2 goes through the v1 path — the reference's v2
    branch tests == 2 and everything else falls through
    (format_suricata.go:57,96)."""
    v3 = SURI_V1.replace('"dns": {"type": "answer"', '"dns": {"type": "answer", "version": 3')
    out = normalize_json_lines(lines_df(spark, v3), "suricata_dns", "s1").collect()
    assert len(out) == 1 and out[0].rdata == "199.16.156.6"


# --- P2 FEVER -------------------------------------------------------------

FEVER = (
    '{"dns": {"foo.bar": {"rdata": ['
    '{"rdata": "1.2.3.4", "count": 2, "rrtype": "A", "type": "answer"},'
    '{"rdata": "1.2.3.5", "count": 1, "rrtype": "A", "type": "answer"}]}},'
    ' "timestamp_start": "2018-10-26T21:02:20+00:00",'
    ' "timestamp_end": "2018-10-26T21:03:20+00:00"}'
)


def test_fever(spark):
    out = normalize_json_lines(lines_df(spark, FEVER), "fever_aggregate", "s2").collect()
    assert len(out) == 2
    by_rdata = {r.rdata: r for r in out}
    assert by_rdata["1.2.3.4"]["count"] == 2
    assert by_rdata["1.2.3.5"]["count"] == 1
    r = by_rdata["1.2.3.4"]
    assert r.rrname == "foo.bar"
    assert r.ts_start == dt.datetime(2018, 10, 26, 21, 2, 20)
    assert r.ts_end == dt.datetime(2018, 10, 26, 21, 3, 20)


def test_fever_malformed(spark):
    assert normalize_json_lines(lines_df(spark, "{}", "notjson"), "fever_aggregate").count() == 0


# --- P3 gopassivedns ------------------------------------------------------

GOPDNS = (
    '{"query_id":43264,"rcode":0,"q":"github.com","qtype":"A",'
    '"a":"192.30.253.112","atype":"A","ttl":60,"dst":"9.9.9.9","src":"192.168.1.79",'
    '"tstamp":"2018-10-26 19:32:36.141184 +0000 UTC","elapsed":35879000,"sport":"40651"}'
)


def test_gopassivedns(spark):
    out = normalize_json_lines(lines_df(spark, GOPDNS), "gopassivedns", "s3").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.rrname, r.rdata, r.rrtype) == ("github.com", "192.30.253.112", "A")
    assert r.ts_start == dt.datetime(2018, 10, 26, 19, 32, 36, 141184)


# --- P4 packetbeat --------------------------------------------------------

PB = (
    '{"type": "dns", "dns": {"answers": [{"name": "foo.bar.", "data": "1.2.3.4.",'
    ' "type": "A", "class": "foo"}]}, "@timestamp": "2018-10-26T21:03:20.222Z"}'
)


def test_packetbeat_trims_trailing_dots(spark):
    out = normalize_json_lines(lines_df(spark, PB), "packetbeat_dns", "s4").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.rrname, r.rdata) == ("foo.bar", "1.2.3.4")
    assert r.ts_start == dt.datetime(2018, 10, 26, 21, 3, 20, 222000)


def test_packetbeat_negatives(spark):
    bad_type = PB.replace('"type": "dns"', '"type": "whatever"')
    bad_ts = PB.replace("2018-10-26T21:03:20.222Z", "2018-10-26T2")
    df = lines_df(spark, bad_type, bad_ts)
    assert normalize_json_lines(df, "packetbeat_dns").count() == 0


# --- P5 gamelinux ---------------------------------------------------------

GL_OK = "1322849924.408856||10.1.1.1||8.8.8.8||IN||upload.youtube.com.||A||74.125.43.117||46587||5"
GL_BAD = "1322849924.408856||10.1.1.1||8.8.8.8||IN||upload.youtube.com.||A||74.125.43.117"
GL_NO_DOT = "1322849924||10.1.1.1||8.8.8.8||IN||x.example.||A||1.2.3.4||46587||5"


def test_gamelinux(spark):
    out = normalize_json_lines(
        lines_df(spark, GL_OK, GL_BAD, GL_NO_DOT), "gamelinux", "s5"
    ).collect()
    assert len(out) == 1  # 7-column line AND dotless-timestamp line dropped
    r = out[0]
    assert (r.rrname, r.rrtype, r.rdata, r["count"]) == (
        "upload.youtube.com", "A", "74.125.43.117", 5
    )
    # fraction is NANOSECONDS per the reference (time.Unix(epoch, nsec),
    # format_gamelinux.go:44): 408856 ns -> 408 µs
    assert r.ts_start == dt.datetime(2011, 12, 2, 18, 18, 44, 408)


# --- P6 NMSG --------------------------------------------------------------

def test_nmsg(spark):
    rows = [
        # www.example.com wire labels; A record with high-byte octets
        # (192.168.216.34 — every octet >= 0x80 except the last; pins
        # the latin-1 byte round-trip, not just ASCII-safe 1.2.3.4)
        ("\x03www\x07example\x03com\x00", 1540582356, "\x03www\x07example\x03com\x00", 1, ["\xc0\xa8\xd8\x22"]),
        # CNAME whose rdata is itself wire-format labels (format_nmsg.go:72-73)
        ("\x03foo\x03bar\x00", 1540582356, "\x03foo\x03bar\x00", 5, ["\x06target\x07example\x00", "\x06second\x00"]),
        # CNAME with unparseable rdata -> raw passthrough (reference fallback)
        ("\x03baz\x03bar\x00", 1540582356, "\x03baz\x03bar\x00", 5, ["target.example."]),
        # unknown rrtype kept as its decimal string (format_nmsg.go:62-63)
        ("\x01x\x00", 1540582356, "\x01x\x00", 99, ["data"]),
        # corrupt A record (3 bytes) -> empty rdata, still emitted (:67-71)
        ("\x01z\x00", 1540582356, "\x01z\x00", 1, ["\x01\x02\x03"]),
        # empty rdata array -> dropped
        ("\x01y\x00", 1540582356, "\x01y\x00", 1, []),
    ]
    from balboa_spark.schemas import NMSG_NEWDOMAIN
    from balboa_spark.sources.nmsg import normalize

    raw = spark.createDataFrame(rows, NMSG_NEWDOMAIN)
    out = normalize(raw, "s6").collect()
    by_name = {r.rrname: r for r in out}
    assert set(by_name) == {"www.example.com", "foo.bar", "baz.bar", "x", "z"}
    assert by_name["www.example.com"].rdata == "192.168.216.34"
    assert by_name["www.example.com"].rrtype == "A"
    assert by_name["foo.bar"].rdata == "target.example"  # wire-decoded, first only
    assert by_name["foo.bar"].rrtype == "CNAME"
    assert by_name["baz.bar"].rdata == "target.example."  # fallback passthrough
    assert by_name["x"].rrtype == "99"
    assert by_name["z"].rdata == ""  # corrupt A record
    assert by_name["www.example.com"].ts_start == dt.datetime.fromtimestamp(1540582356, UTC).replace(tzinfo=None)


def _pb_bytes(field: int, data: bytes) -> bytes:
    return bytes([field << 3 | 2, len(data)]) + data


def _pb_varint(field: int, val: int) -> bytes:
    out = bytes([field << 3])
    enc = b""
    while True:
        b = val & 0x7F
        val >>= 7
        enc += bytes([b | (0x80 if val else 0)])
        if not val:
            return out + enc


def test_nmsg_wire_decode(spark):
    """decode_nmsg_container: hand-encoded NewDomain protobuf frames
    (field numbers per format/newdomain.pb.go:23-43) -> NMSG_NEWDOMAIN
    rows; malformed frames dropped (format_nmsg.go:85-88)."""
    from balboa_spark.sources.nmsg import decode_nmsg_container, normalize

    frame1 = (
        _pb_varint(2, 1540582356)  # time_seen
        + _pb_bytes(3, b"\x03www\x07example\x03com\x00")  # rrname
        + _pb_varint(4, 1)  # rrtype = A
        + _pb_bytes(7, bytes([192, 168, 216, 34]))  # rdata[0]
        + _pb_bytes(7, bytes([10, 0, 0, 1]))  # rdata[1] (ignored by P6)
    )
    frame2 = (
        _pb_varint(2, 1540582400)
        + _pb_bytes(3, b"\x03foo\x03bar\x00")
        + _pb_varint(4, 16)  # TXT
        + _pb_bytes(7, b"hello txt")
        + _pb_bytes(1, b"\x03foo\x03bar\x00")  # domain (carried, unused)
        + _pb_varint(13, 2)  # type enum: skipped varint field
    )
    frames = spark.createDataFrame(
        [(frame1,), (frame2,), (b"\xff\xff\xff",), (None,)], "frame binary"
    )
    decoded = decode_nmsg_container(frames)
    rows = {r.rrname: r for r in decoded.collect()}
    assert set(rows) == {"\x03www\x07example\x03com\x00", "\x03foo\x03bar\x00"}
    assert rows["\x03www\x07example\x03com\x00"].rrtype == 1
    assert rows["\x03www\x07example\x03com\x00"].rdata[0] == "\xc0\xa8\xd8\x22"

    obs = {r.rrname: r for r in normalize(decoded, "s6").collect()}
    assert obs["www.example.com"].rdata == "192.168.216.34"
    assert obs["foo.bar"].rdata == "hello txt"
    assert obs["foo.bar"].rrtype == "TXT"
