"""Property-based tests (hypothesis) for the pure-Python wire codecs:
encode/decode roundtrips for the NewDomain message and NMSG container,
and the CIDR/IP scalar helpers against the stdlib model.

These run without Spark (fast, many examples) — the Spark-side uses of
the same parsers are covered by the e2e tests.
"""

from __future__ import annotations

import ipaddress

from hypothesis import given, settings
from hypothesis import strategies as st

from balboa_spark.functions.net import cidr_to_range
from balboa_spark.sources.nmsg import (
    SIE_VENDOR_ID,
    parse_newdomain,
    parse_nmsg_container,
)


def pb_bytes(field: int, data: bytes) -> bytes:
    out = bytearray([field << 3 | 2])
    ln = len(data)
    while True:
        b = ln & 0x7F
        ln >>= 7
        out.append(b | (0x80 if ln else 0))
        if not ln:
            return bytes(out) + data


def pb_varint(field: int, val: int) -> bytes:
    out = bytearray([field << 3])
    while True:
        b = val & 0x7F
        val >>= 7
        out.append(b | (0x80 if val else 0))
        if not val:
            return bytes(out)


@settings(max_examples=200, deadline=None)
@given(
    rrname=st.binary(min_size=1, max_size=64),
    rrtype=st.integers(min_value=0, max_value=65535),
    time_seen=st.integers(min_value=0, max_value=2**32 - 1),
    rdata=st.lists(st.binary(max_size=32), max_size=5),
)
def test_newdomain_roundtrip(rrname, rrtype, time_seen, rdata):
    buf = (
        pb_varint(2, time_seen)
        + pb_bytes(3, rrname)
        + pb_varint(4, rrtype)
        + b"".join(pb_bytes(7, r) for r in rdata)
    )
    rec = parse_newdomain(buf)
    assert rec is not None
    assert rec["rrname"].encode("latin-1") == rrname
    assert rec["rrtype"] == rrtype
    assert rec["time_seen"] == time_seen
    assert [r.encode("latin-1") for r in rec["rdata"]] == rdata


@settings(max_examples=100, deadline=None)
@given(data=st.binary(max_size=64))
def test_newdomain_never_crashes(data):
    # arbitrary bytes: decode returns a record or None, never raises
    parse_newdomain(data)


@settings(max_examples=100, deadline=None)
@given(
    payloads=st.lists(
        st.tuples(st.integers(min_value=0, max_value=10), st.binary(max_size=48)),
        max_size=6,
    ),
    compress=st.booleans(),
)
def test_container_roundtrip(payloads, compress):
    import zlib

    body = b"".join(
        pb_bytes(1, pb_varint(1, vid) + pb_varint(2, 5) + pb_bytes(5, inner))
        for vid, inner in payloads
    )
    flags = 0
    if compress:
        body = zlib.compress(body)
        flags |= 0x01
    cont = b"NMSG" + bytes([flags, 2]) + len(body).to_bytes(4, "big") + body
    got = parse_nmsg_container(cont)
    want = [inner for vid, inner in payloads if vid == SIE_VENDOR_ID]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    ip=st.integers(min_value=0, max_value=2**32 - 1),
    prefix=st.integers(min_value=0, max_value=32),
)
def test_cidr_range_matches_stdlib(ip, prefix):
    cidr = f"{ipaddress.ip_address(ip)}/{prefix}"
    lo, hi = cidr_to_range(cidr)
    net = ipaddress.ip_network(cidr, strict=False)
    want_lo, want_hi = int(net.network_address), int(net.broadcast_address)
    if net.prefixlen < 31:  # network/broadcast dropped (query.go:52-55)
        want_lo, want_hi = want_lo + 1, want_hi - 1
    assert (lo, hi) == (want_lo, want_hi)


# -- GraphQL parser properties ----------------------------------------------

_gql_name = st.from_regex(r"[_A-Za-z][_0-9A-Za-z]{0,12}", fullmatch=True).filter(
    lambda s: s not in ("query", "mutation", "subscription", "true", "false", "null")
)
_gql_scalar = st.one_of(
    st.integers(min_value=-10**9, max_value=10**9),
    st.booleans(),
    st.none(),
    st.text(
        alphabet=st.characters(whitelist_categories=("L", "N"), max_codepoint=0x7F),
        max_size=12,
    ),
)


def _render(v):
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return '"' + v + '"'
    return str(v)


@given(
    fields=st.lists(
        st.tuples(_gql_name, st.dictionaries(_gql_name, _gql_scalar, max_size=3)),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=200, deadline=None)
def test_graphql_parse_roundtrip(fields):
    """Any rendered flat selection set parses back to exactly the
    structure it was rendered from — names, argument values (ints,
    strings, booleans, null), and field order all survive."""
    from balboa_spark.graphql import parse

    body = " ".join(
        name
        + (
            "(" + ", ".join(f"{k}: {_render(v)}" for k, v in args.items()) + ")"
            if args
            else ""
        )
        + " { x }"
        for name, args in fields
    )
    op = parse("{ " + body + " }")
    assert [f["name"] for f in op["selections"]] == [n for n, _ in fields]
    for f, (_, args) in zip(op["selections"], fields):
        assert f["args"] == args
        assert f["selections"][0]["name"] == "x"
