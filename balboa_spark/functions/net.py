"""Network scalar functions (§2.11) — pure Column expressions (JVM-side,
codegen-friendly); no Python UDFs in any hot path.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column
from pyspark.sql import functions as F

#: rrtype int -> mnemonic (reference format/format_nmsg.go:41-64 covers
#: the 9 the NMSG decoder emits; full set mirrors the GraphQL enum,
#: query/query_graphql.go:26-73).
RRTYPE_MNEMONICS = {
    1: "A",
    2: "NS",
    5: "CNAME",
    6: "SOA",
    12: "PTR",
    15: "MX",
    16: "TXT",
    28: "AAAA",
    33: "SRV",
}

#: 45-value DNS type enum from the GraphQL schema (query/query_graphql.go:26-73)
RRTYPE_ENUM = {
    "A", "A6", "AAAA", "AFSDB", "ALIAS", "APL", "AXFR", "CAA", "CDNSKEY",
    "CDS", "CERT", "CNAME", "DHCID", "DLV", "DNAME", "DNSKEY", "DS",
    "HINFO", "HIP", "IPSECKEY", "IXFR", "KEY", "KX", "LOC", "MX", "NAPTR",
    "NS", "NSEC", "NSEC3", "NSEC3PARAM", "OPENPGPKEY", "OPT", "PTR",
    "RRSIG", "RP", "SIG", "SOA", "SRV", "SSHFP", "TA", "TKEY", "TLSA",
    "TSIG", "TXT", "URI",
}


def rrtype_mnemonic(code: Column) -> Column:
    """Integer rrtype -> mnemonic string; unknown codes -> their decimal
    string, exactly as the reference's default branch
    (format_nmsg.go:62-63, fmt.Sprintf("%d", rrtype))."""
    mapping = F.create_map(
        *[F.lit(x) for kv in RRTYPE_MNEMONICS.items() for x in kv]
    )
    return F.coalesce(mapping[code], code.cast("string"))


def ipv4_from_bytes(raw: Column) -> Column:
    """4-byte binary rdata -> dotted quad (format/format_nmsg.go:66-79).

    Works on BinaryType: unpack each byte as unsigned, join with dots.
    """
    octets = [
        F.conv(F.hex(F.substring(raw, i + 1, 1)), 16, 10) for i in range(4)
    ]
    return F.when(F.length(raw) == 4, F.concat_ws(".", *octets))


def ip4_to_long(ip: Column) -> Column:
    """Dotted-quad string -> int64 (NULL if not a well-formed IPv4).

    Basis of the CIDR range operator (C1): turns the reference's
    expand-and-point-query loop into a single range predicate.
    """
    parts = F.split(ip, r"\.")
    valid = ip.rlike(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
    octet = lambda i: parts.getItem(i).try_cast("long")  # noqa: E731
    in_range = (
        (octet(0) <= 255) & (octet(1) <= 255) & (octet(2) <= 255) & (octet(3) <= 255)
    )
    val = octet(0) * 16777216 + octet(1) * 65536 + octet(2) * 256 + octet(3)
    return F.when(valid & in_range, val)


def cidr_to_range(cidr: str, drop_network_broadcast: bool | None = None) -> tuple[int, int]:
    """CIDR string -> inclusive (lo, hi) int64 host range.

    Mirrors cmd/balboa/cmds/query.go:52-55: for prefixes shorter than
    /31 the network and broadcast addresses are excluded.
    """
    net = ipaddress.ip_network(cidr, strict=False)
    lo = int(net.network_address)
    hi = int(net.broadcast_address)
    if drop_network_broadcast is None:
        drop_network_broadcast = net.prefixlen < 31
    if drop_network_broadcast and net.prefixlen < 31:
        lo, hi = lo + 1, hi - 1
    return lo, hi
