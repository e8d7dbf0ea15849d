from balboa_spark.functions.net import (
    cidr_to_range,
    ip4_to_long,
    ipv4_from_bytes,
    rrtype_mnemonic,
)
from balboa_spark.functions.strings import (
    dns_wire_to_name,
    strip_trailing_dot,
)

__all__ = [
    "cidr_to_range",
    "ip4_to_long",
    "ipv4_from_bytes",
    "rrtype_mnemonic",
    "dns_wire_to_name",
    "strip_trailing_dot",
]
