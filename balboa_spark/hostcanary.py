"""Pure-Python host-speed canary shared by bench.py and the streaming
latency probe.

The sandbox's ambient speed drifted ~2x between rounds (r11->r13),
drowning raw cross-round timings; both harnesses divide their
measurements by this fixed deterministic workload's duration. ONE
definition on purpose: the probe's pinned CANARY_REF calibration and
bench's normalized trail are only comparable while they time the
SAME workload — two drifting copies would silently skew every
normalized number (r14 self-review find). The mix (md5, str/int ops,
dict churn, sort) tracks general interpreter CPU rather than any one
subsystem.
"""

from __future__ import annotations

import hashlib
import time


def host_canary() -> float:
    """Seconds to run the fixed workload on this host, ~0.6-0.7s at
    the r14 calibration host speed."""
    t0 = time.time()
    acc = 0
    d: dict[int, int] = {}
    for i in range(400_000):
        h = hashlib.md5(b"canary-%d" % i).digest()
        v = int.from_bytes(h[:8], "big")
        acc ^= v
        d[v % 9973] = d.get(v % 9973, 0) + 1
    xs = sorted((k * 2654435761) % 1000003 for k in range(600_000))
    acc ^= xs[0] ^ xs[-1] ^ len(d)
    assert acc is not None
    return time.time() - t0
