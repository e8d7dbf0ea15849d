"""Streaming end-to-end latency regression gate (PERF.md r13 record).

Replays the r13 measurement: 100k Suricata EVE dns records through
``ingest_stream`` in DELTA mode (epoch-gated exactly-once,
compact_every=4, max_live_deltas=8) into an 8-bucket ObservationStore
— 10 file-drop-triggered micro-batches of 10k lines each, local[32].

The r13 record set the target: steady-state <= ~2s and compaction
<= ~5s per 10k-record micro-batch. This probe re-runs the workload
and FAILS LOUDLY (exit 1) when the canary-normalized numbers leave a
1.5x tolerance band around those targets, so a plan/storage regression
on the hot streaming path can't hide behind ambient host drift (the
sandbox slowed ~2x between r11 and r13; raw seconds are weather).

Normalization: the same pure-Python host canary bench.py times each
pass (md5 + dict + sort interpreter mix). CANARY_REF pins the canary's
duration on the host where the r14 targets were calibrated; measured
wall times are divided by (canary_now / CANARY_REF) before the gate.

Prints one JSON line; exit 0 = inside the band, 1 = regression,
2 = setup failure, 3 = the probe stream crashed twice (r16: a single
StreamingQueryException retries once; the compaction gate metric is
the MIN over the run's compaction windows — bench's min-of-passes
estimator — so one burst-hit compaction can't flip the bit).

Run: python scripts/streaming_latency_probe.py
Env: SPARK_GRAFT_CPUS (default 32), PROBE_BATCHES (default 10),
     PROBE_ROWS (default 10000 per batch).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Pinned calibration: canary seconds on the r14 session host (measured
# same-session as the target re-validation: steady median 1.86s /
# compaction worst 4.82s at canary 0.62). If the host halves in speed
# the measured walls double, but so does the canary — the normalized
# numbers stay comparable to the r13/r14 record.
CANARY_REF = 0.62

# r13 record targets (PERF.md "streaming end-to-end latency record"),
# normalized to the calibration host, with a 1.5x tolerance band to
# absorb burst noise the canary can't see (GC, page cache, IO bursts).
STEADY_TARGET_S = 2.0
COMPACT_TARGET_S = 5.0
BAND = 1.5

COMPACT_EVERY = 4
MAX_LIVE_DELTAS = 8
NUM_BUCKETS = 8


# ONE shared canary definition with bench.py (balboa_spark/hostcanary)
# — CANARY_REF is calibrated against exactly that workload, and a
# drifting private copy would silently skew the gate.
from balboa_spark.hostcanary import host_canary  # noqa: E402


EVE = (
    '{"timestamp": "2019-01-01T%02d:%02d:%02d.000001+0000", "event_type": "dns",'
    ' "dns": {"type": "answer", "rcode": "NOERROR", "rrname": "host-%d.example.com",'
    ' "rrtype": "A", "ttl": 300, "rdata": "10.%d.%d.%d"}}'
)


def eve_batch(batch: int, rows: int) -> str:
    # ~20% repeated keys across batches so the fold and compaction do
    # real merging work, the rest unique — the r13 record's shape.
    out = []
    for i in range(rows):
        key = (batch * rows + i) if i % 5 else i
        out.append(
            EVE
            % (
                batch % 24,
                (i // 60) % 60,
                i % 60,
                key % 50_000,
                (key >> 16) & 0xFF,
                (key >> 8) & 0xFF,
                key & 0xFF,
            )
        )
    return "\n".join(out) + "\n"


def _run_once(batches: int, rows: int) -> dict:
    """One full probe run; returns the raw measurements. Raises on a
    crashed stream — the caller owns the retry policy (r15 verdict
    What's-wrong #2: one slow micro-batch or a StreamingQueryException
    under host load must not flip the gate bit by itself)."""
    from balboa_spark.operators.aggregate import aggregate
    from balboa_spark.plans.layout import ObservationStore
    from balboa_spark.session import get_spark
    from balboa_spark.streaming.ingest import ingest_stream

    spark = get_spark("latency-probe")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="latency_probe_")
    land = os.path.join(tmp, "land")
    os.makedirs(land)
    # Attribute compaction cost by MEASUREMENT, not by predicting the
    # epoch cadence (no-data micro-batches share the epoch counter, so
    # the drop-index arithmetic is fragile): count compact() calls and
    # tag each drop window with whether one ran inside it.
    compact_calls: list[int] = [0]

    class InstrumentedStore(ObservationStore):
        def compact(self) -> None:
            compact_calls[0] += 1
            super().compact()

    try:
        store = InstrumentedStore(
            spark, os.path.join(tmp, "store"), num_buckets=NUM_BUCKETS
        )
        empty = spark.createDataFrame(
            [],
            "count long, rcode string, rdata string, rrtype string,"
            " rrname string, sensor_id string, ts_start timestamp,"
            " ts_end timestamp, tags array<string>",
        )
        store.write(aggregate(empty))

        # Pre-render batch payloads so python string formatting never
        # lands inside a timing window.
        payloads = [eve_batch(b, rows) for b in range(batches)]

        canary_before = host_canary()

        q = ingest_stream(
            spark,
            land,
            "suricata_dns",
            stores={"default": store},
            sensor_id="probe",
            checkpoint=os.path.join(tmp, "ckpt"),
            mode="delta",
            compact_every=COMPACT_EVERY,
            max_live_deltas=MAX_LIVE_DELTAS,
        )
        walls: list[float] = []
        compacted: list[bool] = []
        try:
            for b, payload in enumerate(payloads):
                path = os.path.join(land, f"b{b:03d}.ndjson")
                with open(path + ".tmp", "w") as fh:
                    fh.write(payload)
                os.rename(path + ".tmp", path)  # atomic drop
                before = compact_calls[0]
                t0 = time.time()
                q.processAllAvailable()
                walls.append(time.time() - t0)
                compacted.append(compact_calls[0] > before)
            trigger_ms = [
                p["durationMs"].get("triggerExecution")
                for p in q.recentProgress
                if p.get("numInputRows", 0) > 0
            ]
        finally:
            q.stop()

        canary_after = host_canary()
        return {
            "walls": walls,
            "compacted": compacted,
            "trigger_ms": trigger_ms,
            "canary": min(canary_before, canary_after),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    batches = int(os.environ.get("PROBE_BATCHES", "10"))
    rows = int(os.environ.get("PROBE_ROWS", "10000"))

    # Retry-once on a CRASHED stream (r16 gate hardening): one
    # StreamingQueryException under host load previously surfaced as
    # rc=1 with an error blob in the bench record — host weather, not
    # a regression signal. Two consecutive crashes exit 3 (distinct
    # from 1 = regression, 2 = setup) with the crash reprs recorded.
    crashes: list[str] = []
    res: dict | None = None
    for _attempt in range(2):
        try:
            res = _run_once(batches, rows)
            break
        except Exception as exc:  # noqa: BLE001 - crash -> retry once
            crashes.append(f"{type(exc).__name__}: {exc}"[:300])
            print(f"CRASH (attempt {_attempt + 1}): {crashes[-1]}",
                  file=sys.stderr)
    if res is None:
        print(json.dumps({
            "probe": "streaming_latency",
            "pass": False,
            "crashed": crashes,
        }))
        return 3

    walls, compacted = res["walls"], res["compacted"]
    host_factor = res["canary"] / CANARY_REF

    # drop 0 pays the stream's cold start (offset log init, first
    # codegen) — excluded from the steady set, as in the r13 record
    steady = sorted(
        w for e, w in enumerate(walls) if not compacted[e] and e > 0
    )
    compact = sorted(w for e, w in enumerate(walls) if compacted[e])
    if not steady:
        # every post-warmup window compacted (tiny PROBE_BATCHES):
        # a setup problem, not a latency regression — exit 2, not 1
        print(
            "SETUP: no steady-state batch to measure (raise "
            "PROBE_BATCHES above compact_every)",
            file=sys.stderr,
        )
        return 2
    steady_median = steady[len(steady) // 2]
    compact_worst = max(compact) if compact else 0.0
    # The GATE metric for compaction is the MIN over the run's
    # compaction windows — the bench's own min-of-passes estimator
    # (r6b: this host bursts ~30s on byte-identical code; every
    # compaction does equivalent fold work, so the minimum is the
    # engine cost and the max is weather). compact_worst stays in the
    # record for trend reading but no longer flips the bit.
    compact_min = min(compact) if compact else 0.0

    steady_norm = steady_median / host_factor
    compact_worst_norm = compact_worst / host_factor
    compact_min_norm = compact_min / host_factor
    ok = (
        steady_norm <= STEADY_TARGET_S * BAND
        and compact_min_norm <= COMPACT_TARGET_S * BAND
    )

    print(
        json.dumps(
            {
                "probe": "streaming_latency",
                "batches": batches,
                "rows_per_batch": rows,
                "walls_sec": [round(w, 2) for w in walls],
                "compacted": compacted,
                "trigger_execution_ms": res["trigger_ms"],
                "steady_median_sec": round(steady_median, 2),
                "compact_worst_sec": round(compact_worst, 2),
                "compact_min_sec": round(compact_min, 2),
                "canary_sec": round(res["canary"], 3),
                "host_factor": round(host_factor, 2),
                "steady_median_normalized": round(steady_norm, 2),
                "compact_worst_normalized": round(compact_worst_norm, 2),
                "compact_min_normalized": round(compact_min_norm, 2),
                "gate": {
                    "steady_max": STEADY_TARGET_S * BAND,
                    "compact_max": COMPACT_TARGET_S * BAND,
                    "compact_estimator": "min_of_compactions",
                },
                "retried": bool(crashes),
                "pass": ok,
            }
        )
    )
    if not ok:
        print(
            f"REGRESSION: steady {steady_norm:.2f}s (max "
            f"{STEADY_TARGET_S * BAND}) / compact-min "
            f"{compact_min_norm:.2f}s (max {COMPACT_TARGET_S * BAND}) "
            "normalized",
            file=sys.stderr,
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
