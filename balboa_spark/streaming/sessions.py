"""Custom stateful streaming operator: cross-batch sessionization.

The reference has no windowed operators (SURVEY §2.9 T3) — this is one
of the engine's declared extensions. The batch twin is
``temporal.gap_sessions`` (`events_sessionize` in
entry_queries_extra.py, oracle-checked) — since r15 an ADAPTIVE plan
whose two arms (classic per-user window / two-phase gaps-and-islands)
number sessions identically, so this streaming form is equivalent to
WHICHEVER batch arm is active: the session boundaries it emits equal
both (pinned by the both-arms equivalence test in
tests/test_streaming_sessions.py). This module is the STREAMING form,
where sessions span micro-batches and so need keyed state:
implemented with ``applyInPandasWithState`` (Arrow-batched per-group
pandas, state carried by the engine between triggers). Its state is
bounded the way the batch two-phase arm bounds its worst task: one
(start, last, count) triple per live key, never a key's history.

Semantics (same 30-minute-gap rule as the batch twin), all in EVENT
time:
- events for a key arrive in any batch; state holds the open session
  (start, last event ts, count);
- an event more than ``gap`` after the open session's last event
  CLOSES that session (emitted downstream) and opens a new one;
- the tail session flushes when the WATERMARK passes last_ts + gap
  (event-time timeout). Event-time timeouts only fire as data advances
  the watermark — no wall-clock dependence, and no busy "cleaning up
  state" trigger loop (which a processing-time timeout causes: the
  engine re-triggers continuously and processAllAvailable never
  settles).

State size is O(live keys), not O(events) — each key holds one
(start, last, count) triple, the minimal sessionization state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", IntegerType(), False),
    ]
)

#: state: open session as epoch-micros (start, last) + count
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", IntegerType()),
    ]
)


def _session_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            # watermark passed last_ts + gap: flush the tail session
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((user_id, start_us, last_us, n))
                state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
            ts_list.sort()
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us, last_us, n = None, None, 0
            for t in ts_list:
                if start_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us, n = t, n + 1
            if start_us is not None:
                state.update((start_us, last_us, n))
                # event-time timeout must be beyond the current watermark
                flush_ms = (last_us + gap_us) // 1000
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(flush_ms, wm + 1))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming DF (key_col, ts) -> stream of CLOSED sessions."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            _session_fn(gap_us),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
