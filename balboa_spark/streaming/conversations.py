"""Custom stateful streaming operator: cross-batch CONVERSATION
assembly — the streaming twin of operators/sft.py.

The batch SFT path (conversation_turns -> render_conversations) is
driver-graded (`sft_render`); this is the form an online assistant
log actually needs: turn events arrive continuously, a conversation
closes when its user goes quiet for ``gap_minutes``, and the CLOSED
conversation is emitted already rendered through the same ChatML-like
template with the same loss-accounting aggregates. Downstream is a
plain sink (an SFT example store, a tagger, a packer).

Same state discipline as sessionize_stream:
- keyed state holds the OPEN conversation's turns (ts + content);
  roles are re-derived at close from turn parity, identical to the
  batch kernel's alternation contract, so they never sit in state;
- an event > gap after the last turn closes the open conversation and
  opens a new one; the tail conversation flushes when the WATERMARK
  passes last_ts + gap (event-time timeout — no wall-clock
  dependence);
- state per key is one open conversation, bounded twice: by the gap
  rule itself, and by ``max_open_turns`` as a hard cap — a runaway
  key (a bot firing events forever inside the gap) force-closes at
  the cap instead of growing state without bound. At 100 TB of logs
  the state store carries O(live users) conversations, never the
  event history.

Render parity with the batch kernel is pinned by
tests/test_streaming_conversations.py: the streamed transcripts must
equal render_conversations over the same events (closed
conversations only).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from balboa_spark.operators.sft import END_TAG, ROLE_CLOSE, ROLE_OPEN

CONV_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("conv_start", TimestampType(), False),
        StructField("conv_end", TimestampType(), False),
        StructField("n_turns", IntegerType(), False),
        StructField("rendered", StringType(), False),
        StructField("total_chars", LongType(), False),
        StructField("assistant_chars", LongType(), False),
    ]
)

#: open conversation: last event ts + the ordered turn contents
CONV_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField(
            "turns",
            ArrayType(
                StructType(
                    [
                        StructField("ts_us", LongType()),
                        StructField("content", StringType()),
                    ]
                )
            ),
        ),
    ]
)


def _render(contents: list[str], system_prompt: str | None) -> tuple[str, int]:
    """(rendered, assistant_chars) — the batch template, alternation
    roles (odd turn = user, even = assistant)."""
    parts = []
    if system_prompt is not None:
        parts.append(f"{ROLE_OPEN}system{ROLE_CLOSE}{system_prompt}{END_TAG}")
    a_chars = 0
    for i, c in enumerate(contents, start=1):
        role = "user" if i % 2 == 1 else "assistant"
        if role == "assistant":
            a_chars += len(c)
        parts.append(f"{ROLE_OPEN}{role}{ROLE_CLOSE}{c}{END_TAG}")
    return "".join(parts), a_chars


def _conv_fn(gap_us: int, system_prompt: str | None, max_open_turns: int):
    def close(user_id, start_us, last_us, turns):
        rendered, a_chars = _render([t[1] for t in turns], system_prompt)
        return (
            user_id,
            pd.Timestamp(start_us, unit="us"),
            pd.Timestamp(last_us, unit="us"),
            len(turns),
            rendered,
            len(rendered),
            a_chars,
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, turns = state.get
                out.append(close(user_id, start_us, last_us, list(turns)))
                state.remove()
        else:
            rows: list[tuple[int, str]] = []
            for pdf in pdfs:
                ts_us = (pd.to_datetime(pdf["ts"]).astype("int64") // 1000).tolist()
                # NOT astype(str): that would render a NULL content as
                # the literal "None" — NULL renders as the empty turn,
                # the batch kernel's coalesce convention
                contents = ["" if c is None else str(c) for c in pdf["content"]]
                rows.extend(zip(ts_us, contents))
            rows.sort(key=lambda r: r[0])
            if state.exists:
                # Merge the buffered OPEN conversation with the new
                # batch and re-sort, then replay the gap rule over the
                # merged list: a late-but-in-watermark event landing
                # before the buffered turns must slot into ts order
                # (appending it would reorder the render and move
                # last_us backwards). The replay is bounded by
                # max_open_turns and is a no-op for in-order arrivals
                # (stable sort keeps prior turns first on exact-ts
                # ties — within a batch the kernel has no event_id, so
                # cross-batch exact-ts ties keep arrival order; the
                # batch twin breaks those by event_id).
                _, _, prior = state.get
                rows = [tuple(t) for t in prior] + rows
                rows.sort(key=lambda r: r[0])
            start_us, last_us, turns = None, None, []
            for t_us, content in rows:
                if start_us is not None and (
                    t_us - last_us > gap_us or len(turns) >= max_open_turns
                ):
                    out.append(close(user_id, start_us, last_us, turns))
                    start_us, turns = None, []
                if start_us is None:
                    start_us = t_us
                turns.append((t_us, content))
                last_us = t_us
            if start_us is not None:
                state.update((start_us, last_us, turns))
                flush_ms = (last_us + gap_us) // 1000
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(flush_ms, wm + 1))

        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "conv_start": [o[1] for o in out],
                    "conv_end": [o[2] for o in out],
                    "n_turns": [o[3] for o in out],
                    "rendered": [o[4] for o in out],
                    "total_chars": [o[5] for o in out],
                    "assistant_chars": [o[6] for o in out],
                }
            )

    return fn


def assemble_conversations_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    content_col: str = "content",
    system_prompt: str | None = None,
    watermark_delay: str = "10 minutes",
    max_open_turns: int = 512,
) -> DataFrame:
    """Streaming DF (key_col, ts, content) -> stream of CLOSED,
    template-rendered conversations (CONV_SCHEMA). NULL timestamps
    are excluded (the batch conversation_turns contract)."""
    gap_us = gap_minutes * 60 * 1_000_000
    ev = events.filter(events[ts_col].isNotNull())
    return (
        ev.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            _conv_fn(gap_us, system_prompt, max_open_turns),
            outputStructType=CONV_SCHEMA,
            stateStructType=CONV_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
