"""Stateful streaming sessionization (applyInPandasWithState):
sessions must span micro-batches and close deterministically when a
later event exceeds the gap.
"""

from __future__ import annotations

import json

import pytest


@pytest.mark.parametrize("gap_minutes", [30])
def test_sessions_span_micro_batches(spark, tmp_path, gap_minutes):
    from balboa_spark.streaming.sessions import sessionize_stream

    land = tmp_path / "ev"
    land.mkdir()

    def write_batch(name, rows):
        (land / name).write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n"
        )

    # batch 1: two events inside one session for user 1, one for user 2
    write_batch(
        "b1.ndjson",
        [
            {"user_id": 1, "ts": "2024-01-01 10:00:00"},
            {"user_id": 1, "ts": "2024-01-01 10:05:00"},
            {"user_id": 2, "ts": "2024-01-01 09:00:00"},
        ],
    )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .json(str(land))
    )
    sessions = sessionize_stream(stream, gap_minutes=gap_minutes)
    q = (
        sessions.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # user 1's session is still open (watermark 09:55 < 10:05+gap);
        # user 2's tail MAY already flush (09:00+gap=09:30 < 09:55) —
        # correct event-time behavior, timing of the flush batch aside
        assert (
            spark.sql("SELECT * FROM closed_sessions WHERE user_id = 1").count() == 0
        )

        # batch 2: a user-1 event 2h later closes the first session
        # deterministically via the gap rule (event-driven, no timeout)
        write_batch("b2.ndjson", [{"user_id": 1, "ts": "2024-01-01 12:00:00"}])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM closed_sessions WHERE user_id = 1"
        ).collect()
        assert [(r.user_id, str(r.session_start), str(r.session_end), r.n_events) for r in rows] == [
            (1, "2024-01-01 10:00:00", "2024-01-01 10:05:00", 2)
        ]

        # batch 3: a later event pushes the event-time watermark past
        # every open session's (last + gap), flushing the tails
        write_batch("b3.ndjson", [{"user_id": 3, "ts": "2024-01-01 18:00:00"}])
        q.processAllAvailable()
        q.processAllAvailable()  # timeout fires on the trigger after the watermark advances
        rows = spark.sql(
            "SELECT * FROM closed_sessions ORDER BY user_id, session_start"
        ).collect()
        got = [(r.user_id, str(r.session_start), r.n_events) for r in rows]
        assert (1, "2024-01-01 10:00:00", 2) in got
        assert (1, "2024-01-01 12:00:00", 1) in got  # user-1 tail flushed
        assert (2, "2024-01-01 09:00:00", 1) in got  # user-2 tail flushed
    finally:
        q.stop()
