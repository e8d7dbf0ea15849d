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


def test_streaming_sessions_equal_both_batch_arms(spark, tmp_path):
    """r15: the batch twin (gap_sessions) is now adaptive with two
    plan arms; the streaming operator must be equivalent to WHICHEVER
    arm is active — its closed+flushed sessions equal the batch
    (session_start, session_end, n_events) triples under BOTH
    mode='classic' and mode='two_phase'."""
    import datetime as dt

    from pyspark.sql import functions as F

    from balboa_spark.operators.temporal import gap_sessions
    from balboa_spark.streaming.sessions import sessionize_stream

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = []
    eid = 0
    for u in (1, 2, 3):
        t = base
        for step in (0, 5, 40, 2, 90, 1, 24 * 60, 3):  # minutes
            t = t + dt.timedelta(minutes=step)
            rows.append({"user_id": u, "ts": t, "event_id": eid})
            eid += 1
    # split into 3 micro-batches by event order
    land = tmp_path / "ev"
    land.mkdir()
    for b in range(3):
        chunk = rows[b * 8 : (b + 1) * 8]
        (land / f"b{b}.ndjson").write_text(
            "\n".join(
                '{"user_id": %d, "ts": "%s"}'
                % (r["user_id"], r["ts"].strftime("%Y-%m-%d %H:%M:%S"))
                for r in chunk
            )
            + "\n"
        )
    # a far-future sentinel advances the watermark so every tail flushes
    (land / "zz.ndjson").write_text('{"user_id": 99, "ts": "2024-02-01 00:00:00"}\n')

    stream = (
        spark.readStream.schema("user_id long, ts timestamp").json(str(land))
    )
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("eq_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        q.processAllAvailable()
        got = {
            (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
            for r in spark.sql(
                "SELECT * FROM eq_sessions WHERE user_id < 99"
            ).collect()
        }
    finally:
        q.stop()

    df = spark.createDataFrame(
        [(r["user_id"], r["ts"], r["event_id"]) for r in rows],
        "user_id long, ts timestamp, event_id long",
    )
    for mode in ("classic", "two_phase"):
        batch = (
            gap_sessions(df, 30, mode=mode)
            .groupBy("user_id", "conv_id")
            .agg(
                F.min("ts").alias("s"),
                F.max("ts").alias("e"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        want = {
            (r.user_id, str(r.s), str(r.e), r.n) for r in batch.collect()
        }
        assert got == want, f"streaming diverged from batch mode={mode}"
