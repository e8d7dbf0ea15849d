"""Streaming conversation assembly (applyInPandasWithState): closed
conversations must span micro-batches, render through the SAME
template as the batch kernel, and bound state via the turn cap."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def _start(spark, tmp_path, land, **kw):
    from balboa_spark.streaming.conversations import assemble_conversations_stream

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, content string")
        .json(str(land))
    )
    conv = assemble_conversations_stream(stream, system_prompt="sys", **kw)
    return (
        conv.writeStream.format("memory")
        .queryName("closed_convs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )


def test_conversations_span_batches_and_match_batch_render(spark, tmp_path):
    from balboa_spark.operators import sft

    land = tmp_path / "ev"
    land.mkdir()

    def write_batch(name, rows):
        (land / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    # conversation turns split across two micro-batches + a NULL-ts row
    write_batch(
        "b1.ndjson",
        [
            {"user_id": 1, "ts": "2024-01-01 10:00:00", "content": "hi there"},
            {"user_id": 1, "ts": None, "content": "dropped"},
            # NULL content must render as the EMPTY turn, not "None"
            {"user_id": 9, "ts": "2024-01-01 10:00:00", "content": None},
        ],
    )
    q = _start(spark, tmp_path, land)
    try:
        q.processAllAvailable()
        write_batch(
            "b2.ndjson",
            [
                {"user_id": 1, "ts": "2024-01-01 10:05:00", "content": "hello back"},
                # 2h later: closes the first conversation via the gap rule
                {"user_id": 1, "ts": "2024-01-01 12:30:00", "content": "new topic"},
                {"user_id": 9, "ts": "2024-01-01 12:30:00", "content": "closer"},
            ],
        )
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM closed_convs WHERE user_id = 1"
        ).collect()
        assert len(rows) == 1
        got = rows[0]
        assert got.n_turns == 2
        expected = (
            "<|system|>sys<|end|>"
            "<|user|>hi there<|end|>"
            "<|assistant|>hello back<|end|>"
        )
        assert got.rendered == expected
        assert got.total_chars == len(expected)
        assert got.assistant_chars == len("hello back")

        # parity with the BATCH kernel over the same closed window
        batch_events = spark.createDataFrame(
            [
                (1, 1, "2024-01-01 10:00:00", "x", None),
                (2, 1, "2024-01-01 10:05:00", "x", None),
            ],
            "event_id long, user_id long, ts string, event_type string, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
        turns = sft.conversation_turns(
            batch_events,
            content_col=F.when(F.col("event_id") == 1, "hi there").otherwise(
                "hello back"
            ),
        )
        b = sft.render_conversations(turns, system_prompt="sys").first()
        assert b.rendered == got.rendered
        assert b.assistant_chars == got.assistant_chars

        u9 = spark.sql("SELECT * FROM closed_convs WHERE user_id = 9").collect()
        assert len(u9) == 1
        assert u9[0].rendered == "<|system|>sys<|end|><|user|><|end|>"
    finally:
        q.stop()


def test_turn_cap_force_closes_runaway_conversation(spark, tmp_path):
    land = tmp_path / "ev"
    land.mkdir()
    rows = [
        {"user_id": 7, "ts": f"2024-01-01 10:00:{s:02d}", "content": f"m{s}"}
        for s in range(5)
    ]
    (land / "b1.ndjson").write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    q = _start(spark, tmp_path, land, max_open_turns=2)
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT n_turns FROM closed_convs WHERE user_id = 7 ORDER BY conv_start"
        ).collect()
        # 5 rapid turns under a cap of 2: two full conversations close
        # immediately; the fifth stays open (inside gap, under cap)
        assert [r.n_turns for r in got] == [2, 2]
    finally:
        q.stop()


def test_state_survives_query_restart(spark, tmp_path):
    """Keyed conversation state must recover from the checkpoint: a
    conversation opened before a stop() closes correctly after a NEW
    query resumes from the same checkpoint dir."""
    land = tmp_path / "ev"
    land.mkdir()
    (land / "b1.ndjson").write_text(
        json.dumps({"user_id": 3, "ts": "2024-01-01 10:00:00", "content": "one"})
        + "\n"
        + json.dumps({"user_id": 3, "ts": "2024-01-01 10:01:00", "content": "two"})
        + "\n"
    )
    # the memory sink cannot recover from a checkpoint — a FILE sink
    # is the restart-capable shape (and what production would use)
    from balboa_spark.streaming.conversations import assemble_conversations_stream

    out = str(tmp_path / "convs")

    def start_file_sink():
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, content string")
            .json(str(land))
        )
        return (
            assemble_conversations_stream(stream, system_prompt="sys")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    q = start_file_sink()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # resume from the SAME checkpoint; a 2h-later event closes the
    # conversation opened before the restart
    (land / "b2.ndjson").write_text(
        json.dumps({"user_id": 3, "ts": "2024-01-01 12:30:00", "content": "later"})
        + "\n"
    )
    q2 = start_file_sink()
    try:
        q2.processAllAvailable()
        rows = spark.read.parquet(out).filter("user_id = 3").collect()
        assert len(rows) == 1
        assert rows[0].n_turns == 2
        assert rows[0].rendered.endswith(
            "<|user|>one<|end|><|assistant|>two<|end|>"
        )
    finally:
        q2.stop()


def test_late_in_watermark_event_slots_into_ts_order(spark, tmp_path):
    """A late-but-in-watermark event arriving in a LATER micro-batch
    must merge into the buffered open conversation in ts order — the
    render reads chronologically, not in arrival order, and last_us
    must not move backwards (ADVICE r13)."""
    land = tmp_path / "ev"
    land.mkdir()
    (land / "b1.ndjson").write_text(
        json.dumps({"user_id": 5, "ts": "2024-01-01 10:00:00", "content": "first"})
        + "\n"
        + json.dumps({"user_id": 5, "ts": "2024-01-01 10:06:00", "content": "third"})
        + "\n"
    )
    q = _start(spark, tmp_path, land)
    try:
        q.processAllAvailable()
        # arrives AFTER the 10:06 turn but belongs between the two
        (land / "b2.ndjson").write_text(
            json.dumps(
                {"user_id": 5, "ts": "2024-01-01 10:03:00", "content": "second"}
            )
            + "\n"
        )
        q.processAllAvailable()
        # 2h later: closes the conversation via the gap rule
        (land / "b3.ndjson").write_text(
            json.dumps(
                {"user_id": 5, "ts": "2024-01-01 12:30:00", "content": "new"}
            )
            + "\n"
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM closed_convs WHERE user_id = 5").collect()
        assert len(rows) == 1
        assert rows[0].n_turns == 3
        assert rows[0].rendered == (
            "<|system|>sys<|end|>"
            "<|user|>first<|end|>"
            "<|assistant|>second<|end|>"
            "<|user|>third<|end|>"
        )
    finally:
        q.stop()
