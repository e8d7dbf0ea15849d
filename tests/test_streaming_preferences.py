"""Streaming preference-pair assembly (applyInPandasWithState): the
pair updates across micro-batches and the latest emission per prompt
equals the batch operator over the union of events so far.
"""

from __future__ import annotations

import json


def _write(land, name, rows):
    (land / name).write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )


def test_preference_stream_updates_and_matches_batch(spark, tmp_path):
    from balboa_spark.operators.sft import preference_pairs
    from balboa_spark.streaming.preferences import preference_stream

    land = tmp_path / "ratings"
    land.mkdir()
    b1 = [
        {"prompt_id": 1, "response_id": 10, "response": "a", "score": 5.0},
        {"prompt_id": 1, "response_id": 11, "response": "b", "score": 1.0},
        {"prompt_id": 2, "response_id": 20, "response": "x", "score": 3.0},
        # NaN and equal-only prompts must not emit
        {"prompt_id": 3, "response_id": 30, "response": "n", "score": float("nan")},
    ]
    b2 = [
        # a new best for prompt 1 (tie at 5.0 -> lowest id 9 wins)
        {"prompt_id": 1, "response_id": 9, "response": "c", "score": 5.0},
        # prompt 2 gains a strict preference
        {"prompt_id": 2, "response_id": 21, "response": "y", "score": 7.0},
    ]
    _write(land, "b1.ndjson", b1)

    stream = (
        spark.readStream.schema(
            "prompt_id long, response_id long, response string, score double"
        ).json(str(land))
    )
    q = (
        preference_stream(stream, system_prompt="s")
        .writeStream.format("memory")
        .queryName("pairs_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM pairs_stream").collect()
        # only prompt 1 has a strict preference after batch 1
        assert {r.prompt_id for r in rows} == {1}
        r1 = [r for r in rows if r.prompt_id == 1][-1]
        assert (r1.chosen_id, r1.rejected_id) == (10, 11)
        assert r1.chosen == "<|system|>s<|end|><|user|>1<|end|><|assistant|>a<|end|>"

        _write(land, "b2.ndjson", b2)
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM pairs_stream").collect()
    finally:
        q.stop()

    # the memory sink guarantees no row order; reconstruct the LATEST
    # emission per prompt by the update monotonicity the operator
    # guarantees — the chosen side only ever improves under
    # (score DESC, id ASC), so the final state is the max by
    # (chosen_score, -chosen_id)
    latest = {}
    for r in emitted:
        cur = latest.get(r.prompt_id)
        if cur is None or (r.chosen_score, -r.chosen_id) > (
            cur.chosen_score, -cur.chosen_id
        ):
            latest[r.prompt_id] = r
    # prompt 1 emitted twice (initial pair, then the tie-flip), 2 once
    counts = {}
    for r in emitted:
        counts[r.prompt_id] = counts.get(r.prompt_id, 0) + 1
    assert counts == {1: 2, 2: 1}

    # latest emission per prompt == batch over the union of all events
    all_rows = [
        (r["prompt_id"], r["response_id"], r["response"], r["score"])
        for r in b1 + b2
    ]
    batch = {
        r.prompt_id: r
        for r in preference_pairs(
            spark.createDataFrame(
                all_rows,
                "prompt_id long, response_id long, response string, score double",
            ),
            system_prompt="s",
        ).collect()
    }
    assert set(latest) == set(batch) == {1, 2}
    for p in batch:
        for col in (
            "chosen_id", "rejected_id", "chosen_score",
            "rejected_score", "chosen", "rejected",
        ):
            assert getattr(latest[p], col) == getattr(batch[p], col), (
                p, col,
            )
    # tie in batch 2 flipped prompt 1's chosen to the lower id
    assert latest[1].chosen_id == 9


def test_preference_stream_null_and_string_ids(spark, tmp_path):
    """r16 hardening: (a) a NULL response_id in a micro-batch arrives
    in pandas as NaN (Arrow floats the nullable long column) and must
    be EXCLUDED, not crash the task (ADVICE r15 medium); (b) string
    (UUID-style) ids flow through the derived state/output schemas
    and match the batch twin's string-id tie rule."""
    from balboa_spark.operators.sft import preference_pairs
    from balboa_spark.streaming.preferences import preference_stream

    # --- (a) NULL id in a long-id stream: excluded, query survives ---
    land = tmp_path / "r1"
    land.mkdir()
    _write(
        land,
        "b1.ndjson",
        [
            {"prompt_id": 1, "response_id": None, "response": "ghost", "score": 99.0},
            {"prompt_id": 1, "response_id": 10, "response": "a", "score": 5.0},
            {"prompt_id": 1, "response_id": 11, "response": "b", "score": 1.0},
        ],
    )
    stream = spark.readStream.schema(
        "prompt_id long, response_id long, response string, score double"
    ).json(str(land))
    q = (
        preference_stream(stream)
        .writeStream.format("memory")
        .queryName("pairs_null_id")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM pairs_null_id").collect()
    finally:
        q.stop()
    assert len(rows) == 1
    assert (rows[0].chosen_id, rows[0].rejected_id) == (10, 11)

    # --- (b) string ids: schemas derive from input, ties lexicographic ---
    land2 = tmp_path / "r2"
    land2.mkdir()
    evs = [
        {"prompt_id": 7, "response_id": "ab-1", "response": "t2", "score": 7.0},
        {"prompt_id": 7, "response_id": "aa-2", "response": "t1", "score": 7.0},
        {"prompt_id": 7, "response_id": "zz", "response": "lo", "score": 1.0},
        {"prompt_id": 7, "response_id": None, "response": "ghost", "score": 50.0},
    ]
    _write(land2, "b1.ndjson", evs)
    stream2 = spark.readStream.schema(
        "prompt_id long, response_id string, response string, score double"
    ).json(str(land2))
    q2 = (
        preference_stream(stream2, system_prompt="s")
        .writeStream.format("memory")
        .queryName("pairs_str_id")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q2.processAllAvailable()
        rows2 = spark.sql("SELECT * FROM pairs_str_id").collect()
    finally:
        q2.stop()
    assert len(rows2) == 1
    got = rows2[0]
    batch = preference_pairs(
        spark.createDataFrame(
            [(r["prompt_id"], r["response_id"], r["response"], r["score"]) for r in evs],
            "prompt_id long, response_id string, response string, score double",
        ),
        system_prompt="s",
    ).collect()[0]
    for col in (
        "chosen_id", "rejected_id", "chosen_score",
        "rejected_score", "chosen", "rejected",
    ):
        assert getattr(got, col) == getattr(batch, col), col
    assert got.chosen_id == "aa-2" and got.rejected_id == "zz"
