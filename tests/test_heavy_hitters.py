"""Streaming heavy-hitter monitor (balboa_spark.streaming.heavy_hitters)."""

from __future__ import annotations

import json

from balboa_spark.streaming.heavy_hitters import HeavyHitterMonitor


def _batch(spark, spec: dict[str, int]):
    rows = [(k,) for k, n in spec.items() for _ in range(n)]
    return spark.createDataFrame(rows, ["k"])


def test_monitor_accumulates_across_batches(spark, tmp_path):
    mon = HeavyHitterMonitor(spark, str(tmp_path / "hh"), "k", batch_topk=3)
    mon.update(_batch(spark, {"a": 30, "b": 10, "c": 1}))
    mon.update(_batch(spark, {"b": 25, "d": 8, "e": 1}))
    mon.update(_batch(spark, {"a": 5, "d": 20}))
    # all-time truth: a=35, b=35, c=1, d=28, e=1
    top = mon.topk(3)
    assert top == [("a", 35), ("b", 35), ("d", 28)]


def test_monitor_candidate_cap_keeps_heaviest(spark, tmp_path):
    mon = HeavyHitterMonitor(
        spark, str(tmp_path / "hh2"), "k", batch_topk=5, max_candidates=4
    )
    mon.update(_batch(spark, {"h1": 50, "h2": 40, "x1": 2, "x2": 2, "x3": 2}))
    mon.update(_batch(spark, {"h3": 60, "x4": 1, "x5": 1, "x6": 1, "x7": 1}))
    top = mon.topk(3)
    assert top == [("h3", 60), ("h1", 50), ("h2", 40)]
    # state is bounded: at most max_candidates survive
    st = json.load(open(tmp_path / "hh2" / "state.json"))
    assert len(st["candidates"]) <= 4


def test_monitor_streaming_e2e(spark, tmp_path):
    land = tmp_path / "land"
    land.mkdir()
    mon = HeavyHitterMonitor(spark, str(tmp_path / "hh3"), "k", batch_topk=3)

    def lines(spec):
        return "\n".join(
            json.dumps({"k": k}) for k, n in spec.items() for _ in range(n)
        )

    (land / "b1.ndjson").write_text(lines({"hot": 20, "warm": 5}))
    stream = spark.readStream.schema("k string").json(str(land))
    q = (
        stream.writeStream.foreachBatch(mon.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        (land / "b2.ndjson").write_text(lines({"hot": 15, "new": 9}))
        q.processAllAvailable()
        (land / "b3.ndjson").write_text(lines({"warm": 12, "late": 3}))
        q.processAllAvailable()
    finally:
        q.stop()
    # pinned all-time truth after the deterministic 3-batch replay:
    # hot=35, warm=17, new=9, late=3 — the candidate recovery
    # guarantee (any key in some batch's top-k is probe-able later)
    # and the sketch's exactness at this cardinality, end to end
    assert mon.topk(4) == [("hot", 35), ("warm", 17), ("new", 9), ("late", 3)]


def test_monitor_epoch_replay_is_exactly_once(spark, tmp_path):
    """A re-delivered foreachBatch epoch (crash between state flip and
    checkpoint commit) must not double-count — double counts could
    reorder genuinely heavy keys, not just inflate them."""
    mon = HeavyHitterMonitor(spark, str(tmp_path / "hh4"), "k", batch_topk=3)
    mon.update(_batch(spark, {"a": 30}), epoch_id=0)
    mon.update(_batch(spark, {"b": 20}), epoch_id=1)
    mon.update(_batch(spark, {"b": 20}), epoch_id=1)  # replay
    assert mon.topk(2) == [("a", 30), ("b", 20)]


def test_monitor_concurrent_multi_stream_updates_lose_nothing(spark, tmp_path):
    """Two streaming queries feeding ONE monitor concurrently (the
    documented multi-stream shape). update() is a read-modify-write of
    state.json; without the flock serializing the fold, two interleaved
    updates both read the same base state and the loser's counts (and
    epoch gate) vanish on the second flip."""
    import threading

    mon = HeavyHitterMonitor(spark, str(tmp_path / "hh6"), "k", batch_topk=3)
    errs: list[Exception] = []

    def feed(stream_id, batches):
        try:
            for ep, spec in enumerate(batches):
                mon.update(_batch(spark, spec), epoch_id=ep, stream_id=stream_id)
        except Exception as e:  # pragma: no cover - surfaced via assert
            errs.append(e)

    ta = threading.Thread(target=feed, args=("qA", [{"a": 5}, {"a": 7}, {"b": 3}]))
    tb = threading.Thread(target=feed, args=("qB", [{"a": 4}, {"c": 6}, {"b": 2}]))
    ta.start()
    tb.start()
    ta.join()
    tb.join()
    assert not errs
    # exact sums: a=16, c=6, b=5 — any lost update shows up as a deficit
    assert mon.topk(3) == [("a", 16), ("c", 6), ("b", 5)]
    # both streams' replay gates survived the interleaving
    mon.update(_batch(spark, {"a": 100}), epoch_id=2, stream_id="qA")  # replay
    mon.update(_batch(spark, {"a": 100}), epoch_id=2, stream_id="qB")  # replay
    assert mon.topk(1) == [("a", 16)]


def test_monitor_epoch_gates_are_per_stream_and_survive_flips(spark, tmp_path):
    mon = HeavyHitterMonitor(spark, str(tmp_path / "hh5"), "k", batch_topk=3)
    mon.update(_batch(spark, {"a": 10}), epoch_id=0, stream_id="qA")
    # stream B's epoch 0 is NOT a replay of stream A's
    mon.update(_batch(spark, {"a": 10}), epoch_id=0, stream_id="qB")
    assert mon.topk(1) == [("a", 20)]
    # an epoch-less ad-hoc update must not erase the gates...
    mon.update(_batch(spark, {"b": 5}))
    # ...so a replay of A's epoch 0 is still skipped afterwards
    mon.update(_batch(spark, {"a": 10}), epoch_id=0, stream_id="qA")
    assert mon.topk(2) == [("a", 20), ("b", 5)]
