"""Incremental dedup store: batches dedup against everything already
ingested via the persisted band table, composing with streaming
foreachBatch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from balboa_spark.operators.dedup_store import MinHashDedupStore


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog again and again"
NEAR = "the quick brown fox jumps over the lazy dog again and"  # 1 token off
FRESH = "completely different content about distributed query engines"


def test_cross_batch_near_dup_dropped(spark, tmp_path):
    store = MinHashDedupStore(spark, str(tmp_path / "ds"))

    kept1 = store.process_batch(_docs(spark, [(1, BASE), (2, FRESH)]))
    assert sorted(r.doc_id for r in kept1.collect()) == [1, 2]

    # batch 2: a near-dup of doc 1, an exact dup of doc 2, a new doc
    kept2 = store.process_batch(
        _docs(
            spark,
            [(10, NEAR), (11, FRESH), (12, "some genuinely novel text here today")],
        )
    )
    assert sorted(r.doc_id for r in kept2.collect()) == [12]


def test_intra_batch_dedup_keeps_min_id(spark, tmp_path):
    store = MinHashDedupStore(spark, str(tmp_path / "ds"))
    kept = store.process_batch(_docs(spark, [(5, BASE), (3, BASE), (7, FRESH)]))
    assert sorted(r.doc_id for r in kept.collect()) == [3, 7]


def test_replayed_append_changes_no_decision(spark, tmp_path):
    """At-least-once band appends are idempotent in effect."""
    store = MinHashDedupStore(spark, str(tmp_path / "ds"))
    kept = store.process_batch(_docs(spark, [(1, BASE)]))
    store.add(kept)  # replay the append (duplicate band rows)
    kept2 = store.process_batch(_docs(spark, [(2, NEAR), (3, FRESH)]))
    assert sorted(r.doc_id for r in kept2.collect()) == [3]


def test_param_mismatch_rejected(spark, tmp_path):
    store = MinHashDedupStore(spark, str(tmp_path / "ds"))
    store.process_batch(_docs(spark, [(1, BASE)]))
    with pytest.raises(ValueError, match="was built with"):
        MinHashDedupStore(spark, str(tmp_path / "ds"), num_bands=8)


def test_streaming_foreachbatch_dedup(spark, tmp_path):
    """The composition a pipeline actually runs: landed NDJSON files ->
    micro-batches -> incremental dedup -> clean sink."""
    import json

    land = tmp_path / "land"
    land.mkdir()
    out = str(tmp_path / "clean")
    store = MinHashDedupStore(spark, str(tmp_path / "ds"))

    def doc_line(i, text):
        return json.dumps({"doc_id": i, "text": text})

    (land / "b1.ndjson").write_text(doc_line(1, BASE) + "\n" + doc_line(2, FRESH) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .json(str(land))
    )

    def sink(batch, _epoch):
        kept = store.process_batch(batch)
        kept.write.mode("append").parquet(out)

    q = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    try:
        q.processAllAvailable()
        (land / "b2.ndjson").write_text(
            doc_line(10, NEAR) + "\n" + doc_line(12, "novel second batch text entirely") + "\n"
        )
        q.processAllAvailable()
    finally:
        q.stop()

    clean = spark.read.parquet(out)
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2, 12]
