"""Engine stats counters: the reference reports q/i/e/bytes every 10 s
(backend/lib/engine.c:388,480-514). The Spark analog accumulates
StreamingQueryProgress into the same counter shape; the serving layer
ticks the query counter.
"""

from __future__ import annotations

import time

from balboa_spark.operators.aggregate import aggregate
from balboa_spark.operators.query import Query
from balboa_spark.plans.layout import ObservationStore

from .test_layout_streaming import SURI, seed_obs


def test_stats_listener_counts_inserts_and_queries(spark, tmp_path):
    from balboa_spark.streaming.ingest import ingest_stream
    from balboa_spark.streaming.stats import EngineStatsListener

    listener = EngineStatsListener()
    spark.streams.addListener(listener)
    try:
        land = tmp_path / "land"
        land.mkdir()
        (land / "b1.ndjson").write_text("\n".join(SURI % (i, i) for i in range(3)) + "\n")
        store = ObservationStore(spark, str(tmp_path / "store"), num_buckets=2)
        store.write(aggregate(seed_obs(spark).limit(0)))
        q = ingest_stream(
            spark,
            str(land),
            "suricata_dns",
            stores={"default": store},
            sensor_id="sensorX",
            checkpoint=str(tmp_path / "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # listener bus is async — poll briefly for the progress event
        deadline = time.time() + 20
        while listener.counters.inserts == 0 and time.time() < deadline:
            time.sleep(0.2)
        assert listener.counters.inserts >= 3  # the 3 landed lines
        assert listener.counters.batches >= 1
        assert listener.counters.errors == 0

        listener.count_query()
        store.query(Query(rrname="stream.example.com")).collect()
        snap = listener.counters.snapshot()
        assert snap["queries"] == 1 and snap["uptime_sec"] >= 0
    finally:
        spark.streams.removeListener(listener)
