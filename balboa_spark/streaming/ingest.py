"""T1-T5: continuous ingest — the Spark restatement of `balboa serve`
(cmd/balboa/cmds/serve.go:131-150; SURVEY §3.1).

Reference pipeline: feeder -> parse -> channel -> selector engine ->
tag-routed backends -> merge-upsert. Here:

    readStream (text/json landing dir, or Kafka)
      -> format normalizer (sources/registry)
      -> selector tagging stage (streaming/selectors)
      -> foreachBatch: per-route fold into each ObservationStore

Design decisions (SURVEY §2.9):
- T2: the fold is associative+commutative, so late/out-of-order data
  cannot change results — NO watermark and NO stream-state aggregation.
  State lives in the table, not the stream: each micro-batch is folded
  into the store (MERGE-into pattern; plain-Parquet rewrite locally,
  Delta/Iceberg MERGE INTO on a real deployment).
- T4: backpressure via maxFilesPerTrigger (the reference's bounded
  channel, input_observation.go:27-31, is engine-internal here).
- T5: the store's manifest records the last applied epoch_id, and the
  epoch gate flips atomically with the data generation — a replayed
  micro-batch (crash between a route's merge and the checkpoint
  commit, or between the sequential per-route merges) is a no-op, so
  the count-additive fold cannot double-count. This upgrades the
  reference's documented at-least-once caveat (backend/PROTOCOL.md:31)
  to exactly-once per store.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from balboa_spark.plans.layout import ObservationStore
from balboa_spark.sources.registry import normalize_json_lines
from balboa_spark.streaming.selectors import route as route_fn


def ingest_stream(
    spark: SparkSession,
    input_path: str,
    fmt: str,
    stores: dict[str, ObservationStore],
    routes: dict[str, Sequence[str]] | None = None,
    selector: Callable[[DataFrame], DataFrame] | None = None,
    sensor_id=None,
    checkpoint: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """Start a streaming ingest job; returns the StreamingQuery.

    stores: route name -> ObservationStore. With routes=None a single
    route "default" receiving everything is assumed.
    """
    if routes is None:
        routes = {name: [] for name in stores}
    unknown = set(routes) - set(stores)
    if unknown:
        raise ValueError(f"routes without stores: {sorted(unknown)}")

    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.load(input_path)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        obs = normalize_json_lines(batch_df, fmt, sensor_id=sensor_id)
        if selector is not None:
            obs = selector(obs)
        elif "tags" not in obs.columns:
            from pyspark.sql import functions as F

            obs = obs.withColumn("tags", F.array().cast("array<string>"))
        obs = obs.localCheckpoint(eager=True)  # parse once, not once per route
        for name, tagged in route_fn(obs, routes).items():
            stores[name].merge(tagged, epoch_id=epoch_id)

    writer = lines.writeStream.foreachBatch(process_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def ingest_files(
    spark: SparkSession,
    input_path: str,
    fmt: str,
    store: ObservationStore,
    selector: Callable[[DataFrame], DataFrame] | None = None,
    sensor_id=None,
) -> None:
    """Batch (re)ingest of a landing directory — the replay/backfill
    path (S6 analog) sharing the exact same normalize/tag/fold code."""
    lines = spark.read.format("text").load(input_path)
    obs = normalize_json_lines(lines, fmt, sensor_id=sensor_id)
    if selector is not None:
        obs = selector(obs)
    store.merge(obs.drop("tags") if "tags" in obs.columns else obs)
