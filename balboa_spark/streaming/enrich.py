"""Streaming enrichment against the generation store.

A live feed usually needs context from the aggregate store ("has this
rrname been seen before, how often, since when") — the reference
serves that as point queries against its key-value backend; on Spark
the same need is a stream-static join, with one twist: the static
side here is a GENERATION store that a concurrent merge job rewrites.

Correctness rule: resolve the dimension INSIDE foreachBatch, once per
micro-batch. Each batch then joins against exactly one committed
generation (the manifest flip is atomic, so a mid-stream merge lands
between batches, never inside one) — a naive stream-static join built
once at query start would either pin the startup generation forever
(stale) or, worse, list files that a vacuum later deletes mid-run.
Per-batch resolution costs one manifest read; the layout DataFrame
itself comes from the store's per-generation plan cache, so repeated
batches on the same generation reuse the parsed file listing.

The join broadcasts the DIMENSION aggregate — query_many prunes it to
the batch's distinct keys first, so it is the provably small side
(Spark cannot build-broadcast the row-preserved side of a left outer
join; hinting the batch side would be silently dropped and shuffle
both sides). The store scan itself prunes to the batch keys' buckets,
the same pruning the point-query path uses (plans/layout.query_many).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from balboa_spark.plans.layout import ObservationStore


def enrich_batch(
    store: ObservationStore, batch: DataFrame, key_col: str = "rrname"
) -> DataFrame:
    """Join one micro-batch against the CURRENT committed generation:
    every batch row gains the store's aggregate columns (count,
    time_first, time_last ...) for its key, or NULLs when unseen.
    The store side is scanned bucket-pruned via the batch's key list
    (bounded: a micro-batch's distinct keys), and the key-pruned
    dimension aggregate broadcasts — the batch is never shuffled."""
    if key_col not in ("rrname", "rdata"):
        # an unknown key column would silently probe the wrong layout
        # and enrich every row with NULLs — fail loudly instead
        raise ValueError("key_col must be 'rrname' or 'rdata'")
    dim = store.query_many(
        [r[0] for r in batch.select(key_col).distinct().collect()],
        by=key_col,
    )
    agg = dim.groupBy(key_col).agg(
        F.sum("count").alias("seen_count"),
        F.min("first_seen").alias("first_seen"),
        F.max("last_seen").alias("last_seen"),
    )
    # broadcast the DIMENSION aggregate (already pruned to the batch's
    # distinct keys, so it is the provably small side): Spark cannot
    # build-broadcast the row-preserved left side of a LEFT OUTER join
    # — a hint there is silently dropped and both sides shuffle
    return batch.join(F.broadcast(agg), key_col, "left")


def enrich_foreach_batch(
    store: ObservationStore,
    sink: Callable[[DataFrame, int], None],
    key_col: str = "rrname",
):
    """Adapter for ``writeStream.foreachBatch``: resolve the current
    generation per batch, enrich, hand the result to ``sink``."""

    def _fn(batch: DataFrame, epoch: int) -> None:
        sink(enrich_batch(store, batch, key_col=key_col), epoch)

    return _fn
