"""Incremental near-dedup against a persisted signature store.

A training-data pipeline rarely dedups one static corpus: documents
arrive continuously and each batch must be deduplicated against
EVERYTHING already ingested — without recomputing signatures for the
whole history. The store persists the banded MinHash table
``(band_idx, band_hash, id)`` (the exact join key minhash_lsh_pairs
buckets on); a new batch is:

1. band the batch (one pass over batch text only),
2. drop batch docs whose bands collide with a STORED band — a
   key-equi join on (band_idx, band_hash) against the persisted
   table: the batch side is small, the stored side is
   partition-pruned by band_idx and never re-banded,
3. dedup the survivors within the batch (minhash_lsh_pairs +
   connected-components keep-set),
4. append the kept docs' bands to the store.

At 100 TB the stored band table is the only state; it is
O(num_bands × corpus) small rows, appended partitioned by band_idx.
On a cluster, bucketing it by band_hash (bucketBy + saveAsTable)
upgrades step 2 to a shuffle-free bucketed join of a tiny batch side.

Crash semantics: appends are IDEMPOTENT IN EFFECT — re-appending a
batch's bands after a replay only duplicates band rows, and a
duplicate band changes no collision decision (the join is a semi
filter). So plain at-least-once file appends give effectively-once
dedup decisions, without the epoch gate ObservationStore needs for
its count-additive merge.

This composes with streaming ingest via foreachBatch:
``lambda batch, _: sink(store.process_batch(batch))``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from balboa_spark.operators import dedup

MANIFEST = "manifest.json"


class MinHashDedupStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        num_hashes: int = 16,
        num_bands: int = 4,
        k: int = 3,
    ):
        self.spark = spark
        self.path = path
        self.bands_path = os.path.join(path, "bands")
        man_path = os.path.join(path, MANIFEST)
        if os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            if (man["num_hashes"], man["num_bands"], man["k"]) != (
                num_hashes,
                num_bands,
                k,
            ):
                raise ValueError(
                    f"store at {path} was built with "
                    f"{(man['num_hashes'], man['num_bands'], man['k'])}, "
                    f"got {(num_hashes, num_bands, k)}"
                )
        self.num_hashes = num_hashes
        self.num_bands = num_bands
        self.k = k

    def _write_manifest(self) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, MANIFEST), "w") as f:
            json.dump(
                {
                    "num_hashes": self.num_hashes,
                    "num_bands": self.num_bands,
                    "k": self.k,
                },
                f,
            )

    def bands(self) -> DataFrame | None:
        if not os.path.exists(self.bands_path):
            return None
        return self.spark.read.parquet(self.bands_path)

    def _band(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        return dedup.minhash_bands(
            df, text_col, id_col, self.num_hashes, self.num_bands, self.k
        )

    def filter_new(
        self, batch: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """Batch rows that near-dup neither a stored document nor an
        earlier (smaller-id) row of the same batch."""
        nb = self._band(batch, text_col, id_col)
        stored = self.bands()
        if stored is not None:
            hits = (
                nb.join(stored, ["band_idx", "band_hash"], "left_semi")
                .select("id")
                .distinct()
            )
            batch = batch.join(
                hits.withColumnRenamed("id", id_col), id_col, "left_anti"
            )
        pairs = dedup.minhash_lsh_pairs(
            batch, text_col, id_col, self.num_hashes, self.num_bands, self.k
        )
        return dedup.near_dedup_keep(batch, pairs, id_col=id_col)

    def add(self, kept: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> None:
        """Append the kept documents' bands (at-least-once safe: a
        duplicate band row changes no future collision decision)."""
        self._write_manifest()
        (
            self._band(kept, text_col, id_col)
            .repartition("band_idx")
            .write.mode("append")
            .partitionBy("band_idx")
            .parquet(self.bands_path)
        )

    def process_batch(
        self, batch: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """filter_new + add, returning the kept rows (materialized so
        the dedup decision is computed once, not re-derived by both the
        band append and the caller's sink)."""
        kept = self.filter_new(batch, text_col, id_col).localCheckpoint(eager=True)
        self.add(kept, text_col, id_col)
        return kept


class SpanDedupStore:
    """Incremental EXACT span dedup against a persisted window-hash
    history — the cross-batch twin of corpus.span_dedup (keep-first
    Lee et al. semantics over the arrival stream): a batch token span
    is removed iff its window hash was seen in ANY earlier batch, or
    earlier (lower (id, pos)) in the same batch.

    State is the distinct window-hash set, stored partitioned by a
    256-way hex-prefix bucket so the history side of the semi-join is
    partition-prunable; it grows with distinct corpus tokens (the
    exact-dedup price, same as the batch operator's shuffle).

    History records hashes of the INPUT stream (first-seen text), not
    of the rewritten output — so appends are idempotent IN EFFECT: a
    replayed batch's windows all hit history (its documents drop to
    zero surviving tokens and disappear from the output), and the
    re-appended hash rows are duplicates that change no future
    semi-join decision; at-least-once file appends give
    effectively-once decisions (the MinHashDedupStore argument, and
    the replay test pins it).

    Concurrency: one writer (one streaming query) per store path —
    concurrent parquet appends share a _temporary staging dir and can
    clobber each other; multiple feeds should union upstream or
    serialize externally (same single-writer contract as
    MinHashDedupStore).
    """

    def __init__(self, spark: SparkSession, path: str, span_tokens: int = 16):
        self.spark = spark
        self.path = path
        self.hashes_path = os.path.join(path, "hashes")
        man_path = os.path.join(path, MANIFEST)
        if os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            if man["span_tokens"] != span_tokens:
                raise ValueError(
                    f"store at {path} was built with span_tokens="
                    f"{man['span_tokens']}, got {span_tokens}"
                )
        self.span_tokens = span_tokens

    def _write_manifest(self) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, MANIFEST), "w") as f:
            json.dump({"span_tokens": self.span_tokens}, f)

    def hashes(self) -> DataFrame | None:
        if not os.path.exists(self.hashes_path):
            return None
        return self.spark.read.parquet(self.hashes_path)

    def process_batch(
        self, batch: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """Span-dedup the batch against history + itself, append the
        new window hashes, return (id, n_tokens, n_removed,
        clean_text) for documents keeping at least one token."""
        from balboa_spark.operators.corpus import (
            _span_drop_covered,
            _span_non_first,
            _span_windows,
        )
        from balboa_spark.operators.text import tokens

        staged = batch.select(
            F.col(id_col), tokens(F.col(text_col)).alias("_tk")
        ).filter(F.size("_tk") > 0)
        wins = _span_windows(staged, self.span_tokens, id_col).withColumn(
            # letter prefix: a bare hex prefix like "1e" would hit
            # partition-value type INFERENCE on read (NumberFormat /
            # mixed-type dirs); "h1e" is unambiguously a string
            "bucket", F.concat(F.lit("h"), F.substring("_h", 1, 2))
        )
        # one materialization feeds three consumers: history semi-join,
        # batch-internal first-occurrence, and the hash append
        wins = wins.localCheckpoint(eager=True)
        stored = self.hashes()
        if stored is not None:
            hist_removed = wins.join(
                stored, ["bucket", "_h"], "left_semi"
            ).select(id_col, "pos", "_h")
        else:
            hist_removed = wins.filter(F.lit(False)).select(id_col, "pos", "_h")
        batch_removed = _span_non_first(wins.drop("bucket"), id_col).select(
            id_col, "pos", "_h"
        )
        removed = hist_removed.unionByName(batch_removed).select(
            id_col, "pos"
        ).distinct()
        out = _span_drop_covered(staged, removed, self.span_tokens, id_col)
        out = out.localCheckpoint(eager=True)  # decide before the append job
        self._write_manifest()
        # append only hashes NOT already in history: without the
        # anti-join the store grows with total processed tokens (and
        # with every replay) instead of distinct content, and the
        # semi-join right side slows linearly in input volume
        new_hashes = wins.select("bucket", "_h").distinct()
        if stored is not None:
            new_hashes = new_hashes.join(
                stored, ["bucket", "_h"], "left_anti"
            )
        (
            new_hashes.repartition("bucket")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(self.hashes_path)
        )
        return out
