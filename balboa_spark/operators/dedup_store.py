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
