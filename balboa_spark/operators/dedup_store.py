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
dedup DECISIONS, without the epoch gate ObservationStore needs for
its count-additive merge.

BUT idempotent decisions alone do not close the TORN-BATCH window
(r10; ordered r7-r9): in the streaming composition
``lambda batch, e: sink(store.process_batch(batch, epoch_id=e))``
a crash AFTER the store append but BEFORE the sink commit replays
the batch against a history that already contains the batch's own
hashes — every document then collides with itself, the replay
output is empty, and the batch is silently LOST from the sink
(at-most-once, not effectively-once). The fix is epoch-scoped
state: pass ``epoch_id`` and appends land under an
``epoch=<id>`` partition directory (overwritten on replay, so a
torn append self-heals), while decisions read history EXCLUDING
the current epoch — the replay sees exactly the history the first
attempt saw, and the kept-set is replay-stable no matter where the
previous attempt died. Without ``epoch_id`` (one-shot batch use)
appends land under a fresh auto-numbered epoch and nothing is
excluded — the old behavior.

This composes with streaming ingest via foreachBatch:
``lambda batch, e: sink(store.process_batch(batch, epoch_id=e))``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from balboa_spark.operators import dedup

MANIFEST = "manifest.json"

#: On-disk format version. v2 (r10): epoch state dirs are scoped
#: strings ``epoch=<stream>-<n>`` so two StreamingQueries (each with
#: its own foreachBatch epoch counter) or a checkpoint-reset restart
#: can never overwrite each other's committed history — the
#: destructive-epoch-reuse bug a bare integer epoch invites. Stores
#: written by the unversioned pre-r10 layout are rejected with a
#: rebuild error (no silent partition-structure conflicts).
STORE_FORMAT = 2


def _epoch_scope(epoch_id: int, stream_id: str) -> str:
    """Partition value for one stream's epoch: sanitized stream id +
    the numeric epoch. Sanitization keeps the value filesystem- and
    partition-encoding-friendly; distinct streams that sanitize equal
    (a 40-char prefix collision of punctuation-heavy ids) fall back
    to the single-writer contract."""
    import re as _re

    tag = _re.sub(r"[^A-Za-z0-9_.]", "_", stream_id)[:40] or "default"
    return f"{tag}-{int(epoch_id)}"


def _check_format(path: str) -> None:
    man_path = os.path.join(path, MANIFEST)
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if man.get("format") != STORE_FORMAT:
            raise ValueError(
                f"store at {path} uses on-disk format "
                f"{man.get('format', 1)} (this build reads "
                f"{STORE_FORMAT}); rebuild it by re-processing the "
                "corpus — there is no in-place migration"
            )


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
        _check_format(path)
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
                    "format": STORE_FORMAT,
                    "num_hashes": self.num_hashes,
                    "num_bands": self.num_bands,
                    "k": self.k,
                },
                f,
            )

    def _next_epoch(self, state_path: str) -> int:
        """Fresh auto-epoch for one-shot batch callers: one past the
        largest existing ``auto-N`` epoch directory."""
        if not os.path.exists(state_path):
            return 0
        eps = [
            int(d.rsplit("-", 1)[1])
            for d in os.listdir(state_path)
            if d.startswith("epoch=auto-") and d.rsplit("-", 1)[1].isdigit()
        ]
        return (max(eps) + 1) if eps else 0

    def bands(self, exclude_scope: str | None = None) -> DataFrame | None:
        if not os.path.exists(self.bands_path):
            return None
        df = self.spark.read.parquet(self.bands_path)
        if exclude_scope is not None and "epoch" in df.columns:
            # partition-pruned: epoch is a partition column
            df = df.filter(F.col("epoch") != exclude_scope)
        return df

    def _band(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        return dedup.minhash_bands(
            df, text_col, id_col, self.num_hashes, self.num_bands, self.k
        )

    def filter_new(
        self,
        batch: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        epoch_id: int | None = None,
        stream_id: str = "default",
    ) -> DataFrame:
        """Batch rows that near-dup neither a stored document nor an
        earlier (smaller-id) row of the same batch. ``(stream_id,
        epoch_id)`` excludes that stream-epoch's own bands from
        history so a replayed epoch makes the identical decisions
        (torn-batch safety); epochs are scoped per stream so another
        feeder's (or a checkpoint-reset restart's) equal epoch number
        can never be mistaken for this one."""
        nb = self._band(batch, text_col, id_col)
        scope = None if epoch_id is None else _epoch_scope(epoch_id, stream_id)
        stored = self.bands(exclude_scope=scope)
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

    def add(
        self,
        kept: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        epoch_id: int | None = None,
        stream_id: str = "default",
    ) -> None:
        """Write the kept documents' bands under their stream-scoped
        epoch directory (mode=overwrite: a replay of the same epoch
        rewrites the same state, so a torn previous append
        self-heals; a duplicate band row would change no collision
        decision anyway)."""
        self._write_manifest()
        scope = (
            f"auto-{self._next_epoch(self.bands_path)}"
            if epoch_id is None
            else _epoch_scope(epoch_id, stream_id)
        )
        (
            self._band(kept, text_col, id_col)
            .repartition("band_idx")
            .write.mode("overwrite")
            .partitionBy("band_idx")
            .parquet(os.path.join(self.bands_path, f"epoch={scope}"))
        )

    def process_batch(
        self,
        batch: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        epoch_id: int | None = None,
        stream_id: str = "default",
    ) -> DataFrame:
        """filter_new + add, returning the kept rows (materialized so
        the dedup decision is computed once, not re-derived by both the
        band append and the caller's sink). Pass the foreachBatch
        ``epoch_id`` (plus the stream's id when several queries share
        the store) for replay-stable decisions across the torn-batch
        window (module docstring)."""
        kept = self.filter_new(
            batch, text_col, id_col, epoch_id=epoch_id, stream_id=stream_id
        ).localCheckpoint(eager=True)
        self.add(kept, text_col, id_col, epoch_id=epoch_id, stream_id=stream_id)
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
    of the rewritten output. Replay safety is EPOCH-SCOPED (r10, see
    module docstring): with ``epoch_id`` passed, decisions exclude the
    current epoch's own hashes and the epoch write is an overwrite —
    a replayed epoch reproduces the one-shot output byte-for-byte no
    matter where the previous attempt crashed (the torn-batch test
    pins it). Without ``epoch_id`` a replayed batch's windows all hit
    history and its documents vanish from the replay output — the
    decisions stay once-only, but the DELIVERY is lost; one-shot
    batch callers don't replay, streaming callers must pass the
    epoch.

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
        _check_format(path)
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
            json.dump(
                {"format": STORE_FORMAT, "span_tokens": self.span_tokens}, f
            )

    _next_epoch = MinHashDedupStore._next_epoch

    def hashes(self, exclude_scope: str | None = None) -> DataFrame | None:
        if not os.path.exists(self.hashes_path):
            return None
        df = self.spark.read.parquet(self.hashes_path)
        if exclude_scope is not None and "epoch" in df.columns:
            df = df.filter(F.col("epoch") != exclude_scope)
        return df

    def process_batch(
        self,
        batch: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        epoch_id: int | None = None,
        stream_id: str = "default",
    ) -> DataFrame:
        """Span-dedup the batch against history + itself, write the
        new window hashes under the stream-scoped epoch directory,
        return (id, n_tokens, n_removed, clean_text) for documents
        keeping at least one token. Pass the foreachBatch
        ``epoch_id`` (plus ``stream_id`` when several queries share
        the store) for replay-stable decisions across the torn-batch
        window (module docstring): history excludes the current
        stream-epoch, and the epoch write is an overwrite, so a
        replay after a torn append makes identical decisions and
        rewrites identical state."""
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
        scope = None if epoch_id is None else _epoch_scope(epoch_id, stream_id)
        stored = self.hashes(exclude_scope=scope)
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
        ep_scope = (
            f"auto-{self._next_epoch(self.hashes_path)}"
            if epoch_id is None
            else scope
        )
        (
            new_hashes.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(self.hashes_path, f"epoch={ep_scope}"))
        )
        return out
