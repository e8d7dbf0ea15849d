"""Streaming heavy-hitter tracking over micro-batches.

The batch-side key-skew tools (plans/skew.py) answer "which keys are
hot" with an exact keys-sized pass; on an unbounded stream that pass
is impossible, so this monitor keeps TWO pieces of bounded state per
tracked column and folds every micro-batch into them:

- a count-min sketch (operators/aggregate.frequency_sketch) — linear,
  so per-batch sketches merge counter-wise into the all-time sketch
  with zero error growth beyond the sketch's own eps*N bound;
- a candidate set: the exact per-batch top-k keys. The guarantee this
  carries (and no more): a key whose ALL-TIME share exceeds
  1 / batch_topk must, by pigeonhole, exceed that share in at least
  one batch — and fewer than batch_topk keys can exceed share
  1 / batch_topk within a batch, so there it lands inside that
  batch's top-k and enters the candidates. Size batch_topk as
  1 / (the smallest share you must never miss); keys below that
  share can evade any bounded-candidate scheme of this size. Probing
  the all-time sketch with the candidates then recovers the global
  top-k without per-key state for the full key universe. The set is
  capped by all-time estimate (drop lowest first) so state stays
  parameter-sized.

Commit model: the same atomic manifest flip as every other persisted
artifact (plans/genstore) — state is a tiny JSON blob (sketch bytes
base64 + candidates), written per batch, crash-safe by rename. The
per-batch work is one count_min_sketch aggregate + one exact batch
top-k (both map-side combined, shuffle volume = batch's distinct
keys), composing with foreachBatch like the other incremental stores.
"""

from __future__ import annotations

import base64
import contextlib
import fcntl
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from balboa_spark.operators.aggregate import (
    estimate_frequencies,
    frequency_sketch,
    merge_frequency_sketches,
)
from balboa_spark.plans.genstore import flip_manifest

STATE = "state.json"
LOCK = "state.lock"


class HeavyHitterMonitor:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str,
        batch_topk: int = 20,
        max_candidates: int = 200,
        eps: float = 1e-4,
        confidence: float = 0.99,
        seed: int = 42,
    ):
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self.batch_topk = batch_topk
        self.max_candidates = max_candidates
        self.eps = eps
        self.confidence = confidence
        self.seed = seed

    @contextlib.contextmanager
    def _update_lock(self):
        """Exclusive flock held across the read-modify-flip in
        ``update``. The manifest flip makes each write atomic, but two
        concurrent updates (the documented multi-stream shape: several
        queries' foreachBatch feeding one monitor) could both read the
        same state and both flip — the loser's sketch counts and its
        epoch gate would vanish, silently reopening that stream's
        replay window. flock serializes the whole fold across threads
        AND processes on a POSIX filesystem; on a pathless/object
        store, updates need external serialization instead."""
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, LOCK), "w") as fh:
            fcntl.flock(fh, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(fh, fcntl.LOCK_UN)

    def _state(self) -> dict | None:
        p = os.path.join(self.path, STATE)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def update(
        self,
        batch: DataFrame,
        epoch_id: int | None = None,
        stream_id: str = "default",
    ) -> None:
        """Fold one micro-batch into the persisted state. Pass the
        foreachBatch ``epoch_id`` to make replays EXACTLY-once: the
        state records the last applied epoch inside the same atomic
        flip, so a batch re-delivered after a crash between the state
        flip and the streaming checkpoint commit is skipped instead of
        double-counted (double-counting would not just inflate counts
        — it could reorder genuinely heavy keys). Epochs are tracked
        PER STREAM (same contract as ObservationStore.merge): two
        queries feeding one monitor do not gate each other, and a
        query restarted with a FRESH checkpoint must pass a new
        stream_id — foreachBatch epochs restart at 0, and the old
        stream's gate would silently swallow the first batch.

        Concurrent updates are serialized by an exclusive file lock,
        but only the read-merge-flip critical section holds it: the
        batch-local sketch build and top-k (Spark jobs depending only
        on the batch) run BEFORE acquiring the lock, so N streams'
        per-batch aggregations proceed concurrently and only the
        (driver-cheap) state fold serializes. The epoch gate is
        checked twice — a cheap pre-check to skip a replayed batch's
        Spark jobs entirely, and the authoritative re-check under the
        lock."""
        if epoch_id is not None:
            st0 = self._state()
            gates0 = (st0 or {}).get("last_epochs") or {}
            if gates0.get(stream_id) == epoch_id:
                return
        sk = frequency_sketch(
            batch, self.key_col, self.eps, self.confidence, self.seed
        )
        batch_cands = {
            r[self.key_col]
            for r in (
                batch.groupBy(self.key_col)
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), self.key_col)
                .limit(self.batch_topk)
                .collect()
            )
        }
        with self._update_lock():
            self._fold_locked(sk, batch_cands, epoch_id, stream_id)

    def _fold_locked(
        self,
        sk: bytes,
        batch_cands: set,
        epoch_id: int | None,
        stream_id: str,
    ) -> None:
        st = self._state()
        gates = dict((st or {}).get("last_epochs") or {})
        if epoch_id is not None and gates.get(stream_id) == epoch_id:
            return
        if st is not None:
            sk = merge_frequency_sketches(
                self.spark, base64.b64decode(st["sketch"]), sk
            )
            cands = set(st["candidates"]) | batch_cands
        else:
            cands = batch_cands
        if len(cands) > self.max_candidates:
            est = estimate_frequencies(self.spark, sk, sorted(cands))
            kept = sorted(est, key=lambda c: (-est[c], c))[
                : self.max_candidates
            ]
            cands = set(kept)
        # epoch gates for OTHER streams (and this one, when the update
        # carries no epoch) must survive every flip — dropping one
        # would reopen the replay window it had closed
        if epoch_id is not None:
            gates[stream_id] = epoch_id
        flip_manifest(
            self.path,
            {
                "sketch": base64.b64encode(sk).decode("ascii"),
                "candidates": sorted(cands),
                "key_col": self.key_col,
                "last_epochs": gates,
            },
            STATE,
        )

    def topk(self, k: int = 10) -> list[tuple[str, int]]:
        """All-time heavy hitters: probe the merged sketch with the
        accumulated candidates. Driver-side, O(#candidates)."""
        st = self._state()
        if st is None:
            return []
        est = estimate_frequencies(
            self.spark,
            base64.b64decode(st["sketch"]),
            st["candidates"],
        )
        return sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def foreach_batch(self, stream_id: str = "default"):
        """Adapter for writeStream.foreachBatch. Pass a distinct
        ``stream_id`` per streaming query (and per checkpoint
        lifetime) so the replay gates stay independent."""

        def _fn(batch: DataFrame, epoch: int) -> None:
            self.update(batch, epoch_id=epoch, stream_id=stream_id)

        return _fn
