"""Streaming heavy-hitter tracking over micro-batches.

The batch-side key-skew tools (plans/skew.py) answer "which keys are
hot" with an exact keys-sized pass; on an unbounded stream that pass
is impossible, so this monitor keeps TWO pieces of bounded state per
tracked column and folds every micro-batch into them:

- a count-min sketch (operators/aggregate.frequency_sketch) — linear,
  so per-batch sketches merge counter-wise into the all-time sketch
  with zero error growth beyond the sketch's own eps*N bound;
- a candidate set: the exact per-batch top-k keys. A key that is ever
  globally heavy must be heavy in some batch (batch top-k is a
  superset generator of sustained heavy hitters at the monitor's k),
  so probing the all-time sketch with the accumulated candidates
  recovers the global top-k without ever holding per-key state for
  the full key universe. The candidate set is capped (drop the
  lowest-estimate candidates first) so state stays parameter-sized.

Commit model: the same atomic manifest flip as every other persisted
artifact (plans/genstore) — state is a tiny JSON blob (sketch bytes
base64 + candidates), written per batch, crash-safe by rename. The
per-batch work is one count_min_sketch aggregate + one exact batch
top-k (both map-side combined, shuffle volume = batch's distinct
keys), composing with foreachBatch like the other incremental stores.
"""

from __future__ import annotations

import base64
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

    def _state(self) -> dict | None:
        p = os.path.join(self.path, STATE)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def update(self, batch: DataFrame) -> None:
        """Fold one micro-batch into the persisted state. Replay-safe
        in effect for ranking: a re-applied batch inflates counts but
        cannot invent a heavy key that was never heavy."""
        sk = frequency_sketch(
            batch, self.key_col, self.eps, self.confidence, self.seed
        )
        batch_top = [
            r[self.key_col]
            for r in (
                batch.groupBy(self.key_col)
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), self.key_col)
                .limit(self.batch_topk)
                .collect()
            )
        ]
        st = self._state()
        if st is not None:
            sk = merge_frequency_sketches(
                self.spark, base64.b64decode(st["sketch"]), sk
            )
            cands = set(st["candidates"]) | set(batch_top)
        else:
            cands = set(batch_top)
        if len(cands) > self.max_candidates:
            est = estimate_frequencies(self.spark, sk, sorted(cands))
            kept = sorted(est, key=lambda c: (-est[c], c))[
                : self.max_candidates
            ]
            cands = set(kept)
        flip_manifest(
            self.path,
            {
                "sketch": base64.b64encode(sk).decode("ascii"),
                "candidates": sorted(cands),
                "key_col": self.key_col,
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

    def foreach_batch(self):
        """Adapter for writeStream.foreachBatch."""

        def _fn(batch: DataFrame, _epoch: int) -> None:
            self.update(batch)

        return _fn
