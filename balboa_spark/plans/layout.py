"""Dual sorted/bucketed storage layout + index-selection query planner.

The reference stores every aggregate twice in one RocksDB keyspace:
forward keys ``o\\x1f<rrname>\\x1f<sensor_id>\\x1f<rrtype>\\x1f<rdata>``
(rocksdb-impl.c:772-783) and inverted index keys
``i\\x1f<rdata>\\x1f<sensor_id>\\x1f<rrname>\\x1f<rrtype>`` (:789-800);
the Cassandra schema spells the same design as two clustering orders
(doc/cassandra_schema.txt:6-40). Lexicographic key order gives prefix
seeks with early termination (:293-294,345-354).

Columnar restatement: two Parquet copies of the aggregate table,
- ``by_rrname/`` hash-bucketed on rrname (directory partition
  ``bucket=NN``) and sorted within files by the forward key order;
- ``by_rdata/`` bucketed on rdata, sorted by the inverted key order.

A point lookup then (a) prunes to ONE bucket directory via the
partition filter, and (b) skips row groups inside it via Parquet
min/max on the leading sort column — the columnar analog of prefix
seek + early break. Unlike the reference's inverted keys (empty
values, requiring a second point-get per hit, :542-565), the inverted
copy carries full values: columnar storage makes the duplication cheap
(zstd over sorted columns) and removes the double lookup.

Consistency model (fixes two round-1 defects):

- Every write lands in a fresh generation directory ``gen-<n>/``; the
  only commit point is an atomic rename of ``manifest.json`` pointing
  readers at the new generation. A crash mid-write leaves the old
  generation fully intact — there is no window where forward and
  inverted layouts disagree (the round-1 swap moved three paths
  sequentially).
- ``merge`` is *selective*: it computes the set of hash buckets the
  batch's keys fall in, re-folds ONLY those partitions (partition
  pruning makes the read proportional to the touched buckets), writes
  them into the new generation, and hard-links the untouched bucket
  directories from the previous generation (metadata-only, no data
  copy). Merge cost therefore scales with batch size, not store size
  — the columnar analog of RocksDB merge touching only written keys
  (rocksdb-impl.c:812-822). On an object store the links become
  manifest file-list entries (the Iceberg/Delta pattern).
- The manifest records ``last_epoch``: a replayed micro-batch (crash
  between the checkpoint commit and a route's merge) is skipped, which
  upgrades the reference's documented at-least-once double-count
  caveat (backend/PROTOCOL.md:31) to exactly-once per store — the
  epoch gate and the data flip are the same atomic rename.

Scale: bucket count is a constructor knob — 8 for local tests, 4096 at
100 TB so a bucket is ~25 GB and a point query touches 1/4096 of the
data. Writes repartition by the bucket expression so each task writes
exactly one file per bucket (no small-file explosion).

LSM write path (r10): ``merge`` re-folds every bucket a batch touches,
and passive-DNS keys are uniform, so any real micro-batch touches ALL
buckets — per-batch merge cost grows with the STORE, which is wrong
for a high-frequency stream against a 100 TB table. ``append_delta``
is the O(batch) alternative: the batch folds batch-locally and lands
as an immutable ``delta-<seq>/`` pair of bucketed+sorted layouts;
reads fold base UNION deltas on the fly (associativity of the
group-merge makes that byte-identical to merge()'s result) with
``bucket`` kept as a grouping key so point queries stay bucket-pruned;
``compact()`` periodically folds deltas into the next base generation
(RocksDB's L0->L1). Retired delta dirs get a one-generation vacuum
grace, mirroring keep_last=2 for generations.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from balboa_spark.operators.aggregate import merge_increment
from balboa_spark.operators.query import Query
from balboa_spark.schemas import INVERTED_KEY, OBSERVATION_KEY

MANIFEST = "manifest.json"


class MultiStore:
    """U1: the multi-backend composition (db/db_remote.go:133-202) —
    a query fans out to every member store and the results are
    concatenated WITH duplicates (documented behavior,
    README.md:291-293). Each member's scan is independently
    bucket-pruned; the per-backend limit applies per member, so the
    union can return up to len(stores) x limit rows, exactly like the
    reference's sequential backend loop."""

    def __init__(self, stores):
        if not stores:
            raise ValueError("MultiStore needs at least one store")
        self.stores = list(stores)

    def query(self, q) -> DataFrame:
        out = self.stores[0].query(q)
        for s in self.stores[1:]:
            out = out.unionAll(s.query(q))
        return out

    def total_count(self) -> int:
        return sum(s.forward().count() for s in self.stores)


_LAYOUTS = {
    "by_rrname": ("rrname", OBSERVATION_KEY),
    "by_rdata": ("rdata", INVERTED_KEY),
}


def _bucket(col: str, n: int):
    return F.pmod(F.hash(F.col(col)), F.lit(n)).alias("bucket")


# shared generation-store plumbing (also used by VectorStore and
# PostingsIndex); re-exported under the old name for callers
from balboa_spark.plans.genstore import (  # noqa: E402
    flip_manifest as _flip_manifest_file,
    link_tree as _link_tree,
    vacuum_generations as _vacuum_generations,
)


class ObservationStore:
    """The persistent `observations` dataset with dual sorted layouts."""

    def __init__(self, spark: SparkSession, path: str, num_buckets: int = 8):
        self.spark = spark
        self.path = path
        self.num_buckets = num_buckets
        self._layout_cache: dict[tuple[int, str], DataFrame] = {}

    # -- manifest (the single source of truth) ------------------------------

    def _manifest(self) -> dict | None:
        p = os.path.join(self.path, MANIFEST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            man = json.load(f)
        # a store is defined by its on-disk layout, not the ctor arg
        self.num_buckets = man["num_buckets"]
        return man

    def _flip_manifest(self, man: dict, expected_seq: int | None = None) -> None:
        """The one commit point: atomic rename of the manifest.
        ``expected_seq`` (the commit_seq captured at this mutation's
        initial manifest read) arms the lost-update CAS — a concurrent
        writer's commit in the window raises ConcurrentWriterError
        instead of being silently erased (genstore.flip_manifest)."""
        _flip_manifest_file(self.path, man, MANIFEST, expected_seq=expected_seq)

    def _gen_dir(self, gen: int) -> str:
        return os.path.join(self.path, f"gen-{gen}")

    # -- write side ---------------------------------------------------------

    def write(
        self,
        agg_df: DataFrame,
        epoch_id: int | None = None,
        stream_id: str = "default",
    ) -> None:
        """Write both layouts as a fresh generation + flip the manifest."""
        man = self._manifest()
        gen = man["generation"] + 1 if man else 0
        gen_dir = self._gen_dir(gen)
        # materialize the caller's plan ONCE: the two layout writes are
        # separate Spark jobs, and each would re-evaluate the full
        # upstream fold (the compact() rationale applied to the write
        # path — isolated A/B: store_build 1.22s -> 0.68s at sf0.1)
        agg_df = agg_df.localCheckpoint(eager=True)
        self._write_layouts(agg_df, gen_dir)
        self._commit(gen, man, epoch_id, stream_id)

    def _write_layouts(self, df: DataFrame, base_dir: str) -> None:
        """Both layout writes submitted from a 2-thread pool: the jobs
        are independent (same MATERIALIZED input, different output
        dirs), and the FIFO scheduler back-fills the second job's
        tasks into the first's straggler tail — the repartition by
        ``bucket`` leaves most local cores (and, on a cluster, most
        executor slots) idle in the tail otherwise. Input must be
        checkpointed/persisted by the caller so the two jobs share one
        computation instead of racing to evaluate the same lineage."""
        from concurrent.futures import ThreadPoolExecutor

        def one(item):
            name, (key, order) = item
            self._write_layout(df, os.path.join(base_dir, name), key, order)

        with ThreadPoolExecutor(max_workers=2) as pool:
            list(pool.map(one, _LAYOUTS.items()))

    def _commit(
        self,
        gen: int,
        prev_man: dict | None,
        epoch_id: int | None,
        stream_id: str = "default",
    ) -> None:
        # Epochs are tracked PER STREAM: foreachBatch epoch ids are
        # per-StreamingQuery counters, so two feeders merging into the
        # same store must not gate each other (feeder B's epoch 0 is
        # not a replay of feeder A's epoch 0).
        last_epochs = dict((prev_man or {}).get("last_epochs") or {})
        if not last_epochs and (prev_man or {}).get("last_epoch") is not None:
            last_epochs["default"] = prev_man["last_epoch"]  # legacy manifest
        if epoch_id is not None:
            last_epochs[stream_id] = epoch_id
        # write() is a full replace: outstanding deltas stop being part
        # of the truth and retire with the same one-generation reader
        # grace compact() grants; delta_seq stays monotonic so old dirs
        # are never silently resurrected by a name collision
        prev = prev_man or {}
        retired = self._retire_deltas(prev, gen)
        self._flip_manifest(
            {
                "generation": gen,
                "num_buckets": self.num_buckets,
                "layouts": {n: list(order) for n, (_k, order) in _LAYOUTS.items()},
                "written_at": int(time.time()),
                "last_epochs": last_epochs,
                "deltas": [],
                "retired_deltas": retired,
                "delta_seq": prev.get("delta_seq", 0),
            },
            expected_seq=prev.get("commit_seq", 0),
        )
        self.vacuum(keep_last=2)

    def _retire_deltas(self, prev_man: dict, gen: int) -> dict:
        """Move a manifest's live deltas into the retired map at
        generation ``gen``. Retired deltas keep a one-generation
        vacuum grace (mirrors keep_last=2 for generations); stale
        entries whose dirs are already gone are pruned."""
        retired = {
            n: g
            for n, g in (prev_man.get("retired_deltas") or {}).items()
            if os.path.isdir(os.path.join(self.path, n))
        }
        for n in prev_man.get("deltas") or []:
            retired[n] = gen
        return retired

    def _write_layout(self, df: DataFrame, out: str, key: str, order) -> None:
        (
            df.withColumn("bucket", _bucket(key, self.num_buckets))
            .repartition("bucket")
            .sortWithinPartitions(*order)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(out)
        )

    def append_delta(
        self,
        new_obs: DataFrame,
        epoch_id: int | None = None,
        stream_id: str = "default",
        max_live_deltas: int | None = None,
    ) -> None:
        """LSM write path: fold the batch LOCALLY and append it as a
        delta generation — O(batch) work with NO read of the base.

        merge() re-folds and rewrites every touched bucket per batch;
        with uniform keys (passive-DNS rrname/rdata are) any batch
        touches every bucket, so its per-batch cost grows with the
        STORE — fine for hourly folds, wrong for a high-frequency
        micro-batch stream against a 100 TB table. Deltas make the
        write O(batch): the batch is aggregated batch-locally, written
        in the same dual bucketed+sorted layout under ``delta-<seq>/``,
        and committed by the same atomic manifest flip. Reads fold
        base UNION deltas on the fly (fold_entries — associativity
        makes that identical to merge()'s result), still bucket-pruned
        because ``bucket`` stays a grouping key; read cost grows with
        the delta count until :meth:`compact` folds them into the next
        base generation (the RocksDB L0->L1 pattern).

        Crash safety: same (stream_id, epoch_id) gate as merge() — a
        replayed epoch is a no-op; a TORN append (delta dir written,
        manifest not flipped) is invisible to readers and gets
        overwritten by the replay (the seq comes from the committed
        manifest, so the retry lands on the same directory). An
        abandoned torn dir that is never retried is deliberately
        SPARED by vacuum() — at seq == delta_seq it is
        indistinguishable from an in-flight append — and is reclaimed
        when a later append reuses its seq.

        ``max_live_deltas`` arms size-triggered auto-compaction (the
        RocksDB L0 file-count trigger): when the committed delta list
        exceeds it, :meth:`compact` runs inline after the flip, so
        merge-on-read cost stays bounded even when no caller ever
        schedules compaction by cadence."""
        man = self._manifest()
        if man is not None:
            last = (man.get("last_epochs") or {}).get(stream_id)
            if last is None and stream_id == "default":
                last = man.get("last_epoch")  # legacy manifest
            if epoch_id is not None and last is not None and epoch_id <= last:
                return  # replayed micro-batch (T5)
        from balboa_spark.operators.aggregate import aggregate

        if man is None:
            self.write(aggregate(new_obs), epoch_id=epoch_id, stream_id=stream_id)
            return
        seq = man.get("delta_seq", 0)
        dname = f"delta-{seq:06d}"
        # fold the batch ONCE (O(batch) relation) — without the
        # checkpoint each of the two layout writes re-runs the whole
        # batch aggregate, doubling the per-append cost on the
        # streaming hot path
        agg = aggregate(new_obs).localCheckpoint(eager=True)
        self._write_layouts(agg, os.path.join(self.path, dname))
        last_epochs = dict(man.get("last_epochs") or {})
        if epoch_id is not None:
            last_epochs[stream_id] = epoch_id
        deltas = list(man.get("deltas") or []) + [dname]
        self._flip_manifest(
            {
                **man,
                "delta_seq": seq + 1,
                "deltas": deltas,
                "last_epochs": last_epochs,
            },
            expected_seq=man.get("commit_seq", 0),
        )
        if max_live_deltas is not None and len(deltas) > max_live_deltas:
            self.compact()

    def compact(self) -> None:
        """Fold all outstanding deltas into a fresh base generation
        (LSM major compaction) and drop them. No-op without deltas.
        One full rewrite — schedule it by delta count or delta bytes,
        not per batch; queries stay correct (and bucket-pruned) at any
        point before, during, or after."""
        man = self._manifest()
        if man is None or not man.get("deltas"):
            return
        # materialize the fold ONCE: the two layout writes are separate
        # Spark jobs, and without this each would re-read the full base
        # + every delta and re-run the group-merge (the ingest.py
        # parse-once rationale applied to the maintenance path)
        combined = self._combined_layout("by_rrname").drop("bucket")
        combined = combined.localCheckpoint(eager=True)
        gen = man["generation"] + 1
        gen_dir = self._gen_dir(gen)
        self._write_layouts(combined, gen_dir)
        self._flip_manifest(
            {
                **man,
                "generation": gen,
                "deltas": [],
                "retired_deltas": self._retire_deltas(man, gen),
                "written_at": int(time.time()),
            },
            expected_seq=man.get("commit_seq", 0),
        )
        self.vacuum(keep_last=2)

    def merge(
        self,
        new_obs: DataFrame,
        epoch_id: int | None = None,
        stream_id: str = "default",
    ) -> None:
        """A2/T1: fold a new input-observation batch into the store.

        Selective-bucket MERGE: only partitions whose bucket contains a
        batch key are re-folded and rewritten; the rest of the new
        generation is hard-linked from the previous one. Cost scales
        with the batch, not the store. ``(stream_id, epoch_id)`` (from
        foreachBatch) makes replays no-ops — epoch counters are
        per-StreamingQuery, so the gate must be scoped per stream or a
        second feeder's early epochs would be dropped as 'replays'.

        With outstanding :meth:`append_delta` deltas the store is
        compacted first (the selective-bucket rewrite below assumes
        the base generation is the whole truth).
        """
        man = self._manifest()
        if man is not None and man.get("deltas"):
            # gate BEFORE compacting so a replayed epoch stays a no-op
            last = (man.get("last_epochs") or {}).get(stream_id)
            if epoch_id is not None and last is not None and epoch_id <= last:
                return
            self.compact()
            man = self._manifest()
        last = None
        if man is not None:
            last = (man.get("last_epochs") or {}).get(stream_id)
            if last is None and stream_id == "default":
                last = man.get("last_epoch")  # legacy manifest
        if epoch_id is not None and last is not None and epoch_id <= last:
            return  # replayed micro-batch: already folded (T5)
        if man is None:
            from balboa_spark.operators.aggregate import aggregate

            self.write(aggregate(new_obs), epoch_id=epoch_id, stream_id=stream_id)
            return

        gen = man["generation"] + 1
        gen_dir = self._gen_dir(gen)
        old_dir = self._gen_dir(man["generation"])
        # materialize the batch ONCE: the touched-bucket probe and both
        # per-layout merge jobs otherwise each re-evaluate the caller's
        # batch plan (3 evaluations of the upstream parse/filter chain
        # per merge — measured on the bench merge_batch item)
        new_obs = new_obs.localCheckpoint(eager=True)
        # both layouts' touched-bucket sets in ONE job — merge is on
        # the streaming hot path, so per-batch Spark jobs matter. Two
        # collect_sets bound the driver result at 2*num_buckets values
        # (a distinct over the PAIRS would be num_buckets² rows).
        row = new_obs.agg(
            F.collect_set(_bucket("rrname", self.num_buckets)).alias("br"),
            F.collect_set(_bucket("rdata", self.num_buckets)).alias("bd"),
        ).collect()[0]
        touched_by_key = {
            "rrname": sorted(row["br"]),
            "rdata": sorted(row["bd"]),
        }
        def merge_one(item):
            # independent per-layout jobs over the checkpointed batch —
            # submitted concurrently so the second job back-fills the
            # first's straggler tail (same rationale as _write_layouts)
            name, (key, order) = item
            touched = touched_by_key[key]
            out = os.path.join(gen_dir, name)
            stored = self._read_layout(name)
            if stored is not None:
                stored = stored.filter(F.col("bucket").isin(touched)).drop("bucket")
            merged = merge_increment(stored, new_obs)
            self._write_layout(merged, out, key, order)
            # carry over untouched buckets from the previous generation
            old_layout = os.path.join(old_dir, name)
            if os.path.isdir(old_layout):
                keep = {f"bucket={b}" for b in touched}
                for entry in os.listdir(old_layout):
                    if entry.startswith("bucket=") and entry not in keep:
                        _link_tree(
                            os.path.join(old_layout, entry), os.path.join(out, entry)
                        )

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            list(pool.map(merge_one, _LAYOUTS.items()))
        self._commit(gen, man, epoch_id, stream_id)

    def vacuum(self, keep_last: int = 2) -> None:
        """Drop generations older than the newest ``keep_last``, plus
        delta directories that are no longer part of the truth. The
        previous generation is kept by default so in-flight readers
        (cached plans against the old file set) stay valid; retired
        deltas get the SAME one-generation grace (a cached combined
        plan against the pre-compaction base may still list them).
        A delta dir at the manifest's NEXT seq is never touched — it
        is a torn append whose replay will overwrite it in place."""
        man = self._manifest()
        if man is None:
            return
        floor = _vacuum_generations(self.path, man["generation"], keep_last)
        live = set(man.get("deltas") or [])
        retired = dict(man.get("retired_deltas") or {})
        next_seq = man.get("delta_seq", 0)
        removed: set[str] = set()
        for entry in os.listdir(self.path):
            if not entry.startswith("delta-"):
                continue
            if entry in live:
                continue
            if entry in retired:
                if retired[entry] <= floor:  # grace period over
                    shutil.rmtree(os.path.join(self.path, entry),
                                  ignore_errors=True)
                    removed.add(entry)
                continue
            seq_s = entry[len("delta-"):]
            if seq_s.isdigit() and int(seq_s) < next_seq:
                # unreferenced dir from a committed era — orphan
                shutil.rmtree(os.path.join(self.path, entry),
                              ignore_errors=True)
                removed.add(entry)
        self._layout_cache = {
            k: v
            for k, v in self._layout_cache.items()
            if (isinstance(k[0], int) and k[0] >= floor)
            or (isinstance(k[0], str) and k[0] not in removed)
        }

    # -- read side ----------------------------------------------------------

    def _empty_layout(self) -> DataFrame:
        from balboa_spark.schemas import OBSERVATION

        return self.spark.createDataFrame([], OBSERVATION).withColumn(
            "bucket", F.lit(0)
        )

    def _read_layout(
        self, name: str, generation: int | None = None
    ) -> DataFrame | None:
        """Layout DataFrame at the current (default) or an explicit
        retained generation, cached per (generation, layout) so
        repeated point queries reuse the file listing instead of
        re-planning I/O on every call. Explicit generations are valid
        only if COMMITTED (<= the manifest's generation): a gen-N
        directory left by a crashed, un-flipped merge must never be
        readable — serving it would expose a partial snapshot and
        poison the plan cache for the generation a retried merge later
        commits under the same number."""
        from pyspark.sql.utils import AnalysisException

        man = self._manifest()
        if man is None:
            if generation is not None:
                raise ValueError(
                    f"generation {generation} does not exist: store at "
                    f"{self.path} has no committed manifest"
                )
            return None
        gen = man["generation"] if generation is None else generation
        if generation is not None and (
            gen > man["generation"] or not os.path.isdir(self._gen_dir(gen))
        ):
            raise ValueError(
                f"generation {gen} is not a committed, retained generation "
                f"(vacuum keeps the last 2; current is {man['generation']})"
            )
        key = (gen, name)
        if key not in self._layout_cache:
            try:
                df = self.spark.read.parquet(
                    os.path.join(self._gen_dir(gen), name)
                )
            except AnalysisException:
                # an empty aggregate writes no parquet files; surface an
                # empty table, not a schema-inference error
                df = self._empty_layout()
            self._layout_cache[key] = df
        return self._layout_cache[key]

    def _layout_or_empty(self, name: str) -> DataFrame:
        df = self._read_layout(name)
        return df if df is not None else self._empty_layout()

    def _read_delta_layout(self, dname: str, name: str) -> DataFrame:
        from pyspark.sql.utils import AnalysisException

        key = (dname, name)
        if key not in self._layout_cache:
            try:
                df = self.spark.read.parquet(
                    os.path.join(self.path, dname, name)
                )
            except AnalysisException:
                df = self._empty_layout()  # empty batch wrote no files
            self._layout_cache[key] = df
        return self._layout_cache[key]

    def _combined_layout(self, name: str) -> DataFrame:
        """Base layout merged-on-read with outstanding deltas (LSM read
        path). Without deltas this IS the base layout — zero overhead.
        With deltas, one fold_entries groupBy re-folds base UNION
        deltas; ``bucket`` stays a grouping key, so a point query's
        bucket filter pushes below the fold and the job still touches
        one bucket directory per relation.

        The manifest is read ONCE and its generation passed explicitly
        to the base read: re-reading it inside _read_layout could see
        a concurrent compact()'s flip and pair the POST-compaction
        base (deltas already folded in) with the stale delta list —
        double-counting every delta row. Pinning (generation, deltas)
        to one manifest snapshot keeps the combined view consistent;
        the vacuum grace keeps the pinned files readable."""
        man = self._manifest()
        if man is None:
            return self._empty_layout()
        if not man.get("deltas"):
            return self._layout_or_empty(name)
        from balboa_spark.operators.aggregate import fold_entries

        base = self._read_layout(name, generation=man["generation"])
        allr = base if base is not None else self._empty_layout()
        for dname in man["deltas"]:
            allr = allr.unionByName(self._read_delta_layout(dname, name))
        return fold_entries(allr, extra_keys=("bucket",))

    def forward(self, generation: int | None = None) -> DataFrame:
        """Aggregate table in forward key order; pass ``generation``
        for a time-travel read of a retained older generation (the
        lakehouse snapshot-read pattern — generations are immutable,
        so an as-of-previous-merge audit query is just a different
        directory, within the vacuum horizon)."""
        if generation is None:
            return self._combined_layout("by_rrname").drop("bucket")
        df = self._read_layout("by_rrname", generation)
        return (df if df is not None else self._empty_layout()).drop("bucket")

    def inverted(self, generation: int | None = None) -> DataFrame:
        if generation is None:
            return self._combined_layout("by_rdata").drop("bucket")
        df = self._read_layout("by_rdata", generation)
        return (df if df is not None else self._empty_layout()).drop("bucket")

    def generations(self) -> list[int]:
        """Committed, retained (readable) generations, oldest first.
        Uncommitted gen dirs (a crashed merge that never flipped the
        manifest) and fresh stores yield nothing."""
        man = self._manifest()
        if man is None or not os.path.isdir(self.path):
            return []
        return sorted(
            g
            for e in os.listdir(self.path)
            if e.startswith("gen-") and e[4:].isdigit()
            and (g := int(e[4:])) <= man["generation"]
        )

    def query(self, q: Query) -> DataFrame:
        """Q3 dispatch (rocksdb-impl.c:622-630): route to the layout
        whose bucket partition the driving predicate prunes."""
        q.validate()
        if q.rrname is not None:
            base = self._combined_layout("by_rrname")
            df = base.filter(
                (F.col("bucket") == F.pmod(F.hash(F.lit(q.rrname)), F.lit(self.num_buckets)))
                & (F.col("rrname") == q.rrname)
            )
            if q.rdata is not None:
                df = df.filter(F.col("rdata") == q.rdata)
        else:
            base = self._combined_layout("by_rdata")
            df = base.filter(
                (F.col("bucket") == F.pmod(F.hash(F.lit(q.rdata)), F.lit(self.num_buckets)))
                & (F.col("rdata") == q.rdata)
            )
        if q.rrtype is not None:
            df = df.filter(F.col("rrtype") == q.rrtype)
        if q.sensor_id is not None:
            df = df.filter(F.col("sensor_id") == q.sensor_id)
        return df.drop("bucket").orderBy(*OBSERVATION_KEY).limit(q.limit)

    def query_many(self, subjects, by: str = "rdata") -> DataFrame:
        """Batch point lookups — the engine-native form of the
        reference's bench workload (10,000 serial rdata queries,
        cmd/balboa/cmds/bench.go:52-101) as ONE job: the subject list
        becomes a broadcast semi-join against the matching layout, and
        the scan is pruned to the union of the subjects' hash buckets
        (len(subjects) buckets at most, usually far fewer than the
        table's). At 4096 buckets / 100 TB this reads only the touched
        ~N/4096 slices instead of the full table."""
        if by not in ("rdata", "rrname"):
            raise ValueError("by must be 'rdata' or 'rrname'")
        layout = "by_rdata" if by == "rdata" else "by_rrname"
        base = self._combined_layout(layout)
        subjects = list(set(subjects))
        subj_df = self.spark.createDataFrame([(s,) for s in subjects], f"{by} string")
        # bucket ids via Spark's own hash (a driver-side Python hash
        # would disagree with the layout's partitioning expression)
        bucket_ids = [
            r["bucket"]
            for r in subj_df.select(_bucket(by, self.num_buckets)).distinct().collect()
        ]
        return (
            base.filter(F.col("bucket").isin(bucket_ids))
            .join(F.broadcast(subj_df), by)
            .drop("bucket")
        )

    # -- derived signals ----------------------------------------------------

    def new_entries(self, batch: DataFrame) -> DataFrame:
        """Batch keys not yet present in the store — full-key novelty.
        Call BEFORE merge() to get the per-batch alert set."""
        keys = batch.select(*OBSERVATION_KEY).distinct()
        return keys.join(
            self.forward().select(*OBSERVATION_KEY), list(OBSERVATION_KEY), "left_anti"
        )

    def new_rrnames(self, batch: DataFrame) -> DataFrame:
        """rrnames never observed before — the NewDomain signal the
        reference ingests pre-computed from SIE (newdomain.pb.go
        new_rrname); here derived against our own history as an
        anti-join of the batch's distinct rrnames (small side) against
        the forward layout. State lives in the table, not in stream
        memory — the T2 principle applied to novelty detection."""
        return (
            batch.select("rrname")
            .distinct()
            .join(self.forward().select("rrname").distinct(), "rrname", "left_anti")
        )

    # -- maintenance jobs (Q5-Q7, S6) --------------------------------------

    def dump(self, out_path: str) -> None:
        """Q5: full export of the forward table (rocksdb-impl.c:664-759)."""
        self.forward().orderBy(*OBSERVATION_KEY).write.mode("overwrite").parquet(out_path)

    def jsonize(self, out_path: str) -> None:
        """Q7: dump as NDJSON with the console's exact field names —
        rrname/rrtype/sensor_id/rdata/count/first_seen/last_seen, times
        as unix seconds (balboa-backend-console main.c:96-135,
        dump_entry_as_json). The REST wire shape (time_first/time_last,
        observation/observation.go:26-37) lives in serving.py."""
        (
            self.forward()
            .select(
                "rrname",
                "rrtype",
                "sensor_id",
                "rdata",
                "count",
                F.unix_timestamp("first_seen").alias("first_seen"),
                F.unix_timestamp("last_seen").alias("last_seen"),
            )
            .write.mode("overwrite")
            .json(out_path)
        )

    def replay(self, dump_path: str) -> None:
        """S6: re-ingest a dump through the merge pipeline
        (backend/README.md:100-123)."""
        dumped = self.spark.read.parquet(dump_path)
        as_input = dumped.select(
            *OBSERVATION_KEY,
            F.col("count"),
            F.col("first_seen").alias("ts_start"),
            F.col("last_seen").alias("ts_end"),
        )
        self.merge(as_input)

    def backup(self, backup_path: str) -> None:
        """Q6: snapshot copy (rocksdb-impl.c:632-662). Parquet files are
        immutable once written, so a directory copy is a valid snapshot."""
        shutil.copytree(self.path, backup_path, dirs_exist_ok=True)
