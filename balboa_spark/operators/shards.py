"""Training-shard sink: packed token sequences -> deterministic,
manifest-pinned parquet shards for a trainer to consume.

The engine already produces both inputs — ``TokenizerStore.encode``
(token ids) and ``corpus.pack_sequences`` (fixed-length packed
sequences) — but the hand-off artifact a training job actually mounts
has its own contract, and this module is that last mile (the LLM-side
analog of the reference's dump/backup sinks, plans/layout.py Q5-Q7):

- every sequence is VALIDATED against the declared ``seq_len`` before
  anything lands on disk (a single ragged row silently truncated or
  padded by a trainer corrupts loss scaling);
- shard assignment is a pure function of the sequence id (the repo's
  md5-derived convention: ``pmod(conv(substr(md5(id), 1, 12), 16,
  10), num_shards)`` — 48 uniform bits, replayable in DuckDB as
  ``CAST('0x' || substr(md5(id), 1, 12) AS BIGINT) % N``, so the
  exact layout a trainer resumes against is oracle-gradeable) and
  within-shard order is id order — two writes of the same relation
  are BYTE-IDENTICAL in layout, and a resumable trainer can name its
  position as (shard, id) without consulting the producer;
- the manifest commits LAST via atomic rename: a crashed write leaves
  no manifest, and the reader refuses a manifest-less directory, so a
  torn export can never be mounted as a dataset (the ObservationStore
  generation-pointer convention);
- r15: exports are GENERATIONAL (``gen-<n>/shard=K/``, the genstore
  pattern shared with ObservationStore/VectorStore/PostingsIndex) and
  :func:`reexport_training_shards` drives an INCREMENTAL re-export
  from a corpus delta (``corpus.snapshot_diff``): only shards whose
  id-set changed are rewritten; every untouched shard hard-links from
  the previous generation (O(#files) metadata, zero data movement,
  byte-identical by construction), and the manifest flip is
  CAS-guarded against concurrent writers.

Scale shape: one repartition by the shard column (a single shuffle,
AQE-splittable), sort within partitions, ``partitionBy`` write — no
driver-side iteration; the validation pass is one count over a
filter. 100 TB of packed sequences is exactly this plan with a larger
``num_shards``; a 0.1% corpus delta re-export costs one dirty-shard
write + metadata links, not a full rewrite.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "manifest.json"
DATA_DIR = "data"


def shard_of(id_col, num_shards: int):
    """Deterministic shard for a sequence id:
    ``pmod(conv(substr(md5(id), 1, 12), 16, 10), N)`` — the repo's
    engine-replayable-hash convention (splits/sampling/salting all use
    md5), so DuckDB can replay the assignment verbatim:
    ``CAST('0x' || substr(md5(id), 1, 12) AS BIGINT) % N``. Pure
    column expression — the reader, a resuming trainer, and the
    DuckDB oracle all agree without coordination. 12 hex digits = 48
    uniform bits, far above any realistic num_shards."""
    h48 = F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, 12), 16, 10
    ).cast("long")
    return F.pmod(h48, F.lit(int(num_shards))).cast("int")


def write_training_shards(
    packed: DataFrame,
    out_dir: str,
    seq_len: int,
    num_shards: int = 8,
    id_col: str = "seq_id",
    tokens_col: str = "token_ids",
    extra_manifest: dict | None = None,
) -> dict:
    """Validate + write ``packed`` as ``num_shards`` deterministic
    parquet shards under ``out_dir/data/shard=N/`` and commit the
    manifest atomically. Returns the manifest dict.

    Raises on: an existing manifest (dirty target — the export_gpt2
    convention; incremental updates go through
    :func:`reexport_training_shards`), any row whose ``tokens_col``
    length differs from ``seq_len`` (reported with a count and an
    example id), or a NULL ``id_col`` (unaddressable for resume)."""
    if os.path.exists(os.path.join(out_dir, MANIFEST)):
        raise FileExistsError(
            f"write_training_shards: {out_dir} already holds a manifest; "
            "write to a fresh directory (or reexport_training_shards "
            "for an incremental update)"
        )
    packed, n = _validate_packed(packed, seq_len, id_col, tokens_col)
    data = os.path.join(out_dir, _gen_dir(0))
    (
        packed.withColumn("shard", shard_of(F.col(id_col), num_shards))
        .repartition(int(num_shards), "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode("errorifexists")
        .partitionBy("shard")
        .parquet(data)
    )
    manifest = {
        "format": "parquet",
        "generation": 0,
        "seq_len": int(seq_len),
        "num_shards": int(num_shards),
        "n_sequences": int(n),
        "shard_sequences": _shard_counts(packed, id_col, num_shards),
        "id_col": id_col,
        "tokens_col": tokens_col,
        # which assignment convention this export was written under —
        # external resume tooling replays shard_of from this, and a
        # future convention change (as r15's xxhash64 -> md5 switch
        # was) becomes detectable instead of silently disagreeing
        "shard_hash": "md5_48",
        **(extra_manifest or {}),
    }
    from balboa_spark.plans.genstore import flip_manifest

    flip_manifest(out_dir, manifest, MANIFEST, expected_seq=0)
    return {**manifest, "commit_seq": 1}


def _gen_dir(gen: int) -> str:
    return f"gen-{gen}"


def _shard_counts(packed: DataFrame, id_col: str, num_shards: int) -> dict:
    """Per-shard row counts for the manifest (<= num_shards rows reach
    the driver): lets the reader NAME a torn shard or dropped
    hard-link instead of reporting only a total mismatch. JSON keys
    are strings by format."""
    rows = (
        packed.groupBy(shard_of(F.col(id_col), num_shards).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {str(int(r["s"])): int(r["n"]) for r in rows}


def _validate_packed(
    packed: DataFrame, seq_len: int, id_col: str, tokens_col: str
) -> tuple[DataFrame, int]:
    """(pinned relation, row count) after the contract checks.

    Pins the rows ONCE before the validate+write action pair: they
    are separate actions, and a nondeterministic upstream
    (shuffle-order ids, a re-read source) could otherwise pass
    validation and then land different rows in the write — defeating
    the seq_len contract this module exists to enforce.
    localCheckpoint truncates the lineage so both actions see the
    same materialization. Validation + count run in ONE aggregate
    job."""
    packed = packed.localCheckpoint(eager=False)
    is_bad = (
        F.col(id_col).isNull()
        | F.col(tokens_col).isNull()
        | (F.size(tokens_col) != int(seq_len))
    )
    stats = packed.agg(
        F.count(F.lit(1)).alias("n"), F.count_if(is_bad).alias("bad")
    ).first()
    if stats["bad"]:
        r = (
            packed.filter(is_bad)
            .select(id_col, F.size(tokens_col).alias("_n"))
            .first()
        )
        raise ValueError(
            f"training shards: {stats['bad']} sequence(s) violate "
            f"the contract — e.g. {r[id_col]!r} has length {r['_n']} "
            f"(expected {seq_len}) or a NULL id/tokens; refusing to "
            "write a ragged dataset"
        )
    if stats["n"] == 0:
        # an empty export would commit a valid manifest over a data
        # dir with no parquet files, which read_training_shards cannot
        # mount (schema inference fails before the count check)
        raise ValueError(
            "training shards: the relation is empty; refusing to "
            "commit a dataset no reader can mount"
        )
    return packed, int(stats["n"])


def reexport_training_shards(
    packed: DataFrame,
    out_dir: str,
    changed_ids: DataFrame,
    extra_manifest: dict | None = None,
) -> dict:
    """Incremental re-export after a corpus delta: rewrite ONLY the
    shards whose id-set changed; hard-link every other shard from the
    previous generation (byte-identical by construction — same
    inodes); commit a new generation with a CAS-guarded manifest flip
    (genstore ``ConcurrentWriterError`` on a racing writer) and
    vacuum to keep-last-2.

    ``packed`` is the FULL new relation (the manifest's n_sequences
    re-validates against it); ``changed_ids`` is a one-column
    relation of every id whose row was added, removed, or changed —
    exactly ``corpus.snapshot_diff(old, new)``'s id column (added ∪
    removed ∪ changed). Ids must be row-stable across snapshots for
    the delta to be meaningful: doc-keyed shards qualify directly;
    globally renumbered seq_ids (plain concat-and-chunk repacking
    shifts every downstream offset) do NOT — use the doc-stable
    packing arms (fragment ids keyed by (doc, chunk), sharded
    pack mode) for incremental layouts.

    Seq/shape parameters are pinned by the ORIGINAL manifest (a
    different num_shards changes every hash assignment — that is a
    fresh export, not a delta). Cost: one dirty-shard-filtered write
    + one validation aggregate + O(#files) links — a 0.1% delta
    touches ~num_shards x 0.1% of the data at uniform hashing.
    """
    from balboa_spark.plans.genstore import (
        flip_manifest,
        link_tree,
        read_commit_seq,
        vacuum_generations,
    )

    mpath = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"reexport_training_shards: {out_dir} has no {MANIFEST}; "
            "use write_training_shards for the initial export"
        )
    expected_seq = read_commit_seq(out_dir, MANIFEST)
    with open(mpath) as fh:
        man = json.load(fh)
    if "generation" not in man:
        raise ValueError(
            "reexport_training_shards: pre-generational export layout; "
            "re-export fully with write_training_shards into a fresh "
            "directory"
        )
    seq_len = int(man["seq_len"])
    num_shards = int(man["num_shards"])
    id_col, tokens_col = man["id_col"], man["tokens_col"]

    packed, n = _validate_packed(packed, seq_len, id_col, tokens_col)
    # dirty shards: <= num_shards rows reach the driver, never ids
    dirty = sorted(
        r["s"]
        for r in changed_ids.select(
            shard_of(F.col(changed_ids.columns[0]), num_shards).alias("s")
        )
        .distinct()
        .collect()
    )
    old_gen, new_gen = int(man["generation"]), int(man["generation"]) + 1
    if not dirty:
        return man  # nothing changed; current generation stands
    old_dir = os.path.join(out_dir, _gen_dir(old_gen))
    new_dir = os.path.join(out_dir, _gen_dir(new_gen))
    if os.path.exists(new_dir):
        raise FileExistsError(
            f"reexport_training_shards: {new_dir} already exists — a "
            "torn prior re-export; remove it before retrying"
        )
    dirty_set = set(dirty)
    (
        packed.withColumn("shard", shard_of(F.col(id_col), num_shards))
        .filter(F.col("shard").isin(dirty))
        .repartition(len(dirty), "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode("errorifexists")
        .partitionBy("shard")
        .parquet(new_dir)
    )
    os.makedirs(new_dir, exist_ok=True)  # all-dirty-empty edge: no rows
    for entry in os.listdir(old_dir):
        if not entry.startswith("shard="):
            continue
        if int(entry.split("=", 1)[1]) in dirty_set:
            continue
        link_tree(
            os.path.join(old_dir, entry), os.path.join(new_dir, entry)
        )
    manifest = {
        **{k: v for k, v in man.items() if k != "commit_seq"},
        "generation": new_gen,
        "n_sequences": int(n),
        "shard_sequences": _shard_counts(packed, id_col, num_shards),
        "rewritten_shards": dirty,
        # generational manifests are all post-r15 md5 exports; stamp
        # the convention if the original predates the field
        "shard_hash": man.get("shard_hash", "md5_48"),
        **(extra_manifest or {}),
    }
    flip_manifest(out_dir, manifest, MANIFEST, expected_seq=expected_seq)
    vacuum_generations(out_dir, new_gen, keep_last=2)
    return {**manifest, "commit_seq": expected_seq + 1}


def read_training_shards(
    spark: SparkSession,
    out_dir: str,
    resume_from: tuple[int, object] | None = None,
) -> tuple[DataFrame, dict]:
    """Mount a shard directory: refuses when the manifest is absent
    (a torn export), re-validates the row count against it — per
    shard when the manifest carries ``shard_sequences`` (r15 exports;
    a dropped hard-link or torn shard is then named, not just
    counted) — and returns (DataFrame with the ``shard`` column,
    manifest). Global sample order is (shard, id) — the writer's
    layout, so a trainer's resume cursor is just the last consumed
    (shard, id).

    ``resume_from=(shard, last_id)`` mounts only the UNCONSUMED
    suffix: strictly-later shards plus the tail of the cursor shard
    (``id > last_id``). ``shard`` is a partition column, so the
    strictly-later-shard predicate PRUNES whole shard directories at
    the scan (a resume after 90% of a 100 TB run reads ~10% of it);
    count re-validation is skipped for a partial mount."""
    mpath = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"read_training_shards: {out_dir} has no {MANIFEST} — "
            "incomplete or torn export; refusing to mount"
        )
    with open(mpath) as fh:
        manifest = json.load(fh)
    # generational layout since r15; pre-generational manifests point
    # at the legacy flat data/ dir
    sub = (
        _gen_dir(int(manifest["generation"]))
        if "generation" in manifest
        else DATA_DIR
    )
    df = spark.read.parquet(os.path.join(out_dir, sub))
    if resume_from is not None:
        s, last_id = int(resume_from[0]), resume_from[1]
        return (
            df.filter(
                (F.col("shard") > s)
                | ((F.col("shard") == s) & (F.col(manifest["id_col"]) > F.lit(last_id)))
            ),
            manifest,
        )
    per_shard = manifest.get("shard_sequences")
    if per_shard is not None:
        got = {
            int(r["shard"]): r["n"]
            for r in df.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        want = {int(k): int(v) for k, v in per_shard.items()}
        if got != want:
            bad = sorted(
                k for k in set(got) | set(want) if got.get(k) != want.get(k)
            )
            raise ValueError(
                f"read_training_shards: shard counts diverge from the "
                f"manifest at shard(s) {bad} — torn shard or dropped "
                "hard-link; refusing to mount"
            )
        return df, manifest
    n = df.count()
    if n != manifest["n_sequences"]:
        raise ValueError(
            f"read_training_shards: manifest promises "
            f"{manifest['n_sequences']} sequences, data holds {n}"
        )
    return df, manifest
