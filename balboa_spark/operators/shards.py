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
  generation-pointer convention).

Scale shape: one repartition by the shard column (a single shuffle,
AQE-splittable), sort within partitions, ``partitionBy`` write — no
driver-side iteration; the validation pass is one count over a
filter. 100 TB of packed sequences is exactly this plan with a larger
``num_shards``.
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
    convention), any row whose ``tokens_col`` length differs from
    ``seq_len`` (reported with a count and an example id), or a NULL
    ``id_col`` (unaddressable for resume)."""
    if os.path.exists(os.path.join(out_dir, MANIFEST)):
        raise FileExistsError(
            f"write_training_shards: {out_dir} already holds a manifest; "
            "write to a fresh directory"
        )
    # Pin the rows ONCE before the validate+write pair: they are two
    # separate actions, and a nondeterministic upstream (shuffle-order
    # ids, a re-read source) could otherwise pass validation and then
    # land different rows in the write — defeating the seq_len
    # contract this module exists to enforce. localCheckpoint
    # truncates the lineage so both actions see the same
    # materialization.
    packed = packed.localCheckpoint(eager=False)
    # validation + count in ONE aggregate job: packed is typically the
    # tail of the whole pack_sequences chain, and every extra action
    # here recomputes that chain end to end
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
            f"write_training_shards: {stats['bad']} sequence(s) violate "
            f"the contract — e.g. {r[id_col]!r} has length {r['_n']} "
            f"(expected {seq_len}) or a NULL id/tokens; refusing to "
            "write a ragged dataset"
        )
    n = stats["n"]
    if n == 0:
        # an empty export would commit a valid manifest over a data
        # dir with no parquet files, which read_training_shards cannot
        # mount (schema inference fails before the count check)
        raise ValueError(
            "write_training_shards: the relation is empty; refusing to "
            "commit a dataset no reader can mount"
        )
    data = os.path.join(out_dir, DATA_DIR)
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
        "seq_len": int(seq_len),
        "num_shards": int(num_shards),
        "n_sequences": int(n),
        "id_col": id_col,
        "tokens_col": tokens_col,
        **(extra_manifest or {}),
    }
    tmp = os.path.join(out_dir, MANIFEST + ".inprogress")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))
    return manifest


def read_training_shards(
    spark: SparkSession, out_dir: str
) -> tuple[DataFrame, dict]:
    """Mount a shard directory: refuses when the manifest is absent
    (a torn export), re-validates the row count against it, and
    returns (DataFrame with the ``shard`` column, manifest). Global
    sample order is (shard, id) — the writer's layout, so a trainer's
    resume cursor is just the last consumed (shard, id)."""
    mpath = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"read_training_shards: {out_dir} has no {MANIFEST} — "
            "incomplete or torn export; refusing to mount"
        )
    with open(mpath) as fh:
        manifest = json.load(fh)
    df = spark.read.parquet(os.path.join(out_dir, DATA_DIR))
    n = df.count()
    if n != manifest["n_sequences"]:
        raise ValueError(
            f"read_training_shards: manifest promises "
            f"{manifest['n_sequences']} sequences, data holds {n}"
        )
    return df, manifest
