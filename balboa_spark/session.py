"""SparkSession factory tuned for the engine.

Local testing runs on local[N]; the same config block is what we'd
submit to a real cluster (minus master / driver memory, which come
from spark-submit). Session timezone is pinned to UTC so timestamp
semantics match the DuckDB oracle and are cluster-invariant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "balboa_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r16 (guide §3.1/§9): let the planner pick shuffled-hash over
        # sort-merge when a side's per-partition build fits, and let
        # AQE convert planned SMJs whose post-shuffle partitions are
        # under the local-map threshold. Measured 0.85-0.94x on the
        # join-heavy bench items (tpch_q3, dedup_embedding_lsh,
        # fuzzy_pairs, dedup_near_keep; interleaved min-of-passes).
        # r17 (VERDICT item 5 skew probe, plans/r17/shj_skew_probe.md):
        # the local-map threshold compares COMPRESSED shuffle bytes but
        # the hash build lives in UNCOMPRESSED execution memory, so a
        # skewed build partition that compresses well converts at 128m
        # and then dies building ("Can't acquire 268435456 bytes memory
        # to build hash relation" — a hard failure where SMJ spills and
        # completes; reproduced at 128m AND 512m, clean at 32m). The
        # default is therefore 32m: small enough that a compressible
        # hot partition stays sort-merge, large enough that genuinely
        # small post-shuffle partitions (the bench's, and any
        # well-partitioned join at scale) still convert. The static
        # flip stayed SMJ in every probe arm (the AQE threshold was the
        # failing trigger); set BALBOA_PREFER_SMJ=true to restore the
        # sort-merge-only static planner per deployment.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("BALBOA_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("BALBOA_SHJ_LOCALMAP_MAX", "32m"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("BALBOA_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # local-literal relations (tests, tiny dims) don't need 32 tasks
        .config("spark.sql.leafNodeDefaultParallelism", "8")
        # driver testdata stores events.ts as TIMESTAMP(NANOS); read the
        # raw int64 and convert in load_tables (Spark has no ns type)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Register every driver parquet table as a temp view; return dict of DataFrames."""
    if names is None:
        names = (
            "region",
            "nation",
            "customer",
            "supplier",
            "part",
            "orders",
            "lineitem",
            "events",
            "documents",
            "embeddings",
        )
    # Defensive runtime confs: the driver calls queries() with its own
    # session; pin the confs correctness depends on (UTC timestamps,
    # ns-parquet reading) if they are runtime-settable here.
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.adaptive.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    out = {}
    for n in names:
        path = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(path):
            df = _read_parquet_norm(spark, path)
            df.createOrReplaceTempView(n)
            out[n] = df
    return out


def _read_parquet_norm(spark: SparkSession, path: str):
    """Read parquet, normalizing timestamp physical types the writer may
    vary between runs:

    - TIMESTAMP(NANOS) columns (surfaced as raw int64 under nanosAsLong)
      are converted back to TimestampType by truncating to microseconds —
      the same floor DuckDB applies, so the oracle sees identical values.
    - TIMESTAMP_NTZ columns (pandas-written timestamp[us] without the
      UTC-adjusted flag) are cast to TimestampType. The session timezone
      is pinned UTC, so the cast reinterprets the same wall-clock value
      as the same instant — hash-exact vs the oracle, and downstream
      operators (unix_micros, window(), unix_timestamp) all require
      TIMESTAMP rather than TIMESTAMP_NTZ.
    """
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    df = spark.read.parquet(path)
    try:
        arrow_schema = pq.read_schema(path)
        ns_cols = [f.name for f in arrow_schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        ns_cols = []
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    ntz_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
