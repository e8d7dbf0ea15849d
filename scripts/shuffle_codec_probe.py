"""Shuffle-codec A/B at sf1 (r17, VERDICT item 7; guide §2.3).

lz4 (Spark default) vs zstd for `spark.io.compression.codec` —
shuffle blocks, broadcast and spill. sf0.1 shuffles are too small to
measure a codec (r16's recorded negative); sf1's tokenizer_drift
(~28s, vocab/encode exchanges) and pagerank (~19s, per-iteration
node-state exchanges + edge-build shuffle) are the two biggest
shuffle volumes in the bench family. Arms alternate within one
invocation (ABAB...), each arm a fresh session (the codec is
session-fixed), min-of-passes per arm.

Run: python scripts/shuffle_codec_probe.py [passes] [out_md]
Data: .scaledata/sf1 (scripts/make_scaledata.py).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = os.path.join(REPO, ".scaledata", "sf1")


def make_session(codec: str, tag: str):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"codec-{tag}")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("BALBOA_PREFER_SMJ", "false"))
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                os.environ.get("BALBOA_SHJ_LOCALMAP_MAX", "32m"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("BALBOA_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.leafNodeDefaultParallelism", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.io.compression.codec", codec)  # <- the arm
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark


def run_pass(codec: str, tag: str) -> dict:
    from pyspark.sql import functions as F

    from balboa_spark.session import load_tables

    spark = make_session(codec, tag)
    load_tables(spark, SF1)
    for t in ("documents", "orders", "lineitem"):
        spark.table(t).count()
    out = {}

    from balboa_spark.entry_queries_corpus import q_tokenizer_drift

    t0 = time.time()
    q_tokenizer_drift(spark, SF1).collect()
    out["tokenizer_drift"] = round(time.time() - t0, 2)

    from balboa_spark.operators.graph import pagerank

    orders = spark.table("orders").repartition(32)
    li = spark.table("lineitem").repartition(32)
    edges = orders.join(li, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    t0 = time.time()
    pagerank(edges, iters=3).write.mode("overwrite").format("noop").save()
    out["graph_pagerank"] = round(time.time() - t0, 2)
    spark.stop()
    return out


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "plans", "r17", "shuffle_codec_probe.md"
    )
    res = {"lz4": [], "zstd": []}
    for p in range(passes):
        for codec in ("zstd", "lz4"):
            r = run_pass(codec, f"{codec}{p}")
            res[codec].append(r)
            print(f"[codec-probe] pass {p} {codec}: {r}", flush=True)
    items = list(res["lz4"][0])
    lines = [
        "# Shuffle-codec A/B at sf1 (r17, VERDICT item 7)",
        "",
        f"spark.io.compression.codec lz4 vs zstd; interleaved arms,"
        f" fresh session per arm, min of {passes} passes;"
        f" data {SF1}; local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}].",
        "",
        "| item | lz4 passes | lz4 min | zstd passes | zstd min | zstd/lz4 |",
        "|---|---|---|---|---|---|",
    ]
    for it in items:
        l = [r[it] for r in res["lz4"]]
        z = [r[it] for r in res["zstd"]]
        lines.append(
            f"| {it} | {l} | {min(l)} | {z} | {min(z)} |"
            f" {min(z) / min(l):.2f} |"
        )
    text = "\n".join(lines) + "\n"
    with open(out_md, "w") as fh:
        fh.write(text)
    print(text)


if __name__ == "__main__":
    main()
