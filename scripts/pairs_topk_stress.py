"""Hot-prompt stress for preference_pairs_topk (r16) — the r15
preference-family methodology (one 2M-response viral prompt + 100k
flat prompts x 10, Spark-REST worst-task shuffle-read records).

The risk shape: the k x k all-pairs expansion must stay bounded by
the CANDIDATE lists, not the response count — a single-stage
collect_list plan would land the viral prompt's 2M rows in one
reducer exactly like rejection_sample's pre-fix plan.

Usage: python scripts/pairs_topk_stress.py [n_viral]
Prints a markdown row for PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_VIRAL = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000


def worst_task_rows(spark, ui, since_stage: int) -> tuple[int, int]:
    base = f"{ui}/api/v1/applications/{spark.sparkContext.applicationId}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages"))
    worst = total = 0
    for s in stages:
        if s["stageId"] <= since_stage or s["status"] not in ("COMPLETE",):
            continue
        total += s.get("shuffleReadRecords", 0)
        if s.get("shuffleReadRecords", 0) == 0:
            continue
        det = json.load(
            urllib.request.urlopen(
                f"{base}/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=1.0"
            )
        )
        mx = det.get("shuffleReadMetrics", {}).get("readRecords", [0])[-1]
        worst = max(worst, int(mx))
    return worst, total


def last_stage(spark, ui) -> int:
    base = f"{ui}/api/v1/applications/{spark.sparkContext.applicationId}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages"))
    return max((s["stageId"] for s in stages), default=-1)


def main() -> int:
    from balboa_spark.operators.sft import preference_pairs_topk

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("BALBOA_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    viral = spark.range(N_VIRAL).select(
        F.lit(0).cast("long").alias("prompt_id"),
        F.col("id").alias("response_id"),
        F.concat(F.lit("resp"), F.col("id")).alias("response"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1_000_003)) / 1000.0)
        .alias("score"),
    )
    flat = spark.range(1_000_000).select(
        (F.col("id") % 100_000 + 1).alias("prompt_id"),
        (F.col("id") + N_VIRAL).alias("response_id"),
        F.concat(F.lit("r"), F.col("id")).alias("response"),
        (F.pmod(F.col("id") * 40503, F.lit(9973)) / 100.0).alias("score"),
    )
    ratings = viral.unionByName(flat).repartition(32).localCheckpoint()
    n = ratings.count()

    s0 = last_stage(spark, ui)
    t0 = time.time()
    out = preference_pairs_topk(ratings, k=4)
    n_pairs = out.count()
    wall = time.time() - t0
    worst, total = worst_task_rows(spark, ui, s0)
    print(
        f"| preference_pairs_topk k=4 ({N_VIRAL / 1e6:.0f}M-response viral "
        f"prompt, {n / 1e6:.1f}M rows) | {wall:.1f}s | **{worst:,}** | "
        f"{n_pairs:,} pairs out; salted dual-candidate two-stage + "
        "row-local k x k cross |"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
