"""Mega-user sessionization skew A/B (r14).

The r13 verdict named the per-user lag+cumsum sessionization window
as the one remaining unsplittable-partition shape at 100x scale: one
bot / service account with 10^8 events is a single window partition
that cannot partial-aggregate and AQE cannot split. This probe plants
exactly that shape and measures the classic single-window formulation
against temporal.gap_sessions (two-phase gaps-and-islands) on the
same data, same session — the r12/r13 worst-task methodology (Spark
REST task summaries, shuffle-read records of the heaviest task).

Usage: python scripts/session_skew_ab.py [n_bot_events] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from balboa_spark.operators.temporal import gap_sessions

N_BOT = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/session_skew_ab"


def worst_task_rows(spark, ui, since_stage: int) -> tuple[int, int]:
    """(worst-task shuffle-read records, total shuffle-read records)
    over all stages with id > since_stage."""
    base = f"{ui}/api/v1/applications/{spark.sparkContext.applicationId}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    worst = total = 0
    for st in stages:
        if st["stageId"] <= since_stage:
            continue
        total += st.get("shuffleReadRecords", 0)
        if st.get("shuffleReadRecords", 0) == 0:
            continue
        det = json.load(
            urllib.request.urlopen(
                f"{base}/stages/{st['stageId']}/{st['attemptId']}/taskSummary"
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


def classic(df):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag = F.lag("ts").over(w)
    s = (
        df.withColumn(
            "_n",
            F.when(
                lag.isNull() | (F.col("ts") > lag + F.expr("INTERVAL 30 MINUTE")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("_n").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n"), F.min("ts").alias("s"), F.max("ts").alias("e")
    )


def two_phase(df):
    s = gap_sessions(df, 30, sess_col="session_id")
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n"), F.min("ts").alias("s"), F.max("ts").alias("e")
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    src = os.path.join(OUT, "events")
    if not os.path.exists(src):
        # ONE bot: N_BOT events, ~1/min with a >30min gap every ~997
        # events (so sessions exist but the user's history dwarfs any
        # other key); background: 50k users x 10 events
        bot = spark.range(N_BOT).select(
            F.col("id").alias("event_id"),
            F.lit(0).cast("long").alias("user_id"),
            (
                F.timestamp_seconds(
                    F.lit(1704067200)
                    + F.col("id") * 60
                    + (F.col("id") / 997).cast("long") * 2400
                )
            ).alias("ts"),
        )
        bg = spark.range(500_000).select(
            (F.col("id") + N_BOT).alias("event_id"),
            (F.pmod(F.xxhash64("id"), 50_000) + 1).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + F.pmod(F.xxhash64("id", F.lit(1)), 10_000_000)
            ).alias("ts"),
        )
        bot.unionByName(bg).write.mode("overwrite").parquet(src)
    df = spark.read.parquet(src)

    results = {}
    for name, fn in (("classic_window", classic), ("gap_sessions", two_phase)):
        since = last_stage(spark, ui)
        t0 = time.time()
        cnt = fn(df).count()
        wall = time.time() - t0
        worst, total = worst_task_rows(spark, ui, since)
        results[name] = dict(
            sessions=cnt, wall_s=round(wall, 2),
            worst_task_shuffle_rows=worst, total_shuffle_rows=total,
        )
        print(f"{name}: sessions={cnt} wall={wall:.2f}s "
              f"worst_task_rows={worst:,} total_shuffle_rows={total:,}")

    a, b = results["classic_window"], results["gap_sessions"]
    assert a["sessions"] == b["sessions"], "session counts diverged!"
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
