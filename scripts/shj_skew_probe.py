"""SHJ-under-skew validation probe (r17, VERDICT item 5).

r16 flipped `spark.sql.join.preferSortMergeJoin=false` and set the AQE
local-map threshold (`BALBOA_SHJ_LOCALMAP_MAX`, default 128m). The
risk the verdict/advice flagged: a SKEWED BUILD-SIDE partition that
fits the planner's estimate but not executor memory OOMs where
sort-merge would have spilled. This probe plants exactly that shape
and sweeps the threshold:

- fixture (written to parquet so the static planner sees real stats):
  `skewed` — 2.5M rows, ONE bot key holding 1.5M of them (~hundreds of
  MB in one hash partition, mirroring scripts/session_skew_ab.py's
  mega-user), plus 100k normal keys; 120-char payload per row.
  `probe`  — 6M rows uniform over the same key space, 120-char payload.
  Joined on the key, `skewed` is the smaller total side = the build
  side a shuffled-hash plan would hash per partition.
- arms, each in its OWN SparkSession built by the repo's get_spark
  (so the probe validates the session defaults, not a synthetic conf):
  SMJ         BALBOA_PREFER_SMJ=true  (pre-r16 planner)
  SHJ-32m     preferSortMergeJoin=false + localmap 32m
  SHJ-128m    the shipped default
  SHJ-512m    threshold ABOVE the hot partition's size
- per arm: wall time (min of N passes) of the join through the noop
  sink, plus the REST task summary of the join stages: max task
  duration, shuffle-read bytes of the worst task, memory+disk spill —
  the r12/r13 worst-task methodology.

Run:  python scripts/shj_skew_probe.py [passes] [out_md]
Data: SPARK_GRAFT_SF_DIR-independent (synthesizes its own fixture
      under /tmp) — run on an idle host.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIX = "/tmp/shj_skew_fixture"
N_BOT = 1_500_000
N_NORMAL_KEYS = 100_000
N_NORMAL_ROWS = 1_000_000
N_PROBE = 6_000_000


def build_fixture() -> None:
    if os.path.exists(os.path.join(FIX, "_OK")):
        return
    shutil.rmtree(FIX, ignore_errors=True)
    from pyspark.sql import functions as F

    from balboa_spark.session import get_spark

    spark = get_spark("shj-skew-fixture")
    pay = F.concat(F.lit("p" * 100), F.col("id").cast("string"))
    bot = spark.range(N_BOT).select(
        F.lit(0).alias("k"), pay.alias("payload")
    )
    normal = spark.range(N_NORMAL_ROWS).select(
        (F.col("id") % N_NORMAL_KEYS + 1).alias("k"), pay.alias("payload")
    )
    bot.unionByName(normal).write.mode("overwrite").parquet(
        os.path.join(FIX, "skewed.parquet")
    )
    probe = spark.range(N_PROBE).select(
        (F.col("id") % (N_NORMAL_KEYS + 1)).alias("k"),
        pay.alias("payload"),
    )
    probe.write.mode("overwrite").parquet(os.path.join(FIX, "probe.parquet"))
    open(os.path.join(FIX, "_OK"), "w").close()
    spark.stop()


def stage_metrics(spark, ui: str) -> dict:
    base = f"{ui}/api/v1/applications/{spark.sparkContext.applicationId}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    worst_ms = worst_read = mem_spill = disk_spill = 0
    for st in stages:
        mem_spill += st.get("memoryBytesSpilled", 0)
        disk_spill += st.get("diskBytesSpilled", 0)
        try:
            det = json.load(
                urllib.request.urlopen(
                    f"{base}/stages/{st['stageId']}/{st['attemptId']}"
                    "/taskSummary?quantiles=1.0"
                )
            )
        except Exception:
            continue
        worst_ms = max(worst_ms, int(det.get("executorRunTime", [0])[-1]))
        sr = det.get("shuffleReadMetrics", {}).get("readBytes", [0])[-1]
        worst_read = max(worst_read, int(sr))
    return {
        "worst_task_ms": worst_ms,
        "worst_task_shuffle_read_mb": round(worst_read / 1e6, 1),
        "mem_spill_mb": round(mem_spill / 1e6, 1),
        "disk_spill_mb": round(disk_spill / 1e6, 1),
    }


def run_arm(name: str, env: dict, passes: int) -> dict:
    for k in ("BALBOA_PREFER_SMJ", "BALBOA_SHJ_LOCALMAP_MAX"):
        os.environ.pop(k, None)
    os.environ.update(env)
    from pyspark.sql import SparkSession

    from balboa_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # fresh session per arm: join-planner confs are session-fixed
    sb = get_spark(f"shj-skew-{name}")
    sb.stop()
    os.environ["_PROBE_UI"] = "true"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName(f"shj-skew-{name}")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.join.preferSortMergeJoin",
                env.get("BALBOA_PREFER_SMJ", "false"))
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                env.get("BALBOA_SHJ_LOCALMAP_MAX", "128m"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("BALBOA_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")  # REST metrics for the probe
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[-1]}"
    skewed = spark.read.parquet(
        os.path.join(FIX, "skewed.parquet")
    ).withColumnRenamed("payload", "payload_s")
    probe = spark.read.parquet(os.path.join(FIX, "probe.parquet"))
    # untimed warm-up (parquet footers, codegen)
    skewed.count(); probe.count()
    times = []
    err = None
    for _ in range(passes):
        t0 = time.time()
        try:
            (
                probe.join(skewed, "k")
                .select(
                    "k",
                    F.length("payload").alias("l1"),
                    F.length("payload_s").alias("l2"),
                )
                .write.mode("overwrite").format("noop").save()
            )
        except Exception as e:  # noqa: BLE001 - OOM behavior IS the result
            err = f"{type(e).__name__}: {e}"[:200]
            break
        times.append(round(time.time() - t0, 2))
    plan = (
        probe.join(skewed, "k")._jdf.queryExecution().executedPlan().toString()
    )
    strat = [s for s in ("SortMergeJoin", "ShuffledHashJoin",
                         "BroadcastHashJoin") if s in plan]
    met = stage_metrics(spark, ui)
    spark.stop()
    return {
        "arm": name,
        "times": times,
        "min": min(times) if times else None,
        "err": err,
        "static_strategy": strat,
        **met,
    }


def main() -> None:
    global F
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "plans", "r17", "shj_skew_probe.md"
    )
    from pyspark.sql import functions as F_  # noqa: N812

    globals()["F"] = F_
    build_fixture()
    arms = [
        ("SMJ", {"BALBOA_PREFER_SMJ": "true",
                 "BALBOA_SHJ_LOCALMAP_MAX": "0"}),
        ("SHJ-32m", {"BALBOA_SHJ_LOCALMAP_MAX": "32m"}),
        ("SHJ-128m", {"BALBOA_SHJ_LOCALMAP_MAX": "128m"}),
        ("SHJ-512m", {"BALBOA_SHJ_LOCALMAP_MAX": "512m"}),
    ]
    results = [run_arm(n, e, passes) for n, e in arms]
    lines = [
        "# SHJ-under-skew probe (r17, VERDICT item 5)",
        "",
        f"fixture: skewed build side {N_BOT/1e6:.1f}M-row hot key +"
        f" {N_NORMAL_ROWS/1e6:.1f}M over {N_NORMAL_KEYS/1e3:.0f}k keys;"
        f" probe side {N_PROBE/1e6:.0f}M rows; ~112-byte payloads;"
        " broadcast disabled so the join must shuffle; AQE skew-join on;"
        f" passes={passes}, local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}].",
        "",
        "| arm | min s | passes | static strategy | worst task ms |"
        " worst shuffle-read MB | mem spill MB | disk spill MB | error |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['arm']} | {r['min']} | {r['times']} |"
            f" {'/'.join(r['static_strategy'])} | {r['worst_task_ms']} |"
            f" {r['worst_task_shuffle_read_mb']} | {r['mem_spill_mb']} |"
            f" {r['disk_spill_mb']} | {r['err'] or ''} |"
        )
    text = "\n".join(lines) + "\n"
    with open(out_md, "w") as fh:
        fh.write(text)
    print(text)


if __name__ == "__main__":
    main()
