"""Isolated bench-drift adjudication (the r15 dedup-trio methodology,
applied r16 to the r15 verdict's flags: `ann_pq_topk` — the one item
>2x in the official BENCH_r15 — and the LM/CCNet cluster).

Per item: a DEDICATED SparkSession (stopped and rebuilt between
items, so one item's shuffle files / codegen cache / GC state can't
bleed into the next), the bench's own untimed warm-up, then N timed
passes with a host-canary reading before each. The estimator is
MIN-of-passes (the r6b finding: this host shows ~30s ambient bursts
on byte-identical code; the minimum is the only statistic that
converges on engine cost).

Run: python scripts/bench_adjudicate.py [passes] [item ...]
Output: a markdown table on stdout for PERF.md.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: r14 official raw seconds (BENCH_r14.json; dsir/epoch raw were
#: truncated from the archived tail — reconstructed as normalized x
#: canary 0.617) — the trail the r15 flags are measured against.
R14_RAW = {
    "ann_pq_topk": 1.06,
    "pipeline_ccnet": 2.583,
    "pipeline_ccnet_approx": 2.188,
    "lm_kn5_perplexity": 5.841,
    "dsir_select": 2.43,
    "epoch_shuffle_write": 0.66,
}

DEFAULT_ITEMS = list(R14_RAW)


def _make_item(name: str):
    """Return fn(spark, tmp) replicating bench.py's item body."""
    from pyspark.sql import functions as F

    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def par(df):
        return df.repartition(n_cpus)

    if name == "ann_pq_topk":
        def fn(spark, tmp):
            from balboa_spark.operators import similarity

            emb = spark.table("embeddings")
            qvec = list(
                emb.filter(F.col("vec_id") == 0).first()["embedding"]
            )
            similarity.pq_topk(emb, qvec, k=20, dim=64).collect()
        return fn
    if name == "dsir_select":
        def fn(spark, tmp):
            from balboa_spark.operators import corpus

            docs = par(spark.table("documents"))
            target = docs.filter(F.col("source") == "src0")
            corpus.dsir_topk(docs, target, k=100).collect()
        return fn
    if name == "epoch_shuffle_write":
        def fn(spark, tmp):
            from balboa_spark.operators import corpus

            corpus.write_epoch_shards(
                par(spark.table("documents")).select("doc_id", "text"),
                os.path.join(tmp, f"epoch{time.monotonic_ns()}"),
                epoch=0,
                shard_hex_chars=1,
            )
        return fn
    if name in ("pipeline_ccnet", "pipeline_ccnet_approx"):
        kw = {"threshold": "approx"} if name.endswith("approx") else {}

        def fn(spark, tmp):
            from balboa_spark.operators import lm

            lm.ccnet_pipeline(
                par(spark.table("documents").select("doc_id", "source", "text")),
                **kw,
            ).write.mode("overwrite").format("noop").save()
        return fn
    if name == "lm_kn5_perplexity":
        def fn(spark, tmp):
            from balboa_spark.operators import lm

            lm.kn_ngram_lm_perplexity(
                par(spark.table("documents")), n=5
            ).write.mode("overwrite").format("noop").save()
        return fn
    raise SystemExit(f"unknown item {name!r}")


def main() -> int:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2:] or DEFAULT_ITEMS

    from balboa_spark.hostcanary import host_canary
    from balboa_spark.session import get_spark, load_tables
    from pyspark.sql.functions import pandas_udf

    print(f"# isolated adjudication: passes={passes} sf={SF_DIR}")
    print("| item | r14 raw | isolated passes | min | canaries | min/r14 |")
    print("|---|---|---|---|---|---|")
    for name in names:
        fn = _make_item(name)
        spark = get_spark(f"adjudicate-{name}")
        load_tables(spark, SF_DIR)
        # bench warm-up: parquet footers + codegen + Arrow worker
        for t in ("documents", "embeddings"):
            spark.table(t).count()

        @pandas_udf("long")
        def _warm(s: pd.Series) -> pd.Series:
            return s

        spark.range(1000).select(_warm("id")).write.mode(
            "overwrite"
        ).format("noop").save()
        tmp = tempfile.mkdtemp(prefix=f"adj_{name}_")
        ts, cans = [], []
        for _ in range(passes):
            cans.append(round(host_canary(), 3))
            t0 = time.time()
            fn(spark, tmp)
            ts.append(round(time.time() - t0, 3))
        spark.stop()
        base = R14_RAW.get(name)
        ratio = f"{min(ts) / base:.2f}" if base else "—"
        print(
            f"| {name} | {base} | {ts} | **{min(ts)}** "
            f"| {cans} (med {statistics.median(cans):.3f}) | {ratio} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
