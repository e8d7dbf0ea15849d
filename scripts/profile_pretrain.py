"""Stage-level profile of pipeline_pretrain (bench item replica).

Times each stage of the composed pipeline separately with the noop
sink, under the same session/tables as bench.py, so the 9.7s bench
number can be attributed. Diagnostic only - not part of the bench.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    from pyspark.sql import functions as F

    from balboa_spark.session import get_spark, load_tables
    from balboa_spark.operators import corpus, dedup
    from balboa_spark.operators.corpus import (
        clean_text, gopher_filter, dsir_topk, pack_sequences,
    )

    spark = get_spark("profile-pretrain")
    load_tables(spark, SF_DIR)
    sc = spark.sparkContext

    docs = spark.table("documents")
    noisy = docs.select(
        "doc_id", "source",
        F.concat(F.lit("\x01“noise” "), F.col("text"), F.lit("\x7f")).alias("text"),
    )
    # warm-up
    noop(noisy)

    t = {}

    def stamp(name, fn):
        sc.setJobDescription(f"profile:{name}")
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 3)
        print(f"{name:24s} {t[name]:7.3f}s", flush=True)
        return out

    gated = gopher_filter(
        clean_text(noisy, text_col="text", id_col="doc_id", passthrough=("source",)),
        text_col="clean_text", id_col="doc_id",
        passthrough=("clean_text", "source"))
    ckpt = stamp("clean+gate+checkpoint", lambda: gated.select(
        F.col("doc_id"), F.col("clean_text").alias("text"), F.col("source"), F.col("keep")
    ).localCheckpoint(eager=True))
    kept0 = ckpt.filter("keep").drop("keep").persist()
    stamp("persist(kept0)", lambda: kept0.count())

    pairs = dedup.minhash_lsh_pairs(kept0, "text", "doc_id", max_bucket=1000)
    stamp("minhash_pairs(noop)", lambda: noop(pairs))

    kept = dedup.near_dedup_keep(kept0, pairs, id_col="doc_id").persist()
    stamp("keep+persist", lambda: kept.count())

    sel = dsir_topk(
        kept, kept.filter(F.col("source") == "src0"), k=2000,
        text_col="text", id_col="doc_id", target_subset=True,
    )
    stamp("dsir_topk(noop)", lambda: noop(sel))

    chosen = kept.join(sel.select("doc_id"), "doc_id", "left_semi")
    packed = pack_sequences(chosen, seq_len=128, text_col="text", id_col="doc_id")
    stamp("semi+pack(noop)", lambda: noop(packed))

    print("SUM", round(sum(t.values()), 3))

    # whole-pipeline replica for reference (fresh plan, same session)
    for p in ("pass1", "pass2"):
        sc.setJobDescription(f"profile:whole-{p}")
        t0 = time.time()
        noop(corpus.pretrain_pipeline(noisy, target_source="src0",
                                      dsir_k=2000, seq_len=128))
        print(f"whole {p}: {round(time.time() - t0, 3)}s", flush=True)


if __name__ == "__main__":
    main()
