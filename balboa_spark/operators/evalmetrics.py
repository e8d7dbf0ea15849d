"""Retrieval-quality evaluation: recall@k, MRR@k, nDCG@k.

The measurement half of the search stack: every approximate ranking
in this engine (sign-LSH, IVF, PQ/ADC, int8 quantization, BM25)
trades recall for cost, and a pipeline that deploys them needs the
trade measured ON ITS OWN DATA, not quoted from a paper. This module
computes the standard ranking metrics from two relations:

- ``results``: (qid, doc_id, rank) — the system ranking, rank
  1-based;
- ``truth``: (qid, doc_id, rel) — graded relevance, rel > 0 means
  relevant.

Per query: recall@k (relevant retrieved / total relevant), MRR@k
(1/rank of the first relevant hit, 0 if none), nDCG@k (DCG with
rel / log2(rank+1) against the ideal ordering of the truth set).

Scale shape: one equi-join of results to truth on (qid, doc_id) —
both relations are eval-sized (queries x k), orders of magnitude
below corpus size — then per-qid aggregates. The ideal-DCG window is
partitioned per query over the truth set (bounded by the eval set,
never the corpus). Everything is exact SQL-expressible arithmetic,
so driver oracles replay it verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def retrieval_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int,
    qid_col: str = "qid",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """(qid, recall, mrr, ndcg), one row per query in ``truth`` —
    including queries whose judgments are all rel <= 0 (TREC qrels
    routinely carry judged-nonrelevant rows): those score 0 across
    the board rather than silently vanishing from the mean. Metrics
    round to 6 decimals. Queries with results but no truth rows are
    dropped (undefined denominators); queries with truth but no
    results score 0."""
    res = results.filter(F.col(rank_col) <= k).select(
        F.col(qid_col).alias("_q"), F.col(doc_col).alias("_d"),
        F.col(rank_col).alias("_r"),
    )
    tru = truth.select(
        F.col(qid_col).alias("_q"), F.col(doc_col).alias("_d"),
        F.col(rel_col).cast("double").alias("_rel"),
    )
    hits = (
        res.join(tru, ["_q", "_d"], "left")
        .withColumn("_rel", F.coalesce(F.col("_rel"), F.lit(0.0)))
        .groupBy("_q")
        .agg(
            F.sum((F.col("_rel") > 0).cast("long")).alias("_n_hit"),
            F.coalesce(
                F.max(F.when(F.col("_rel") > 0, 1.0 / F.col("_r"))), F.lit(0.0)
            ).alias("_mrr"),
            F.sum(
                F.when(
                    F.col("_rel") > 0, F.col("_rel") / F.log2(F.col("_r") + 1)
                ).otherwise(0.0)
            ).alias("_dcg"),
        )
    )
    w = Window.partitionBy("_q").orderBy(F.col("_rel").desc(), F.col("_d"))
    # rank over ALL judgment rows so all-nonrelevant queries keep a
    # group; rel<=0 rows contribute nothing to n_rel/idcg
    ideal = (
        tru.withColumn("_rn", F.row_number().over(w))
        .groupBy("_q")
        .agg(
            F.sum((F.col("_rel") > 0).cast("long")).alias("_n_rel"),
            F.sum(
                F.when(
                    (F.col("_rn") <= k) & (F.col("_rel") > 0),
                    F.col("_rel") / F.log2(F.col("_rn") + 1),
                ).otherwise(0.0)
            ).alias("_idcg"),
        )
    )
    return (
        ideal.join(hits, "_q", "left")
        .select(
            F.col("_q").alias(qid_col),
            F.round(
                F.when(
                    F.col("_n_rel") > 0,
                    F.coalesce(F.col("_n_hit"), F.lit(0)) / F.col("_n_rel"),
                ).otherwise(0.0),
                6,
            ).alias("recall"),
            F.round(F.coalesce(F.col("_mrr"), F.lit(0.0)), 6).alias("mrr"),
            F.round(
                F.when(
                    F.col("_idcg") > 0,
                    F.coalesce(F.col("_dcg"), F.lit(0.0)) / F.col("_idcg"),
                ).otherwise(0.0),
                6,
            ).alias("ndcg"),
        )
    )
