"""Retrieval metrics (operators/evalmetrics.py): hand-computed
recall/MRR/nDCG cases and edge semantics."""

from __future__ import annotations

import math

from balboa_spark.operators.evalmetrics import retrieval_metrics


def test_hand_computed_metrics(spark):
    results = spark.createDataFrame(
        [
            ("q1", "b", 1), ("q1", "x", 2), ("q1", "a", 3),
            ("q3", "z", 1),  # query with no truth rows -> dropped
        ],
        "qid string, doc_id string, rank int",
    )
    truth = spark.createDataFrame(
        [
            ("q1", "a", 3), ("q1", "b", 2), ("q1", "c", 1),
            ("q2", "d", 1),  # truth but no results -> scores 0
        ],
        "qid string, doc_id string, rel int",
    )
    out = {r["qid"]: r for r in retrieval_metrics(results, truth, k=3).collect()}
    assert set(out) == {"q1", "q2"}
    q1 = out["q1"]
    assert q1["recall"] == round(2 / 3, 6)
    assert q1["mrr"] == 1.0  # first result is relevant
    dcg = 2 / math.log2(2) + 3 / math.log2(4)
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert q1["ndcg"] == round(dcg / idcg, 6)
    assert (out["q2"]["recall"], out["q2"]["mrr"], out["q2"]["ndcg"]) == (0.0, 0.0, 0.0)


def test_k_cutoff_applies_to_both_sides(spark):
    """Results beyond rank k are ignored; ideal DCG also truncates at
    k so a perfect top-k ranking scores ndcg == 1 even when the truth
    set is larger than k."""
    results = spark.createDataFrame(
        [("q", "a", 1), ("q", "b", 2), ("q", "c", 3)],
        "qid string, doc_id string, rank int",
    )
    truth = spark.createDataFrame(
        [("q", "a", 3), ("q", "b", 2), ("q", "c", 1), ("q", "d", 1)],
        "qid string, doc_id string, rel int",
    )
    r = retrieval_metrics(results, truth, k=2).collect()[0]
    assert r["ndcg"] == 1.0  # top-2 by rel, exactly the ideal prefix
    assert r["recall"] == 0.5  # 2 of 4 relevant retrieved


def test_all_nonrelevant_query_scores_zero_not_dropped(spark):
    """TREC qrels carry judged-nonrelevant (rel=0) rows; a query with
    ONLY those must appear with zeros, not vanish from the mean."""
    results = spark.createDataFrame(
        [("q", "a", 1)], "qid string, doc_id string, rank int"
    )
    truth = spark.createDataFrame(
        [("q", "a", 0), ("q", "b", 0)], "qid string, doc_id string, rel int"
    )
    rows = retrieval_metrics(results, truth, k=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["recall"], r["mrr"], r["ndcg"]) == (0.0, 0.0, 0.0)
