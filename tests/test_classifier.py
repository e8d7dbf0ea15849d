"""Learned quality classifier (operators/classifier.py): batch-GD
logistic regression whose training loop is replayed by the DuckDB
oracle. Bars: the model actually separates an obvious signal, the
trajectory is reshuffle-deterministic (the rounding discipline), and
Spark == DuckDB end to end on a small corpus."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from balboa_spark.operators import classifier as C


def _toy_docs(spark):
    rows = []
    for i in range(30):
        # curated: long-ish natural text with stopwords and variety
        rows.append(
            (i, " ".join(
                f"the quick brown fox jumps over a lazy dog w{i} v{j}"
                for j in range(3)
            ), "curated")
        )
        # junk: short, repetitive, symbol-heavy
        rows.append((100 + i, "$$$ %% " + "spam " * 4, "crawl"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_fit_separates_and_is_reshuffle_deterministic(spark):
    docs = _toy_docs(spark)
    w1 = C.logreg_fit(docs, label=F.col("source") == "curated")
    w2 = C.logreg_fit(
        docs.repartition(7), label=F.col("source") == "curated"
    )
    # the 8-decimal per-iteration rounding makes the float trajectory
    # independent of partition-sum order
    assert w1 == w2
    scored = {
        r["doc_id"]: r
        for r in C.logreg_score(docs, w1).collect()
    }
    cur = [scored[i]["score"] for i in range(30)]
    junk = [scored[100 + i]["score"] for i in range(30)]
    assert min(cur) > max(junk)  # clean separation on the toy signal
    assert all(scored[i]["score"] == scored[0]["score"] is not None for i in range(3))


def test_spark_matches_unrolled_sql_training(spark):
    """End-to-end engine parity ON THE TRAINING, not just the scorer:
    the unrolled-CTE oracle must reproduce every score exactly."""
    docs = _toy_docs(spark)
    got = [
        (r["doc_id"], r["score"], r["keep"])
        for r in C.quality_classifier(docs, "curated").orderBy("doc_id").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?,?,?)",
        [(r["doc_id"], r["text"], r["source"]) for r in docs.collect()],
    )
    want = [tuple(r) for r in con.sql(C.logreg_sql("source = 'curated'")).fetchall()]
    assert got == want


def test_score_is_pure_projection(spark):
    """Scoring with fixed weights must not shuffle or leave codegen."""
    docs = _toy_docs(spark)
    plan = (
        C.logreg_score(docs, [0.1, 0.2, -0.3, 0.4, 0.5])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_fit_on_empty_relation_raises_clearly(spark):
    import pytest

    empty = spark.createDataFrame(
        [], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError, match="empty relation"):
        C.logreg_fit(empty, label=F.col("source") == "x")
