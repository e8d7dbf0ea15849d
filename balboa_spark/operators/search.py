"""Ranked keyword retrieval over a document corpus: BM25.

Okapi BM25 (Robertson & Spärck Jones; the Lucene-style
``ln(1 + (N - df + 0.5)/(df + 0.5))`` positive IDF variant) — the
standard lexical ranking function a corpus pipeline needs for
query-based corpus exploration, hard-negative mining, and
contamination triage (which training docs would RANK for an eval
question, not just share an 8-gram with it — the scoring complement
of corpus.contamination_ngrams).

Scale shape: the only corpus-wide work is one scan producing
(doc length, query-term hits) per document. Tokens are filtered to
the query terms BEFORE the explode, so the posting relation that
shuffles is |matching (doc, term) pairs| — query-sized, not
corpus-sized. The df table (<= |query| rows) and the N/avgdl
single-row aggregate broadcast back; the final top-k is
orderBy+limit = TakeOrdered (per-partition heaps, no global sort).
A repeated-query deployment would persist the (doc, term, f, dl)
postings the same way VectorStore persists codes; this operator is
the ad-hoc path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from balboa_spark.operators.text import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query terms.

    Output: (id, n_terms, score) — n_terms = how many distinct query
    terms the document matched; score rounded to 4 decimals;
    deterministic order (score desc, id).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qarr = F.array(*[F.lit(w.lower()) for w in query_terms])
    t = tokens(F.col(text_col))
    # materialized ONCE: st feeds both the N/avgdl aggregate and the
    # posting explode — separate subtrees that would each re-tokenize
    # the corpus; after the checkpoint both read the narrow
    # (id, dl, matched-terms) relation
    st = df.select(
        F.col(id_col),
        F.size(t).alias("_dl"),
        F.filter(t, lambda x: F.array_contains(qarr, x)).alias("_qt"),
    ).localCheckpoint(eager=True)
    stats = st.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    tf = (
        st.select(F.col(id_col), "_dl", F.explode("_qt").alias("_term"))
        .groupBy(id_col, "_dl", "_term")
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    dft = tf.groupBy("_term").agg(F.count_distinct(F.col(id_col)).alias("_df"))
    idf = F.log(
        (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1
    )
    norm = F.col("_f") + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
    contrib = idf * F.col("_f") * (k1 + 1) / norm
    return (
        tf.join(F.broadcast(dft), "_term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum(contrib), 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
