"""Corpus-preparation operators for large-scale training-data
pipelines: repetition/quality signals, deterministic splits, vocabulary
statistics, and benchmark-contamination detection.

These extend the engine beyond the reference's own surface (SURVEY §7
step 7 — the scale-path operator family alongside dedup/similarity/
text). Everything is built-in Column expressions — JVM-side, no Python
UDFs — and each operator has a DuckDB oracle twin in
entry_queries_docs.py.

Scale notes (100 TB):
- repetition_signals / hash_split are pure projections: no shuffle, no
  per-doc state beyond the row. The n-gram mode computation is O(m²)
  in the per-document token count m — bounded per row, embarrassingly
  parallel, never a cross-document join.
- vocab_topk is one shuffle with map-side partial aggregation followed
  by a TakeOrdered top-k (no global sort materialized).
- contamination_ngrams broadcasts only the BENCHMARK side — an eval
  set is bounded by construction (thousands of docs), never corpus-
  cardinality — and shuffles the corpus once on the n-gram key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from balboa_spark.operators.text import _shingles, tokens

# Gopher-style keep thresholds (Rae et al. 2021, table A1 shape —
# values tuned to the synthetic corpus so both classes occur; see the
# oracle twin which encodes the same constants).
MIN_TOKENS = 30
MAX_DUP_TOKEN_FRAC = 0.6
MAX_TOP_2GRAM_FRAC = 0.1

#: 80/10/10 split thresholds on the 256-bucket md5 prefix:
#: bucket < 204 -> train, < 230 -> val, else test. Hex-string compare
#: is enough because hex digits sort numerically.
SPLIT_SALT = "split"
TRAIN_HEX, VAL_HEX = "cc", "e6"  # 204/256 = 79.7 %, 230/256 = 89.8 %


def _mode_frac(grams: Column) -> Column:
    """count(most frequent element) / len, as a column expression.

    O(m²) per row via transform-over-distinct — per-document bounded,
    no shuffle. ``grams`` must be a materialized column reference (not
    an inline subtree): it is referenced twice.
    """
    counts = F.transform(
        F.array_distinct(grams),
        lambda d: F.size(F.filter(grams, lambda x: x == d)),
    )
    return F.when(
        F.size(grams) > 0,
        F.round(F.array_max(counts).cast("double") / F.size(grams), 4),
    ).otherwise(F.lit(0.0))


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition/quality signals per document:

    - n_tokens            whitespace token count
    - dup_token_frac      1 - distinct_tokens / n_tokens
    - top_2gram_frac      count(mode 2-gram) / n_2grams
    - top_3gram_frac      count(mode 3-gram) / n_3grams
    - symbol_token_ratio  (#, ellipsis) occurrences / n_tokens

    Staged selects keep each array subtree computed once (Catalyst
    re-inlines multi-referenced aliases only when cheap; the token
    arrays are not, so the projection boundaries hold them staged).
    """
    t = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        tokens(t).alias("_tk"),
        F.regexp_count(t, F.lit(r"#|\.\.\.|…")).alias("_sym"),
    ).select(
        id_col,
        "_tk",
        "_sym",
        _shingles(F.col("_tk"), 2).alias("_g2"),
        _shingles(F.col("_tk"), 3).alias("_g3"),
    )
    n = F.size(F.col("_tk"))
    return staged.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(
            1.0
            - F.size(F.array_distinct(F.col("_tk"))).cast("double")
            / F.greatest(n, F.lit(1)),
            4,
        ).alias("dup_token_frac"),
        _mode_frac(F.col("_g2")).alias("top_2gram_frac"),
        _mode_frac(F.col("_g3")).alias("top_3gram_frac"),
        F.round(F.col("_sym").cast("double") / F.greatest(n, F.lit(1)), 4).alias(
            "symbol_token_ratio"
        ),
    )


def gopher_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """repetition_signals + a ``keep`` verdict column (the composed
    quality gate a pipeline would filter on)."""
    sig = repetition_signals(df, text_col, id_col)
    return sig.withColumn(
        "keep",
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("dup_token_frac") <= MAX_DUP_TOKEN_FRAC)
        & (F.col("top_2gram_frac") <= MAX_TOP_2GRAM_FRAC),
    )


def hash_split(
    df: DataFrame, id_col: str = "doc_id", salt: str = SPLIT_SALT
) -> DataFrame:
    """Deterministic, reshuffle-stable train/val/test assignment.

    The split key is md5(id:salt) — stable under repartitioning,
    re-ingestion, and cluster size, unlike randomSplit. The first two
    hex digits give 256 uniform buckets; comparing them as strings is
    exact because hex digits sort numerically. Pure projection: no
    shuffle, no RNG state.
    """
    hx = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, 2
    )
    return df.withColumn(
        "split",
        F.when(hx < TRAIN_HEX, "train").when(hx < VAL_HEX, "val").otherwise("test"),
    )


def vocab_topk(
    df: DataFrame, text_col: str = "text", k: int = 50
) -> DataFrame:
    """Corpus vocabulary: top-k tokens by total occurrences
    (ties broken by token asc), with document frequency.

    One explode + one groupBy shuffle (map-side combined); the top-k
    is a TakeOrdered over the aggregated (small) relation, not a full
    sort of the corpus.
    """
    tok = df.select(
        F.col("doc_id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return counts.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(k)


def contamination_ngrams(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination scan: for each corpus document, the
    number of distinct word n-grams it shares with ANY benchmark
    document (eval-set leakage detection, WMDP/GPT-3-style 8-gram
    overlap).

    The benchmark n-gram set is exploded, deduplicated, and BROADCAST
    — an eval set is bounded (thousands of docs), so this is the one
    place a broadcast is structurally safe at 100 TB. The corpus side
    streams through one explode + semi-equi-join + groupBy on the
    document id; no corpus-cardinality relation is ever collected or
    broadcast.
    """
    bench_grams = (
        benchmark.select(
            F.explode(_shingles(tokens(F.col(text_col)), n)).alias("gram")
        )
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col),
        F.explode_outer(F.array_distinct(_shingles(tokens(F.col(text_col)), n))).alias(
            "gram"
        ),
    )
    hits = corpus_grams.join(F.broadcast(bench_grams), "gram")
    return (
        hits.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
        .orderBy(id_col)
    )
