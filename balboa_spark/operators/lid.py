"""Character-n-gram language identification — the CCNet chain's LID
stage (Wenzek et al. 2020 fig. 1: dedup -> LID -> LM; the paper uses
fastText, Joulin et al. 2017, for which ``fasttext_lang_id`` is the
import-gated slot).

The built-in engine is a multinomial Naive Bayes over character
n-grams (the classic LID recipe: Cavnar & Trenkle 1994; Dunning 1994),
expressed entirely as DataFrame algebra so training AND scoring are
SQL-replayable by the driver's DuckDB oracle — the same
engine-replayable contract as ``classifier.py``'s logreg:

    score(doc, L) = log P(L) + sum over char n-gram occurrences g of
                    log (c_L(g) + alpha) / (tot_L + alpha * V)

with V the distinct-gram vocabulary across ALL languages (one shared
smoothing denominator base, so unseen grams cost each language its
own OOV penalty).

Scale shape: the model is two relations — a gram-type-sized count
table (lang, gram, c), never collected to the driver, and a
#languages-sized (lang, tot, logprior) table that broadcasts. Scoring
is one explode over the corpus, one broadcast cross join with the
language table (the x|L| blowup — |L| is the label alphabet, dozens
at most), one gram-keyed LEFT join against the count table
(broadcast under BALBOA_LID_BROADCAST_MAX_ROWS using the exact row
count recorded at train time — the corpus-scale gram stream then
never exchanges; shuffled above the gate), and a partial-aggregating
groupBy(id, lang) sum. The winner pick is a row_number window
partitioned by doc id whose partition size is EXACTLY |L| rows by
construction — bounded, unlike a content-keyed window, so it is not a
skew hazard. Scores are rounded to 6 decimals before ranking (the
quality_bins cross-engine convention) with the language as the
deterministic tie-break.

Documents with no char n-gram (text shorter than n after lowering)
are absent from the output — the LM scorers' absence contract.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class LIDModel(NamedTuple):
    """Trained char-n-gram NB model: ``counts`` is the gram-type-sized
    (lang, gram, c) relation; ``langs`` the tiny (lang, tot, logprior)
    relation; ``vocab`` the shared distinct-gram count. ``n_rows`` is
    the exact row count of ``counts`` (known for free at train time),
    letting the scorer broadcast the count table under a size gate —
    the checkpointed relation carries no size statistics, so the
    planner alone would never pick the broadcast."""

    counts: DataFrame
    langs: DataFrame
    vocab: int
    n: int
    alpha: float
    n_rows: int = -1


def _bcast_max_count_rows() -> int:
    """Gate for broadcasting the (lang, gram, c) count table in
    score_langs — read lazily per call (tunable per session). A row is
    ~40 bytes framed; the 2M default is ~80 MB broadcast, the same
    envelope as graph.py's node-state gate. Set 0 to disable."""
    import os

    return int(os.environ.get("BALBOA_LID_BROADCAST_MAX_ROWS", "2000000"))


def char_ngrams(text: Column, n: int) -> Column:
    """Array of overlapping character n-grams of ``lower(text)`` —
    ``substr`` over a generated index sequence, all JVM-side. Guarded
    for short text: ``sequence(1, 0)`` would COUNT DOWN (Spark's
    default negative step), so texts shorter than ``n`` map to an
    explicit empty array instead."""
    s = F.lower(text)
    cnt = F.length(s) - F.lit(n - 1)
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(1), cnt), lambda i: s.substr(i, F.lit(n))
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_char_ngram_lid(
    train: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    alpha: float = 1.0,
) -> LIDModel:
    """Train the NB model from a labeled (label_col, text_col) frame.
    One explode + one groupBy(lang, gram) (map-side combinable); the
    per-language totals and doc-count priors are one aggregate each
    over the count/table relations; only the |L|-sized language table
    and one scalar (V) reach the driver."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    g = train.select(
        F.col(label_col).alias("lang"),
        F.explode(char_ngrams(F.col(text_col), n)).alias("gram"),
    )
    counts = (
        g.groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    # one aggregate yields BOTH the shared vocabulary size and the
    # exact count-table row count (r17: feeds the scorer's broadcast
    # gate) — same single job the distinct().count() used to be
    vrow = counts.agg(
        F.countDistinct("gram").alias("v"), F.count(F.lit(1)).alias("r")
    ).collect()[0]
    vocab, n_rows = vrow["v"], vrow["r"]
    tots = counts.groupBy("lang").agg(F.sum("c").alias("tot"))
    ndocs = train.groupBy(F.col(label_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = train.count()
    langs = (
        tots.join(ndocs, ["lang"])
        .select(
            "lang",
            "tot",
            F.log(F.col("n_docs").cast("double") / F.lit(float(total))).alias(
                "logprior"
            ),
        )
        .localCheckpoint(eager=True)
    )
    return LIDModel(counts=counts, langs=langs, vocab=int(vocab), n=n,
                    alpha=float(alpha), n_rows=int(n_rows))


def score_langs(
    df: DataFrame,
    model: LIDModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(document, language) NB log-score: ``(id_col, lang,
    score)`` with score rounded to 6 decimals (cross-engine hash
    stability). One row per doc per language."""
    # pre-aggregate to (doc, gram, occurrences) BEFORE the x|L| blowup:
    # a 10 kB document holds ~10k trigram occurrences but only ~1-3k
    # distinct trigrams, and sum over occurrences == count-weighted sum
    # over types — the cross join, the count-table join, and the final
    # aggregate all shrink by the repetition factor (r12 review)
    g = (
        df.select(
            F.col(id_col),
            F.explode(char_ngrams(F.col(text_col), model.n)).alias("gram"),
        )
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    al = float(model.alpha)
    lp = F.log(
        (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(al))
        / (F.col("tot").cast("double") + F.lit(al * model.vocab))
    )
    # r17 (guide §2.4/§3.1): the count table is gram-type-sized —
    # bounded by |charset|^n x |L|, NOT corpus-sized — so under the
    # gate it broadcasts and the exploded doc-gram stream (the
    # corpus-scale side) flows straight into the partial aggregate
    # with NO Exchange; above the gate the join shuffles as before.
    # Left join + build-right is BHJ-legal; same rows either way.
    cnts = model.counts
    if 0 <= model.n_rows <= _bcast_max_count_rows():
        cnts = F.broadcast(cnts)
    per_lang = (
        g.crossJoin(F.broadcast(model.langs))
        .join(cnts, ["lang", "gram"], "left")
        .select(
            F.col(id_col),
            F.col("lang"),
            F.col("logprior"),
            (F.col("occ").cast("double") * lp).alias("lp"),
        )
        .groupBy(id_col, "lang")
        .agg(F.first("logprior").alias("logprior"), F.sum("lp").alias("gsum"))
    )
    return per_lang.select(
        F.col(id_col),
        F.col("lang"),
        F.round(F.col("logprior") + F.col("gsum"), 6).alias("score"),
    )


def classify_lang(
    df: DataFrame,
    model: LIDModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Argmax language per document: ``(id_col, lang, score)``.
    Winner = highest rounded score, ties broken by language ascending
    — ``min(struct(-score, lang))`` per document (r16: replaces the
    per-doc row_number window; a struct-min aggregate is PARTIAL —
    the doc x |L| relation collapses map-side before the exchange and
    nothing is sorted, where the window shuffled and sorted every
    (doc, lang) row. Negating the rounded score inside the struct
    keeps the exact (score desc, lang asc) order; scores are never
    NULL — every emitted (doc, lang) row carries a finite log-sum)."""
    scored = score_langs(df, model, text_col, id_col)
    return (
        scored.select(
            F.col(id_col),
            F.struct(
                (-F.col("score")).alias("_ns"),
                F.col("lang").alias("lang"),
                F.col("score").alias("score"),
            ).alias("_s"),
        )
        .groupBy(id_col)
        .agg(F.min("_s").alias("_s"))
        .select(F.col(id_col), F.col("_s.lang"), F.col("_s.score"))
    )


def fasttext_lang_id(
    df: DataFrame,
    model_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's actual LID: a fastText ``lid.176.bin`` model scored via
    an Arrow-batched mapInPandas (one model load per executor python
    worker, vectorized predict per batch). Import-gated like the
    multimodal codec arms — fastText is not installable in this
    sandbox (pip is network-denied, documented PERF.md), so the path
    raises until the dependency exists; the NB engine above is the
    tested default."""
    try:
        import fasttext  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-gated
        raise NotImplementedError(
            "fasttext is not installed; use train_char_ngram_lid/"
            "classify_lang (the built-in NB engine) or install "
            "fasttext and a lid.176.bin model"
        ) from e
    import pandas as pd  # pragma: no cover - env-gated

    # derive the id field's type from the frame — nothing in this
    # family requires long ids, and a hardcoded 'long' would fail the
    # Arrow cast for string-keyed corpora (r12 review)
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, lang string, score double"

    def scorer(batches):  # pragma: no cover - env-gated
        model = fasttext.load_model(model_path)
        for pdf in batches:
            labels, probs = model.predict(
                [
                    (t or "").replace("\n", " ")
                    for t in pdf[text_col].tolist()
                ]
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "lang": [ls[0].replace("__label__", "") for ls in labels],
                    "score": [float(ps[0]) for ps in probs],
                }
            )

    return df.select(id_col, text_col).mapInPandas(scorer, schema)
