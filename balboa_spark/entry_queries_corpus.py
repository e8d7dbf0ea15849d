"""Driver queries + DuckDB oracles for the corpus-preparation
operators (balboa_spark.operators.corpus): repetition/quality signals,
deterministic hash split, vocabulary top-k, benchmark contamination.

The oracle SQL is generated from the same constants the Spark
operators use (thresholds, salt, n-gram sizes) so both sides express
one definition.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from balboa_spark.obsmap import with_obs_cte
from balboa_spark.operators import corpus
from balboa_spark.operators.corpus import (
    MAX_DUP_TOKEN_FRAC,
    MAX_TOP_2GRAM_FRAC,
    MIN_TOKENS,
    PII_RULES,
    SPLIT_SALT,
    TRAIN_HEX,
    VAL_HEX,
    sample_threshold_hex,
)
from balboa_spark.session import load_tables

#: DuckDB token CTE shared by every oracle here (identical tokenizer
#: to operators.text.tokens: lowercase, split on whitespace, drop
#: empties).
_TOKS_SQL = r"""
toks AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
  FROM documents
)
"""


def _grams_sql(src: str, k: int) -> str:
    """DuckDB word k-shingles of a token-list column ``tk`` (1-based,
    inclusive list_slice) — the twin of operators.text._shingles."""
    return (
        f"CASE WHEN len({src}) >= {k} THEN "
        f"list_transform(range(1, len({src}) - {k - 2}), "
        f"i -> array_to_string(list_slice({src}, i, i + {k - 1}), ' ')) "
        f"ELSE [] END"
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, names=("documents",))["documents"]


# ---------------------------------------------------------------------------
# repetition / quality signals (Gopher-style)
# ---------------------------------------------------------------------------

def q_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.gopher_filter(_docs(spark, sf_dir)).orderBy("doc_id")


_MODE_FRAC_SQL = (
    "CASE WHEN len({g}) > 0 THEN round(list_max(list_transform("
    "list_distinct({g}), d -> len(list_filter({g}, x -> x = d))))::DOUBLE"
    " / len({g}), 4) ELSE 0.0 END"
)

QUALITY_SIGNALS_ORACLE = f"""
WITH {_TOKS_SQL},
grams AS (
  SELECT doc_id, tk,
         {_grams_sql('tk', 2)} AS g2,
         {_grams_sql('tk', 3)} AS g3,
         len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS sym
  FROM toks
),
sig AS (
  SELECT doc_id,
         len(tk) AS n_tokens,
         round(1.0 - len(list_distinct(tk))::DOUBLE / greatest(len(tk), 1), 4)
           AS dup_token_frac,
         {_MODE_FRAC_SQL.format(g='g2')} AS top_2gram_frac,
         {_MODE_FRAC_SQL.format(g='g3')} AS top_3gram_frac,
         round(sym::DOUBLE / greatest(len(tk), 1), 4) AS symbol_token_ratio
  FROM grams
)
SELECT *,
       (n_tokens >= {MIN_TOKENS}
        AND dup_token_frac <= {MAX_DUP_TOKEN_FRAC}
        AND top_2gram_frac <= {MAX_TOP_2GRAM_FRAC}) AS keep
FROM sig ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# deterministic hash split
# ---------------------------------------------------------------------------

def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        corpus.hash_split(_docs(spark, sf_dir))
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


HASH_SPLIT_ORACLE = f"""
SELECT doc_id,
       CASE WHEN hb < '{TRAIN_HEX}' THEN 'train'
            WHEN hb < '{VAL_HEX}' THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         substring(md5(doc_id::VARCHAR || ':{SPLIT_SALT}'), 1, 2) AS hb
  FROM documents
) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# vocabulary top-k
# ---------------------------------------------------------------------------

VOCAB_K = 50


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.vocab_topk(_docs(spark, sf_dir), k=VOCAB_K)


VOCAB_TOPK_ORACLE = f"""
WITH {_TOKS_SQL},
tok AS (SELECT doc_id, unnest(tk) AS token FROM toks)
SELECT token,
       count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs
FROM tok GROUP BY token
ORDER BY n_occurrences DESC, token ASC
LIMIT {VOCAB_K}
"""


# ---------------------------------------------------------------------------
# benchmark contamination (8-gram overlap, GPT-3/WMDP style)
# ---------------------------------------------------------------------------

NGRAM_N = 8
BENCH_MOD = 7  # benchmark = last-token-dropped variants of doc_id % 7 == 0


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic eval set: the last-token-dropped variants of every
    7th document — partial-overlap positives by construction (the
    same planting trick the near-dup oracles use)."""
    docs = _docs(spark, sf_dir)
    from balboa_spark.operators.text import tokens

    tk = F.col("_tk")
    # r17: hand the sliced token array straight to the gram kernel —
    # the array_join(" ") + re-tokenize round-trip segmented back to
    # the identical array (tokens are lowercase and whitespace-free),
    # one dead split(lower chain in the plan
    bench = (
        docs.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(tokens(F.col("text")).alias("_tk"))
        .select(F.slice(tk, 1, F.size(tk) - 1).alias("_tk"))
    )
    return corpus.contamination_ngrams(
        docs, bench, n=NGRAM_N, bench_tokens_col="_tk"
    )


CONTAMINATION_ORACLE = f"""
WITH {_TOKS_SQL},
bench_g AS (
  SELECT DISTINCT unnest({_grams_sql('list_slice(tk, 1, len(tk) - 1)', NGRAM_N)}) AS gram
  FROM toks WHERE doc_id % {BENCH_MOD} = 0
),
corpus_g AS (
  SELECT doc_id, unnest(list_distinct({_grams_sql('tk', NGRAM_N)})) AS gram
  FROM toks
)
SELECT c.doc_id, count(*) AS n_shared_ngrams
FROM corpus_g c JOIN bench_g b USING (gram)
GROUP BY c.doc_id ORDER BY c.doc_id
"""


# ---------------------------------------------------------------------------
# PII redaction (exercised on observation-derived log lines, whose
# rdata is IPv4-shaped and whose sensor id forms a real email — both
# patterns fire on every row)
# ---------------------------------------------------------------------------

#: shared Spark-SQL/DuckDB body building the text to scrub
_PII_LINES_BODY = """
SELECT event_id,
       concat('user ', sensor_id, '@clients.example.com queried ',
              rrname, ' -> ', rdata) AS text
FROM input_observations
"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("events",))
    lines = spark.sql(with_obs_cte(_PII_LINES_BODY))
    return corpus.redact_pii(lines, id_col="event_id").orderBy("event_id")


def _pii_redact_sql(col: str) -> str:
    expr = col
    for _, pat, repl in PII_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


_PII_COUNTS_SQL = ", ".join(
    f"len(regexp_extract_all(text, '{pat}')) AS {name}"
    for name, pat, _ in PII_RULES
)

PII_REDACT_ORACLE = with_obs_cte(
    f"""
SELECT event_id,
       {_pii_redact_sql('text')} AS text_redacted,
       {_PII_COUNTS_SQL}
FROM ({_PII_LINES_BODY})
ORDER BY event_id
"""
)


# ---------------------------------------------------------------------------
# deterministic stratified sample
# ---------------------------------------------------------------------------

SAMPLE_FRACS = {"en": 0.5, "zh": 0.2}
SAMPLE_DEFAULT = 0.1
SAMPLE_SALT = "sample"


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        corpus.hash_sample(
            _docs(spark, sf_dir), SAMPLE_FRACS, SAMPLE_DEFAULT, salt=SAMPLE_SALT
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


_SAMPLE_CASE = " ".join(
    f"WHEN '{s}' THEN '{sample_threshold_hex(f)}'" for s, f in sorted(SAMPLE_FRACS.items())
)

HASH_SAMPLE_ORACLE = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         substring(md5(doc_id::VARCHAR || ':{SAMPLE_SALT}'), 1, 8) AS h8
  FROM documents
)
WHERE h8 < CASE lang {_SAMPLE_CASE}
           ELSE '{sample_threshold_hex(SAMPLE_DEFAULT)}' END
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# trigram familiarity (CCNet-style LM quality proxy)
# ---------------------------------------------------------------------------

def q_trigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.trigram_familiarity(_docs(spark, sf_dir)).orderBy("doc_id")


TRIGRAM_FAMILIARITY_ORACLE = """
WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
tri AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t) - 1), i -> t[i:i+2])) AS tri
  FROM t
),
freq AS (SELECT tri, count(*) AS freq FROM tri GROUP BY tri),
scored AS (
  SELECT doc_id,
         count(*) AS n_trigrams,
         cast(sum(freq) AS BIGINT) AS sum_freq
  FROM tri JOIN freq USING (tri)
  GROUP BY doc_id
)
SELECT doc_id, n_trigrams, sum_freq,
       sum_freq::DOUBLE / n_trigrams::DOUBLE AS familiarity
FROM scored ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# token-window chunking (context-window prep)
# ---------------------------------------------------------------------------

CHUNK_WINDOW, CHUNK_STRIDE = 40, 32


def q_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.chunk_tokens(
        _docs(spark, sf_dir), window=CHUNK_WINDOW, stride=CHUNK_STRIDE
    ).orderBy("doc_id", "chunk_id")


CHUNK_TOKENS_ORACLE = f"""
WITH {_TOKS_SQL},
c AS (
  SELECT doc_id, tk, len(tk) AS n,
         (greatest(len(tk) - {CHUNK_WINDOW}, 0) + {CHUNK_STRIDE - 1})
           // {CHUNK_STRIDE} + 1 AS n_chunks
  FROM toks WHERE len(tk) > 0
),
e AS (SELECT doc_id, tk, n, unnest(range(0, n_chunks)) AS chunk_id FROM c)
SELECT doc_id,
       chunk_id::INTEGER AS chunk_id,
       least({CHUNK_WINDOW}, n - chunk_id * {CHUNK_STRIDE})::INTEGER
         AS n_chunk_tokens,
       array_to_string(
         list_slice(tk, chunk_id * {CHUNK_STRIDE} + 1,
                    chunk_id * {CHUNK_STRIDE} + {CHUNK_WINDOW}), ' ')
         AS chunk_text
FROM e ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# per-document TF-IDF-style keywords (integer-only ranking)
# ---------------------------------------------------------------------------

TFIDF_K = 3
#: 0.8 on the synthetic corpus (31-token vocabulary, DF median ~0.78)
#: keeps most of the vocabulary rankable while still exercising the
#: DF-cap stopword path.
TFIDF_MAX_DOC_FRAC = 0.8


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.tfidf_keywords(
        _docs(spark, sf_dir), k=TFIDF_K, max_doc_frac=TFIDF_MAX_DOC_FRAC
    ).orderBy("doc_id", "rank")


TFIDF_KEYWORDS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            t -> t <> '')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, rank, token, tf, df FROM (
  SELECT t.doc_id, t.token, t.tf, d.df,
         CAST(row_number() OVER (
           PARTITION BY t.doc_id
           ORDER BY t.tf DESC, d.df ASC, t.token ASC
         ) AS INTEGER) AS rank
  FROM tf t JOIN dfreq d USING (token)
  WHERE d.df <= (SELECT CAST(floor({TFIDF_MAX_DOC_FRAC} * n_docs) AS BIGINT) FROM n)
) WHERE rank <= {TFIDF_K}
ORDER BY doc_id, rank
"""




# ---------------------------------------------------------------------------
# Cross-document boilerplate ratio + quantile quality binning
# ---------------------------------------------------------------------------

BOILER_K = 5
BOILER_MIN_DF = 2


def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.boilerplate_ratio(
        _docs(spark, sf_dir), k=BOILER_K, min_df=BOILER_MIN_DF
    ).orderBy("doc_id")


BOILERPLATE_ORACLE = f"""
WITH {_TOKS_SQL},
grams AS (
  SELECT doc_id, unnest(list_distinct({_grams_sql('tk', BOILER_K)})) AS gram
  FROM toks
),
gdf AS (SELECT gram, count(*) AS df FROM grams GROUP BY 1)
SELECT doc_id, count(*) AS n_grams,
       CAST(sum(CASE WHEN df >= {BOILER_MIN_DF} THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       round(sum(CASE WHEN df >= {BOILER_MIN_DF} THEN 1 ELSE 0 END)
             / count(*), 6) AS common_ratio
FROM grams JOIN gdf USING (gram)
GROUP BY doc_id ORDER BY doc_id
"""

QBIN_PROBS = (0.25, 0.5, 0.75)


def q_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.quality_bins(
        _docs(spark, sf_dir), score_col="n_chars", probs=QBIN_PROBS
    ).orderBy("doc_id")


QUALITY_BINS_ORACLE = f"""
WITH b AS (
  SELECT list_transform(quantile_cont(n_chars, {list(QBIN_PROBS)}),
                        x -> round(x, 6)) AS q
  FROM documents
)
SELECT doc_id, n_chars AS score,
       CAST(len(list_filter((SELECT q FROM b), x -> x <= n_chars)) AS INTEGER) AS bin
FROM documents ORDER BY doc_id
"""




# ---------------------------------------------------------------------------
# Domain-mixture resampling
# ---------------------------------------------------------------------------

MIX_SALT = "mix"
#: target mixture over the synthetic corpus's source domains
MIX_TARGET = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


def q_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.mixture_resample(
        _docs(spark, sf_dir).select("doc_id", "source"),
        MIX_TARGET,
        salt=MIX_SALT,
    ).orderBy("doc_id")


def _mixture_oracle() -> str:
    total = sum(MIX_TARGET.values())
    values = ", ".join(
        f"('{g}', {w / total!r})" for g, w in sorted(MIX_TARGET.items())
    )
    return f"""
WITH tgt(source, w) AS (VALUES {values}),
counts AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
cap AS (SELECT source, n, w, n / w AS ratio FROM counts JOIN tgt USING (source)),
m AS (SELECT min(ratio) AS min_ratio FROM cap),
fracs AS (
  SELECT source,
         round((SELECT min_ratio FROM m) * w / n * {16**8}) AS v
  FROM cap
)
SELECT doc_id, source FROM documents
JOIN fracs USING (source)
WHERE substr(md5(doc_id || ':{MIX_SALT}'), 1, 8)
      < CASE WHEN v >= {16**8} THEN 'g'
             ELSE lpad(lower(hex(CAST(v AS BIGINT))), 8, '0') END
ORDER BY doc_id
"""


#: token budgets for the budgeted-mixture entry: src1 is UNDER budget
#: (kept whole — the least-upper-bound edge), src0/src2 are partially
#: sampled at different rates, all other sources drop.
BUDGET_TARGET = {"src0": 700, "src1": 2000, "src2": 400}
BUDGET_SALT = "budget13"


def q_mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture (corpus.mixture_token_budget): production
    mixtures are specified in tokens, not document proportions. The
    hash checks the whole arithmetic chain — per-group token totals,
    the min(1, budget/total) keep fraction, the shared md5-threshold
    rule — including the kept-whole under-budget group."""
    return corpus.mixture_token_budget(
        _docs(spark, sf_dir).select("doc_id", "source", "text"),
        BUDGET_TARGET,
        salt=BUDGET_SALT,
    ).select("doc_id", "source").orderBy("doc_id")


def _mixture_budget_oracle() -> str:
    values = ", ".join(
        f"('{g}', {int(b)})" for g, b in sorted(BUDGET_TARGET.items())
    )
    return rf"""
WITH tgt(source, b) AS (VALUES {values}),
tot AS (
  SELECT source,
         sum(len(list_filter(string_split_regex(lower(text), '\s+'),
                             t -> t <> ''))) AS tok
  FROM documents GROUP BY 1
),
fracs AS (
  SELECT source,
         round(least(1.0, b / CAST(tok AS DOUBLE)) * {16**8}) AS v
  FROM tot JOIN tgt USING (source)
)
SELECT doc_id, source FROM documents
JOIN fracs USING (source)
WHERE substr(md5(doc_id || ':{BUDGET_SALT}'), 1, 8)
      < CASE WHEN v >= {16**8} THEN 'g'
             ELSE lpad(lower(hex(CAST(v AS BIGINT))), 8, '0') END
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# text cleaning (C4/CCNet-style normalization)
# ---------------------------------------------------------------------------

#: deterministic noise wrapped around each document so the cleaning is
#: observable on the synthetic corpus (which is already clean): a SOH
#: control char, curly quotes, an NBSP, and a trailing DEL.
_NOISE_PRE = "\x01“noise” "
_NOISE_POST = "\x7f"


def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    noisy = docs.select(
        "doc_id",
        F.concat(F.lit(_NOISE_PRE), F.col("text"), F.lit(_NOISE_POST)).alias("text"),
    )
    return corpus.clean_text(noisy).orderBy("doc_id")


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _clean_text_oracle() -> str:
    from balboa_spark.operators.corpus import (
        CLEAN_CTRL_RE,
        CLEAN_PUNCT_FROM,
        CLEAN_PUNCT_TO,
    )

    pre = "chr(1) || '“noise”' || chr(160)"
    post = "chr(127)"
    return f"""
WITH noisy AS (
  SELECT doc_id, {pre} || text || {post} AS text FROM documents
),
c AS (
  SELECT doc_id, text,
         trim(regexp_replace(
           translate(
             regexp_replace(text, {_sql_str(CLEAN_CTRL_RE)}, '', 'g'),
             {_sql_str(CLEAN_PUNCT_FROM)}, {_sql_str(CLEAN_PUNCT_TO)}),
           '\\s+', ' ', 'g')) AS clean_text
  FROM noisy
)
SELECT doc_id, clean_text,
       length(text) - length(clean_text) AS n_removed
FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# exact-k stratified carve-out + curriculum interleave
# ---------------------------------------------------------------------------

_STRAT_K = 5
_STRAT_SALT = "strat"
_CURR_SALT = "curriculum"


def q_stratified_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        corpus.stratified_k(docs, _STRAT_K, salt=_STRAT_SALT)
        .select("doc_id", "source", "strat_rank")
        .orderBy("doc_id")
    )


STRATIFIED_K_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5(doc_id || ':{_STRAT_SALT}'), doc_id
         ) AS INTEGER) AS strat_rank
  FROM documents
)
SELECT doc_id, source, strat_rank FROM ranked
WHERE strat_rank <= {_STRAT_K} ORDER BY doc_id
"""


def q_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return corpus.interleave_sources(docs, salt=_CURR_SALT).orderBy("doc_id")


INTERLEAVE_ORACLE = f"""
WITH g AS (
  -- NULLS FIRST + null-safe join: the Spark side pins NULL as the
  -- first group index and keeps NULL-group rows (eqNullSafe); DuckDB
  -- defaults NULLS LAST and USING would drop them
  SELECT source,
         row_number() OVER (ORDER BY source NULLS FIRST) - 1 AS g_idx,
         count(*) OVER () AS n_groups
  FROM (SELECT DISTINCT source FROM documents)
),
rk AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(doc_id || ':{_CURR_SALT}'), doc_id
         ) - 1 AS rk
  FROM documents
)
SELECT doc_id, rk.source, CAST(rk * n_groups + g_idx AS BIGINT) AS ord
FROM rk JOIN g ON rk.source IS NOT DISTINCT FROM g.source
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# data-quality expectations
# ---------------------------------------------------------------------------

EXPECTATION_CHECKS = {
    "text_nonempty": "length(text) > 0",
    "chars_consistent": "length(text) = n_chars",
    "lang_known": "lang IN ('en', 'de', 'fr', 'es', 'it')",
    "source_prefixed": "source LIKE 'src%'",
    "id_nonnegative": "doc_id >= 0",
}
EXPECTATION_UNIQUE = ("doc_id",)


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from balboa_spark.operators.expectations import validate_expectations

    return validate_expectations(
        _docs(spark, sf_dir), EXPECTATION_CHECKS, unique=EXPECTATION_UNIQUE
    ).orderBy("rule")


def _expectations_oracle() -> str:
    from balboa_spark.operators.expectations import expectations_oracle_sql

    return expectations_oracle_sql(
        "documents", EXPECTATION_CHECKS, unique=EXPECTATION_UNIQUE
    )


# ---------------------------------------------------------------------------
# mixture upsampling (with replacement)
# ---------------------------------------------------------------------------

UPMIX_TARGET = {"src1": 0.5, "src2": 0.3, "src3": 0.2}
UPMIX_TOTAL = 600
UPMIX_SALT = "upmix"


def q_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    return corpus.mixture_upsample(
        docs, UPMIX_TARGET, total=UPMIX_TOTAL, salt=UPMIX_SALT
    ).orderBy("doc_id", "copy_idx")


def _mixture_upsample_oracle() -> str:
    total_w = sum(UPMIX_TARGET.values())
    # CAST to DOUBLE: DuckDB types bare decimal literals as DECIMAL and
    # computes r in exact decimal arithmetic, which can differ from
    # Spark's binary doubles by an ulp at the copy-count threshold
    values = ", ".join(
        f"('{g}', CAST({w / total_w!r} AS DOUBLE))"
        for g, w in sorted(UPMIX_TARGET.items())
    )
    return f"""
WITH tgt(source, w) AS (VALUES {values}),
counts AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
fr AS (
  SELECT source, {UPMIX_TOTAL} * w / n AS r
  FROM counts JOIN tgt USING (source)
),
c AS (
  SELECT d.doc_id, d.source,
         CAST(floor(r) AS INTEGER)
         + CASE WHEN substr(md5(d.doc_id || ':{UPMIX_SALT}'), 1, 8)
                     < CASE WHEN round((r - floor(r)) * {16**8}) >= {16**8}
                            THEN 'g'
                            ELSE lpad(lower(hex(CAST(round((r - floor(r)) * {16**8}) AS BIGINT))), 8, '0')
                       END
                THEN 1 ELSE 0 END AS nc
  FROM documents d JOIN fr USING (source)
)
SELECT doc_id, source, CAST(unnest(range(0, nc)) AS INTEGER) AS copy_idx
FROM c WHERE nc > 0 ORDER BY doc_id, copy_idx
"""


# ---------------------------------------------------------------------------
# temperature-flattened mixing (mT5/XLM-R sampling rule)
# ---------------------------------------------------------------------------

TEMP_TAU = 3.0
TEMP_TOTAL = 600


def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    return corpus.mixture_temperature(
        docs, tau=TEMP_TAU, total=TEMP_TOTAL
    ).orderBy("doc_id", "copy_idx")


def _mixture_temperature_oracle() -> str:
    inv_tau = 1.0 / TEMP_TAU
    return f"""
WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
p AS (
  SELECT source, n,
         pow(CAST(n AS DOUBLE) / sum(n) OVER (), CAST({inv_tau!r} AS DOUBLE)) AS w
  FROM counts
),
fr AS (
  SELECT source, n, {TEMP_TOTAL} * (w / sum(w) OVER ()) / n AS r FROM p
),
c AS (
  SELECT d.doc_id, d.source,
         CAST(floor(r) AS INTEGER)
         + CASE WHEN substr(md5(d.doc_id || ':upmix'), 1, 8)
                     < CASE WHEN round((r - floor(r)) * {16**8}) >= {16**8}
                            THEN 'g'
                            ELSE lpad(lower(hex(CAST(round((r - floor(r)) * {16**8}) AS BIGINT))), 8, '0')
                       END
                THEN 1 ELSE 0 END AS nc
  -- null-safe join: a NULL source is ONE group in the engine's
  -- groupBy/window path; a bare equi-join would drop its documents
  -- from the mixture (adversarial-audit find)
  FROM documents d JOIN fr ON d.source IS NOT DISTINCT FROM fr.source
)
SELECT doc_id, source, CAST(unnest(range(0, nc)) AS INTEGER) AS copy_idx
FROM c WHERE nc > 0 ORDER BY doc_id, copy_idx
"""


# ---------------------------------------------------------------------------
# curriculum scheduling (easy -> hard stages, fixed score edges)
# ---------------------------------------------------------------------------

CURR_EDGES = (120.0, 260.0)
CURR_MIX_BACK = 0.25


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule over the documents table: stage by pinned
    n_chars thresholds (easy = short), md5 intra-stage sort key, 25%
    spaced-repetition mix-back — a loader replays the easy-to-hard
    order from (stage, sort_key) alone. Edges are pinned literals
    (production estimates them once with percentile_approx; the
    operator itself is a zero-shuffle projection)."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return corpus.curriculum_order(
        docs, "n_chars", CURR_EDGES, mix_back=CURR_MIX_BACK
    ).orderBy("stage", "sort_key")


def _curriculum_oracle() -> str:
    thr = corpus.sample_threshold_hex(CURR_MIX_BACK)
    lo, hi = CURR_EDGES
    return f"""
WITH s AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS score,
         CASE WHEN n_chars IS NULL THEN 2
              WHEN CAST(n_chars AS DOUBLE) <= {lo!r} THEN 0
              WHEN CAST(n_chars AS DOUBLE) <= {hi!r} THEN 1
              ELSE 2 END AS st,
         substr(md5(doc_id || ':curr:mix'), 1, 8) AS u
  FROM documents
)
SELECT doc_id, score,
       CAST(CASE WHEN st > 0 AND u < '{thr}' THEN st - 1 ELSE st END
            AS INTEGER) AS stage,
       md5(doc_id || ':curr') AS sort_key
FROM s ORDER BY stage, sort_key
"""


# ---------------------------------------------------------------------------
# corpus datasheet (GROUPING SETS rollups)
# ---------------------------------------------------------------------------


def q_dataset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.dataset_profile(_docs(spark, sf_dir)).orderBy(
        "grouping", "source", "lang"
    )


DATASET_PROFILE_ORACLE = f"""
WITH {_TOKS_SQL},
base AS (
  SELECT d.source, d.lang, d.n_chars, len(t.tk) AS tok
  FROM documents d JOIN toks t USING (doc_id)
)
SELECT CAST(GROUPING(source, lang) AS INTEGER) AS grouping,
       source, lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 2) AS avg_chars,
       CAST(sum(tok) AS BIGINT) AS total_tokens
FROM base
GROUP BY GROUPING SETS ((source), (lang), ())
ORDER BY grouping, source, lang
"""


# ---------------------------------------------------------------------------
# sentence segmentation
# ---------------------------------------------------------------------------


def q_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from balboa_spark.operators.text import split_sentences

    return split_sentences(_docs(spark, sf_dir)).orderBy("doc_id", "sent_idx")


SENTENCES_ORACLE = r"""
WITH s0 AS (
  SELECT doc_id, regexp_extract_all(text, '[^.!?]+[.!?]*') AS ss
  FROM documents
),
e AS (
  SELECT doc_id, CAST(unnest(range(1, len(ss) + 1)) AS INTEGER) - 1 AS sent_idx,
         ss
  FROM s0
),
t AS (
  SELECT doc_id, sent_idx, trim(ss[sent_idx + 1]) AS sentence FROM e
)
SELECT doc_id, sent_idx, sentence,
       CAST(length(sentence) AS INTEGER) AS n_chars
FROM t WHERE length(sentence) >= 1
ORDER BY doc_id, sent_idx
"""


# ---------------------------------------------------------------------------
# winnowing fingerprints (MOSS)
# ---------------------------------------------------------------------------

_WINNOW_K, _WINNOW_W = 5, 4


def q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from balboa_spark.operators.text import winnow_fingerprints

    docs = _docs(spark, sf_dir)
    return winnow_fingerprints(docs, k=_WINNOW_K, w=_WINNOW_W).orderBy(
        "doc_id", "pos"
    )


WINNOW_ORACLE = f"""
WITH norm AS (
  SELECT doc_id,
         regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
  FROM documents
),
g0 AS (
  SELECT doc_id, t, len(t) - {_WINNOW_K - 1} AS n
  FROM norm WHERE len(t) >= {_WINNOW_K}
),
g AS (SELECT doc_id, t, n, unnest(range(1, n + 1)) AS i FROM g0),
h AS (
  SELECT doc_id, n, i - 1 AS p,
         md5(substr(t, CAST(i AS INTEGER), {_WINNOW_K})) AS h
  FROM g
),
wq AS (
  SELECT doc_id, p, h,
         unnest(range(greatest(p - {_WINNOW_W - 1}, 0),
                      least(p, greatest(n - {_WINNOW_W}, 0)) + 1)) AS q
  FROM h
),
sel AS (
  SELECT doc_id, q, p, h,
         row_number() OVER (
           PARTITION BY doc_id, q ORDER BY h ASC, p DESC
         ) AS rn
  FROM wq
)
SELECT DISTINCT doc_id, CAST(p AS INTEGER) AS pos, h AS fp
FROM sel WHERE rn = 1 ORDER BY doc_id, pos
"""


# ---------------------------------------------------------------------------
# span-corruption schedule (T5-style mask plan)
# ---------------------------------------------------------------------------

_SPAN_RATE, _SPAN_LEN, _SPAN_SALT = 0.15, 3, "spans"


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return corpus.span_corruption(
        docs, rate=_SPAN_RATE, span_len=_SPAN_LEN, salt=_SPAN_SALT
    ).orderBy("doc_id", "span_id")


def _span_corruption_oracle() -> str:
    thr = sample_threshold_hex(_SPAN_RATE / _SPAN_LEN)
    return f"""
WITH {_TOKS_SQL},
c0 AS (SELECT doc_id, len(tk) AS n FROM toks WHERE len(tk) > 0),
cand AS (
  SELECT doc_id, n,
         unnest(list_filter(range(0, n),
           i -> substr(md5(doc_id || ':' || i || ':{_SPAN_SALT}'), 1, 8)
                < '{thr}')) AS s
  FROM c0
),
ce AS (SELECT doc_id, s, least(s + {_SPAN_LEN}, n) AS e FROM cand),
m AS (
  SELECT doc_id, s, e,
         CASE WHEN max(e) OVER pw IS NULL OR s >= max(e) OVER pw
              THEN 1 ELSE 0 END AS new_island
  FROM ce
  WINDOW pw AS (PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
i AS (
  SELECT doc_id, s, e,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM m
)
SELECT doc_id, CAST(island - 1 AS INTEGER) AS span_id,
       CAST(min(s) AS INTEGER) AS span_start,
       CAST(max(e) AS INTEGER) AS span_end,
       CAST(max(e) - min(s) AS INTEGER) AS n_masked
FROM i GROUP BY doc_id, island ORDER BY doc_id, span_id
"""


# ---------------------------------------------------------------------------
# intra-document repeated-unit removal
# ---------------------------------------------------------------------------

def q_dedup_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document keep-first dedup at token granularity (the
    documents fixture has no newlines, so sep=' ' exercises the
    kernel on real repetition)."""
    return corpus.dedup_repeated_units(_docs(spark, sf_dir), sep=" ").filter(
        F.col("n_units") > 0
    )


DEDUP_UNITS_ORACLE = """
WITH s AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS u
  FROM documents
),
e AS (
  SELECT doc_id, u, CAST(unnest(range(1, len(u) + 1)) AS INTEGER) AS i
  FROM s
),
k AS (
  SELECT doc_id, u[i] AS unit, i, len(u) AS nu
  FROM e WHERE list_position(u, u[i]) = i
)
SELECT doc_id, CAST(max(nu) AS INTEGER) AS n_units,
       CAST(count(*) AS INTEGER) AS n_unique,
       string_agg(unit, ' ' ORDER BY i) AS clean_text
FROM k GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# DSIR importance selection (target = one source's documents)
# ---------------------------------------------------------------------------

DSIR_TARGET_SOURCE = "src0"
DSIR_K = 50


def q_dsir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("source") == DSIR_TARGET_SOURCE)
    # target is a slice of docs: the subset arm reuses the persisted
    # doc-bucket relation for the target counts (r16 optimization;
    # identical values — the oracle below is unchanged)
    return corpus.dsir_topk(docs, target, k=DSIR_K, target_subset=True)


DSIR_TOPK_ORACLE = f"""
WITH {_TOKS_SQL},
grams AS (
  SELECT doc_id,
         unnest(tk || CASE WHEN len(tk) >= 2
           THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
           ELSE CAST([] AS VARCHAR[]) END) AS g
  FROM toks
),
dc AS (
  SELECT doc_id, substr(md5(g || ':dsir'), 1, 2) AS bk, count(*) AS c
  FROM grams GROUP BY 1, 2
),
rb AS (SELECT bk, sum(c) AS rc FROM dc GROUP BY 1),
tb AS (
  SELECT bk, sum(c) AS tc FROM dc JOIN documents USING (doc_id)
  WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY 1
),
tot AS (
  SELECT (SELECT sum(rc) FROM rb) AS rn,
         (SELECT coalesce(sum(tc), 0) FROM tb) AS tn
),
ratio AS (
  SELECT rb.bk,
         ln(coalesce(tb.tc, 0) + 1) - ln(tn + 256)
           - ln(rb.rc + 1) + ln(rn + 256) AS lr
  FROM rb LEFT JOIN tb USING (bk) CROSS JOIN tot
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
       round(sum(c * lr), 4) AS weight
FROM dc JOIN ratio USING (bk)
GROUP BY doc_id ORDER BY weight DESC, doc_id LIMIT {DSIR_K}
"""


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

BM25_QUERY = ("merge", "broadcast", "shuffle")
BM25_K = 25


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from balboa_spark.operators.search import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), BM25_QUERY, k=BM25_K)


_BM25_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in BM25_QUERY) + "]"

from balboa_spark.operators.search import BM25_B, BM25_K1  # noqa: E402

BM25_TOPK_ORACLE = f"""
WITH {_TOKS_SQL},
st AS (
  -- NULL text is a zero-length document: dl=0 and counted in N, the
  -- PostingsIndex manifest contract (len(NULL tk) is NULL in DuckDB,
  -- which avg() would silently drop from avgdl but count(*) keeps in
  -- N — the asymmetry shifts every score)
  SELECT doc_id, coalesce(len(tk), 0) AS dl,
         coalesce(list_filter(tk, x -> list_contains({_BM25_TERMS_SQL}, x)),
                  []) AS qt
  FROM toks
),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM st),
tf AS (
  SELECT doc_id, dl, unnest(qt) AS term FROM st
),
tfg AS (
  SELECT doc_id, dl, term, count(*) AS f FROM tf GROUP BY 1, 2, 3
),
dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tfg GROUP BY 1)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       round(sum(
         ln((n - df + 0.5) / (df + 0.5) + 1)
           * f * ({BM25_K1} + 1)
           / (f + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl))
       ), 4) AS score
FROM tfg JOIN dft USING (term) CROSS JOIN stats
GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT {BM25_K}
"""


# ---------------------------------------------------------------------------
# deterministic epoch shuffle
# ---------------------------------------------------------------------------

SHUFFLE_EPOCH = 1


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.epoch_shuffle(_docs(spark, sf_dir), epoch=SHUFFLE_EPOCH)


EPOCH_SHUFFLE_ORACLE = f"""
WITH h AS (
  SELECT doc_id, md5(doc_id::VARCHAR || ':{SHUFFLE_EPOCH}:shuffle') AS o
  FROM documents
)
SELECT doc_id, substr(o, 1, 1) AS shard,
       CAST(row_number() OVER (
         PARTITION BY substr(o, 1, 1) ORDER BY o, doc_id) AS INTEGER) AS pos
FROM h
"""


# ---------------------------------------------------------------------------
# cross-source overlap matrix (provenance leakage between sources)
# ---------------------------------------------------------------------------

def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct shared n-grams per source pair — one distinct pass,
    #source-bounded aggregation state, no join (the oracle's self-join
    is the independent formulation)."""
    return corpus.source_overlap(_docs(spark, sf_dir), n=NGRAM_N)


SOURCE_OVERLAP_ORACLE = f"""
WITH {_TOKS_SQL},
g AS (
  SELECT DISTINCT d.source, gram
  FROM toks t
  JOIN documents d USING (doc_id),
  unnest({_grams_sql('t.tk', NGRAM_N)}) AS u(gram)
)
SELECT a.source AS source_a, b.source AS source_b,
       count(*) AS n_shared_ngrams
FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# BPE tokenizer segmentation (pinned merges)
# ---------------------------------------------------------------------------

#: Merge list learned once by bpe_fit over the sf0.01 documents corpus
#: and pinned as a literal (the same pattern as the pinned IVF
#: centroids / JL projection matrix): segmentation under a FIXED merge
#: list is deterministic and SQL-replayable, so the driver grades the
#: apply path by hash while the iterative fit itself is verified
#: merge-for-merge against a pure-Python reference in unit tests.
BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"),
]
BPE_TOP = 30


def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary segmented under the pinned BPE merge list:
    the heaviest BPE_TOP alnum words with their piece sequences. The
    plan is one corpus tokenize + vocab groupBy, then a pure fold
    chain (no UDF, no extra shuffle) and a TakeOrdered."""
    from balboa_spark.operators import bpe

    return bpe.bpe_segment_words(
        _docs(spark, sf_dir), BPE_MERGES, top_n=BPE_TOP
    )


def _word_fold_expr(merges: list[tuple[str, str]]) -> str:
    """The greedy merge fold over a word, as a DuckDB expression: for
    each pinned merge, a list_reduce over the space-joined piece
    string whose accumulator merges (a, b) when a is the accumulator's
    LAST piece — the string twin of bpe.merge_pair's array fold
    (first-element seeding on both sides). Pieces are alnum by
    construction, so the regex literals need no escaping.
    Parameterized over the merge list (r16) so two tokenizer
    generations can be replayed side by side."""
    expr = "array_to_string(regexp_extract_all(word, '.'), ' ')"
    for a, b in merges:
        expr = (
            f"list_reduce(string_split({expr}, ' '), (acc, x) -> "
            f"CASE WHEN regexp_extract(acc, '([^ ]+)$', 1) = '{a}' "
            f"AND x = '{b}' "
            f"THEN regexp_replace(acc, '([^ ]+)$', '{a}{b}') "
            f"ELSE acc || ' ' || x END)"
        )
    return expr


def _bpe_oracle() -> str:
    expr = _word_fold_expr(BPE_MERGES)
    return f"""
WITH {_TOKS_SQL},
words AS (
  SELECT t AS word, count(*) AS cnt
  FROM (SELECT unnest(tk) AS t FROM toks)
  WHERE regexp_matches(t, '^[a-z0-9]+$')
  GROUP BY t
),
top AS (SELECT word, cnt FROM words ORDER BY cnt DESC, word LIMIT {BPE_TOP}),
seg AS (SELECT word, cnt, {expr} AS pieces FROM top)
SELECT word, cnt, pieces,
       CAST(len(string_split(pieces, ' ')) AS INTEGER) AS n_pieces
FROM seg
"""


def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer's piece vocabulary with dense ids under the
    pinned merges. The ranking window is unpartitioned by design: the
    piece set is bounded by |charset| + len(merges), parameter-sized
    at any corpus scale."""
    from balboa_spark.operators import bpe

    return bpe.vocab_table(_docs(spark, sf_dir), BPE_MERGES)


def _bpe_vocab_oracle() -> str:
    seg = _bpe_oracle()
    # reuse the segmentation oracle as a subquery over the FULL vocab
    # (strip its top-N so every word contributes piece weight)
    seg_full = seg.replace(f"LIMIT {BPE_TOP}", "")
    return f"""
WITH segd AS ({seg_full}),
p AS (
  SELECT unnest(string_split(pieces, ' ')) AS piece, cnt FROM segd
),
wt AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS weight FROM p GROUP BY piece)
SELECT piece, weight,
       CAST(row_number() OVER (ORDER BY weight DESC, piece) - 1 AS INTEGER)
         AS piece_id
FROM wt
"""


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents encoded to dense piece-id sequences under the pinned
    tokenizer (merges + vocab ids) — the TokenizerStore.encode kernel
    graded without the store wrapper. Output is scalar (ids
    space-joined) because the driver canon rejects array cells."""
    from balboa_spark.operators import bpe

    docs = _docs(spark, sf_dir)
    # the tokenizer_drift sharing (r16), applied to the single-
    # generation encode: ONE checkpointed histogram feeds the vocab
    # derivation AND the encode's distinct-word segmentation, and the
    # parameter-sized vocab checkpoint keeps its broadcast from
    # re-running the histogram (before: 2 corpus passes + a hidden
    # vocab re-derivation inside the broadcast join)
    hist = bpe.word_histogram(docs).localCheckpoint(eager=True)
    vocab = bpe.vocab_table(docs, BPE_MERGES, hist=hist).localCheckpoint(
        eager=True
    )
    enc = bpe.encode_corpus(docs, BPE_MERGES, vocab, words=hist)
    return enc.select(
        "doc_id",
        F.size("piece_ids").alias("n_pieces"),
        F.concat_ws(
            " ", F.transform("piece_ids", lambda i: i.cast("string"))
        ).alias("ids_text"),
    ).orderBy("doc_id")


def _bpe_encode_oracle() -> str:
    seg_expr = _bpe_oracle()
    # the same fold expression, applied per distinct document word
    fold = seg_expr.split("seg AS (SELECT word, cnt, ")[1].split(
        " AS pieces FROM top)"
    )[0]
    vocab_sql = _bpe_vocab_oracle()
    return f"""
WITH {_TOKS_SQL},
dt AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk) + 1),
                               i -> {{'i': i, 'w': tk[i]}})) AS s
  FROM toks
),
dw AS (
  SELECT doc_id, struct_extract(s, 'i') AS wpos,
         struct_extract(s, 'w') AS word
  FROM dt WHERE regexp_matches(struct_extract(s, 'w'), '^[a-z0-9]+$')
),
uw AS (SELECT DISTINCT word FROM dw),
dseg AS MATERIALIZED (SELECT word, {fold} AS pieces FROM uw),
vocab AS MATERIALIZED ({vocab_sql}),
dp AS (
  SELECT doc_id, wpos,
         unnest(list_transform(
           range(1, len(string_split(pieces, ' ')) + 1),
           j -> {{'j': j, 'p': string_split(pieces, ' ')[j]}})) AS ps
  FROM dw JOIN dseg USING (word)
),
ids AS (
  SELECT doc_id, wpos, struct_extract(ps, 'j') AS ppos,
         v.piece_id
  FROM dp JOIN vocab v ON v.piece = struct_extract(ps, 'p')
)
SELECT doc_id,
       CAST(count(*) AS INTEGER) AS n_pieces,
       string_agg(piece_id::VARCHAR, ' ' ORDER BY wpos, ppos) AS ids_text
FROM ids GROUP BY doc_id ORDER BY doc_id
"""


# -- tokenizer drift report (r16): the graded twin of TokenizerStore
#    .tokenizer_diff via its store-free relational core ---------------------

#: generation A = a PREFIX of the pinned merge list (an earlier,
#: shorter fit), generation B = the full list — adding merges shifts
#: piece weights, so the dense (weight DESC, piece) id ranking really
#: renumbers surviving pieces and the report's every column is
#: exercised (added, removed, renumbered, re-segmented docs).
DRIFT_MERGES_A = BPE_MERGES[:6]


def q_tokenizer_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer generation drift report (bpe.tokenizer_diff_frames —
    the relational core TokenizerStore.tokenizer_diff delegates to,
    graded r16 per the r15 verdict stretch #9): piece-table delta
    between two pinned word-BPE generations (added / removed /
    renumbered under each generation's own dense weight-ranked ids)
    plus encode drift over the corpus (docs compared / byte-identical
    id sequences / total tokens under each). Scale shape: the piece
    tables are parameter-sized collects; the drift is two encode
    passes + ONE id-keyed equi-join + one aggregate."""
    from balboa_spark.operators import bpe

    docs = _docs(spark, sf_dir)
    # r16 optimization: every subtree here that does NOT depend on the
    # merge list is computed once and shared. Before, the plan ran SIX
    # corpus passes (2 vocab collects + 2 encode token streams + 2
    # vocab re-derivations inside the broadcast joins) plus a distinct
    # Exchange per encode; now: ONE histogram pass + the two encode
    # token streams (which must differ — they feed per-generation
    # segmentations). The vocab tables are parameter-sized, so their
    # checkpoints are cheap and the collect + broadcast read them
    # without re-running the histogram. Results are identical by
    # construction (same histogram, same fold, same ranking window).
    hist = bpe.word_histogram(docs).localCheckpoint(eager=True)
    va_df = bpe.vocab_table(docs, DRIFT_MERGES_A, hist=hist).localCheckpoint(
        eager=True
    )
    vb_df = bpe.vocab_table(docs, BPE_MERGES, hist=hist).localCheckpoint(
        eager=True
    )
    va = {
        r["piece"]: int(r["piece_id"])
        for r in va_df.select("piece", "piece_id").collect()
    }
    vb = {
        r["piece"]: int(r["piece_id"])
        for r in vb_df.select("piece", "piece_id").collect()
    }
    ea = bpe.encode_corpus(docs, DRIFT_MERGES_A, va_df, words=hist)
    eb = bpe.encode_corpus(docs, BPE_MERGES, vb_df, words=hist)
    return bpe.tokenizer_diff_frames(
        spark, va, vb, ea, eb, gen_a=0, gen_b=1
    )


def _drift_oracle() -> str:
    """Both generations replayed side by side: the parameterized fold
    (_word_fold_expr) segments every DISTINCT word under each merge
    list; per-generation piece weights and dense ids re-derive each
    vocab; per-doc id strings re-derive each encode; then one
    full-outer piece join (the delta) and one doc equi-join (the
    drift) collapse to the report's single row."""
    def gen(tag: str, merges: list[tuple[str, str]]) -> str:
        fold = _word_fold_expr(merges)
        return f"""
seg_{tag} AS MATERIALIZED (SELECT word, {fold} AS pieces FROM uw),
vw_{tag} AS (
  SELECT piece, CAST(sum(cnt) AS BIGINT) AS weight
  FROM (
    SELECT unnest(string_split(s.pieces, ' ')) AS piece, w.cnt
    FROM seg_{tag} s JOIN words w USING (word)
  ) GROUP BY piece
),
vocab_{tag} AS MATERIALIZED (
  SELECT piece,
         CAST(row_number() OVER (ORDER BY weight DESC, piece) - 1
              AS INTEGER) AS piece_id
  FROM vw_{tag}
),
dp_{tag} AS (
  SELECT doc_id, wpos,
         unnest(list_transform(
           range(1, len(string_split(pieces, ' ')) + 1),
           j -> {{'j': j, 'p': string_split(pieces, ' ')[j]}})) AS ps
  FROM dw JOIN seg_{tag} USING (word)
),
enc_{tag} AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pieces,
         string_agg(v.piece_id::VARCHAR, ' '
                    ORDER BY wpos, struct_extract(ps, 'j')) AS ids
  FROM dp_{tag} JOIN vocab_{tag} v ON v.piece = struct_extract(ps, 'p')
  GROUP BY doc_id
)"""

    return f"""
WITH {_TOKS_SQL},
words AS (
  SELECT t AS word, count(*) AS cnt
  FROM (SELECT unnest(tk) AS t FROM toks)
  WHERE regexp_matches(t, '^[a-z0-9]+$')
  GROUP BY t
),
dt AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk) + 1),
                               i -> {{'i': i, 'w': tk[i]}})) AS s
  FROM toks
),
dw AS (
  SELECT doc_id, struct_extract(s, 'i') AS wpos,
         struct_extract(s, 'w') AS word
  FROM dt WHERE regexp_matches(struct_extract(s, 'w'), '^[a-z0-9]+$')
),
uw AS (SELECT DISTINCT word FROM words),
{gen("a", DRIFT_MERGES_A)},
{gen("b", BPE_MERGES)},
delta AS (
  SELECT
    CAST(count(*) FILTER (WHERE a.piece IS NULL) AS INTEGER) AS pieces_added,
    CAST(count(*) FILTER (WHERE b.piece IS NULL) AS INTEGER) AS pieces_removed,
    CAST(count(*) FILTER (WHERE a.piece IS NOT NULL AND b.piece IS NOT NULL
                          AND a.piece_id <> b.piece_id) AS INTEGER)
      AS pieces_renumbered
  FROM vocab_a a FULL OUTER JOIN vocab_b b ON a.piece = b.piece
),
drift AS (
  SELECT CAST(count(*) AS BIGINT) AS docs_compared,
         CAST(sum(CASE WHEN a.ids = b.ids THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_identical,
         CAST(sum(a.n_pieces) AS BIGINT) AS tokens_a,
         CAST(sum(b.n_pieces) AS BIGINT) AS tokens_b
  FROM enc_a a JOIN enc_b b USING (doc_id)
)
SELECT CAST(0 AS INTEGER) AS gen_a, CAST(1 AS INTEGER) AS gen_b,
       delta.pieces_added, delta.pieces_removed, delta.pieces_renumbered,
       drift.docs_compared, drift.docs_identical,
       drift.tokens_a, drift.tokens_b
FROM delta, drift
"""


# -- FIM transformation (r16): deterministic fill-in-the-middle ------------

FIM_RATE, FIM_SPM_RATE = 0.6, 0.5


def q_fim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fill-in-the-middle schedule + render
    (corpus.fim_transform — the FIM pretraining objective, Bavarian et
    al. 2022): with md5-derived probability each document splits at
    two md5-derived token cuts into (prefix, middle, suffix) and
    renders PSM or SPM (the joint mix); the rest pass through. One
    narrow projection, no shuffle — the whole schedule (apply, mode,
    cut points, segment lengths, rendered text) hash-graded."""
    docs = _docs(spark, sf_dir)
    return corpus.fim_transform(
        docs, fim_rate=FIM_RATE, spm_rate=FIM_SPM_RATE
    ).orderBy("doc_id")


def _fim_oracle() -> str:
    from balboa_spark.operators.corpus import sample_threshold_hex

    thr = sample_threshold_hex(FIM_RATE)
    spm_thr = sample_threshold_hex(FIM_SPM_RATE)

    def h48mod(tag: str) -> str:
        return (
            "CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || "
            f"':fim:{tag}'), 1, 12) AS BIGINT) % (n + 1) AS BIGINT)"
        )

    return f"""
WITH tk AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
  FROM documents
),
base AS (
  SELECT doc_id, text, tk, len(tk) AS n,
         substr(md5(CAST(doc_id AS VARCHAR) || ':fim:apply'), 1, 8)
           < '{thr}' AND coalesce(len(tk), 0) >= 2 AS applied,
         substr(md5(CAST(doc_id AS VARCHAR) || ':fim:mode'), 1, 8)
           < '{spm_thr}' AS spm
  FROM tk
),
cuts AS (
  SELECT *, least(c1, c2) AS lo, greatest(c1, c2) AS hi
  FROM (SELECT *, {h48mod("c1")} AS c1, {h48mod("c2")} AS c2 FROM base)
),
seg AS (
  SELECT doc_id, text, n, applied, spm, lo, hi,
         -- DuckDB yields NULL (not '') for the empty slice tk[1:0]
         coalesce(array_to_string(tk[1:lo], ' '), '') AS pfx,
         coalesce(array_to_string(tk[lo+1:hi], ' '), '') AS mid,
         coalesce(array_to_string(tk[hi+1:n], ' '), '') AS sfx
  FROM cuts
)
SELECT doc_id,
       applied AS fim_applied,
       CASE WHEN NOT applied THEN 'none'
            WHEN spm THEN 'spm' ELSE 'psm' END AS mode,
       CAST(CASE WHEN applied THEN lo ELSE 0 END AS INTEGER) AS n_prefix,
       CAST(CASE WHEN applied THEN hi - lo ELSE 0 END AS INTEGER) AS n_middle,
       CAST(CASE WHEN applied THEN n - hi ELSE 0 END AS INTEGER) AS n_suffix,
       CASE WHEN NOT applied THEN text
            WHEN spm THEN '<fim_prefix><fim_suffix>' || sfx
                 || '<fim_middle>' || pfx
                 || CASE WHEN lo > 0 AND hi > lo THEN ' ' ELSE '' END || mid
            ELSE '<fim_prefix>' || pfx || '<fim_suffix>' || sfx
                 || '<fim_middle>' || mid END AS rendered
FROM seg ORDER BY doc_id
"""


# -- WordPiece segmentation (r16): greedy longest-match, graded via a
#    recursive-CTE replay ---------------------------------------------------

#: pinned WordPiece vocabulary (the BPE_MERGES discipline: chosen once
#: against the corpus and pinned) — deliberately PARTIAL coverage so
#: the graded surface exercises every arm: single-piece words, head +
#: ##-continuation chains, UNK dead-ends, and the greedy-beats-
#: backtracking case ('query': greedy takes head 'que' and dead-ends
#: -> [UNK], even though 'q' + '##uery' would have segmented — the
#: published algorithm does NOT backtrack, and the hash pins that).
WP_VOCAB: tuple[str, ...] = (
    "join", "row", "data", "the", "a", "scan", "sort", "key", "big",
    "part",
    "cus", "col", "fil", "mer", "bat", "val", "or", "s", "w", "h",
    "gr", "ta", "li", "que", "fa", "du", "ag", "sp", "st", "sm",
    "win", "slo", "ve", "pa",
    "##tomer", "##umn", "##ter", "##ge", "##ch", "##an", "##ash",
    "##all", "##ow", "##der", "##ctor", "##ne", "##able", "##lue",
    "##ey", "##ream", "##dow", "##ark", "##oup", "##art", "##ig",
    "##uery", "##ast", "##atch", "##g", "##p", "##low", "##le",
    "##a", "##ue", "##rt", "##mall",
)
WP_TOP = 30


def q_wordpiece_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The heaviest WP_TOP alnum words segmented under the pinned
    WordPiece vocabulary (operators/wordpiece.py — greedy
    longest-match-first, ##-continuations, whole-word [UNK] on any
    dead-end). The corpus pass is one tokenize + groupBy count +
    TakeOrdered; segmentation is one Arrow batch over the 30-row
    result. Graded against a DuckDB RECURSIVE-CTE replay of the
    greedy loop (each step consumes the longest matching piece via a
    correlated LATERAL argmax) — the first data-dependent-stride
    loop the oracle suite replays."""
    from balboa_spark.operators.bpe import WORD_RE
    from balboa_spark.operators.text import tokens
    from balboa_spark.operators.wordpiece import wordpiece_segment_col

    docs = _docs(spark, sf_dir)
    top = (
        docs.select(
            F.explode(
                F.filter(tokens(F.col("text")), lambda w: w.rlike(WORD_RE))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(WP_TOP)
    )
    seg = wordpiece_segment_col(F.col("word"), set(WP_VOCAB))
    return top.select(
        "word",
        "cnt",
        F.concat_ws(" ", seg).alias("pieces"),
        F.size(seg).cast("int").alias("n_pieces"),
    ).orderBy(F.col("cnt").desc(), "word")


def _wordpiece_oracle() -> str:
    vocab_rows = ", ".join(f"('{p}')" for p in WP_VOCAB)
    return f"""
WITH RECURSIVE {_TOKS_SQL},
vocab(piece) AS (VALUES {vocab_rows}),
words AS (
  SELECT t AS word, count(*) AS cnt
  FROM (SELECT unnest(tk) AS t FROM toks)
  WHERE regexp_matches(t, '^[a-z0-9]+$')
  GROUP BY t
),
top AS (SELECT word, cnt FROM words ORDER BY cnt DESC, word LIMIT {WP_TOP}),
step(word, pos, pieces, np, failed) AS (
  SELECT word, 1, CAST('' AS VARCHAR), 0, false FROM top
  UNION ALL
  SELECT s.word,
         CASE WHEN m.piece IS NULL THEN len(s.word) + 1
              ELSE s.pos + m.consumed END,
         CASE WHEN m.piece IS NULL THEN '[UNK]'
              ELSE CASE WHEN s.pieces = '' THEN m.piece
                   ELSE s.pieces || ' ' || m.piece END END,
         CASE WHEN m.piece IS NULL THEN 1 ELSE s.np + 1 END,
         m.piece IS NULL
  FROM step s
  LEFT JOIN LATERAL (
    SELECT v.piece,
           len(v.piece) - CASE WHEN s.pos > 1 THEN 2 ELSE 0 END AS consumed
    FROM vocab v
    WHERE (s.pos = 1 AND v.piece NOT LIKE '##%'
           AND substr(s.word, s.pos, len(v.piece)) = v.piece)
       OR (s.pos > 1 AND v.piece LIKE '##%'
           AND substr(s.word, s.pos, len(v.piece) - 2) = substr(v.piece, 3))
    ORDER BY consumed DESC, v.piece LIMIT 1
  ) m ON true
  WHERE s.pos <= len(s.word) AND NOT s.failed
)
SELECT t.word, t.cnt, s.pieces, CAST(s.np AS INTEGER) AS n_pieces
FROM top t JOIN step s ON s.word = t.word
WHERE s.pos > len(s.word) OR s.failed
ORDER BY t.cnt DESC, t.word
"""


WP_FIT_MERGES = 6
WP_FIT_MIN_COUNT = 2


def q_wordpiece_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WordPiece TRAINING loop graded (r16 — the
    corpus_bpe_by_lang precedent applied to the likelihood rule): the
    learned merge table (step, a, b, pair_count) under
    count(ab)/(count(a)*count(b)) scoring, so the hash pins the whole
    iterative fit — char-split initialization, the dual pair/symbol
    aggregates, the rounded-score argmax with (score DESC, a, b)
    tie-break, the ##-absorbing greedy merge application, and the
    min-count early stop (operators/wordpiece.py wordpiece_fit)."""
    from balboa_spark.operators.wordpiece import wordpiece_fit

    stats: list = []
    wordpiece_fit(
        _docs(spark, sf_dir), num_merges=WP_FIT_MERGES,
        min_pair_count=WP_FIT_MIN_COUNT, stats_out=stats,
    )
    return spark.createDataFrame(
        [(i + 1, a, b, n) for i, (a, b, n) in enumerate(stats)],
        "step int, a string, b string, pair_count long",
    ).orderBy("step")


def _wordpiece_fit_oracle() -> str:
    """The likelihood fit unrolled round by round (the
    _bpe_by_lang_oracle mechanism, single-group so no sentinel
    needed): each round derives pair AND symbol counts from the
    current piece strings, takes the UNFILTERED rounded-score argmax
    (filtering before the argmax would silently substitute the
    next-best pair where the engine STOPS), merges only when its
    pair_count clears the threshold — a stopped round emits no b-row
    and every later round recomputes the same failing argmax, so the
    vocab stays frozen with no active-set bookkeeping."""
    fold = (
        "list_reduce(string_split(v.pstr, ' '), (acc, x) -> "
        "CASE WHEN regexp_extract(acc, '([^ ]+)$', 1) = b.a AND x = b.b "
        "THEN regexp_replace(acc, '([^ ]+)$', b.a || substr(b.b, 3)) "
        "ELSE acc || ' ' || x END)"
    )
    parts = [f"""v0 AS (
  SELECT count(*) AS cnt,
         array_to_string(list_transform(range(1, len(word)+1),
           i -> CASE WHEN i = 1 THEN substr(word, 1, 1)
                ELSE '##' || substr(word, i, 1) END), ' ') AS pstr
  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  t -> t <> '')) AS word
        FROM documents)
  WHERE regexp_matches(word, '^[a-z0-9]+$')
  GROUP BY word
)"""]
    for r in range(WP_FIT_MERGES):
        parts.append(f"""p{r} AS (
  SELECT struct_extract(s, 'a') AS a, struct_extract(s, 'b') AS b,
         sum(cnt) AS n
  FROM (SELECT cnt,
               unnest(list_transform(range(1, len(string_split(pstr, ' '))),
                 i -> {{'a': string_split(pstr, ' ')[i],
                        'b': string_split(pstr, ' ')[i+1]}})) AS s
        FROM v{r} WHERE len(string_split(pstr, ' ')) >= 2)
  GROUP BY 1, 2
)""")
        parts.append(f"""sy{r} AS (
  SELECT sym, sum(cnt) AS c
  FROM (SELECT cnt, unnest(string_split(pstr, ' ')) AS sym FROM v{r})
  GROUP BY 1
)""")
        parts.append(f"""b{r} AS (
  SELECT * FROM (
    SELECT p.a, p.b, p.n, round(p.n / (sa.c * sb.c), 12) AS score
    FROM p{r} p JOIN sy{r} sa ON sa.sym = p.a JOIN sy{r} sb ON sb.sym = p.b
    ORDER BY score DESC, p.a, p.b LIMIT 1)
  WHERE n >= {WP_FIT_MIN_COUNT}
)""")
        parts.append(f"""v{r+1} AS (
  SELECT v.cnt, CASE WHEN b.a IS NULL THEN v.pstr ELSE {fold} END AS pstr
  FROM v{r} v LEFT JOIN b{r} b ON true
)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT {r + 1} AS step, a, b, n FROM b{r}"
        for r in range(WP_FIT_MERGES)
    )
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT CAST(step AS INTEGER) AS step, a, b,"
          " CAST(n AS BIGINT) AS pair_count FROM ("
        + unions + ") ORDER BY step"
    )


# -- byte-level BPE (r13): GPT-2-shape tokenizer, no OOV -------------------

#: Byte-level merge list learned once by bpe.byte_bpe_fit over the
#: sf0.01 documents corpus and pinned (same discipline as BPE_MERGES:
#: the apply path is deterministic and SQL-replayable; the fit loop is
#: verified merge-for-merge against a clear-room reference in unit
#: tests). Pieces are uppercase hex pairs of UTF-8 bytes — note
#: ('20','73') = ' s': the GPT-2 leading-space convention emerging
#: from data.
BYTE_BPE_MERGES: list[tuple[str, str]] = [
    ("20", "73"), ("65", "72"), ("69", "6E"), ("6F", "77"),
    ("6F", "72"), ("6D", "6572"), ("61", "74"), ("6C", "75"),
    ("20", "63"), ("61", "73"), ("20", "62"), ("20", "76"),
]
BYTE_BPE_TOP = 30


def q_bpe_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The byte-level tokenizer's apply path, driver-graded: GPT-2
    pre-tokenize (lookahead-free regex both engines share) -> UTF-8
    hex-pair units -> pinned merges replayed as the linear fold chain
    -> heaviest BYTE_BPE_TOP pre-tokens with piece sequences. One
    corpus pass (pretokenize + explode + groupBy), then pure column
    folds and a TakeOrdered — no UDF, no extra shuffle."""
    from balboa_spark.operators import bpe

    hist = bpe.byte_word_histogram(_docs(spark, sf_dir))
    out = (
        hist.orderBy(F.col("cnt").desc(), "word")
        .limit(BYTE_BPE_TOP)
        .select(
            "word",
            "cnt",
            F.concat_ws(
                " ", bpe.byte_segment(F.col("word"), BYTE_BPE_MERGES)
            ).alias("pieces"),
        )
    )
    return out.select(
        "word",
        "cnt",
        "pieces",
        F.size(F.split("pieces", " ")).alias("n_pieces"),
    ).orderBy(F.col("cnt").desc(), "word")


def _byte_fold_expr(src: str) -> str:
    """The DuckDB twin of bpe.byte_segment's fold chain over a column
    named ``src``: hex-pair initial units, then each pinned merge as a
    list_reduce pass (pieces are [0-9A-F]+ — regex-safe literals)."""
    expr = f"array_to_string(regexp_extract_all(hex(encode({src})), '..'), ' ')"
    for a, b in BYTE_BPE_MERGES:
        expr = (
            f"list_reduce(string_split({expr}, ' '), (acc, x) -> "
            f"CASE WHEN regexp_extract(acc, '([^ ]+)$', 1) = '{a}' "
            f"AND x = '{b}' "
            f"THEN regexp_replace(acc, '([^ ]+)$', '{a}{b}') "
            f"ELSE acc || ' ' || x END)"
        )
    return expr


_BYTE_PRETOK_SQL = (
    r"regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')"
)


def _bpe_bytes_oracle() -> str:
    return f"""
WITH pret AS (
  SELECT unnest({_BYTE_PRETOK_SQL}) AS word FROM documents
),
words AS (SELECT word, count(*) AS cnt FROM pret GROUP BY word),
top AS (
  SELECT word, cnt FROM words ORDER BY cnt DESC, word LIMIT {BYTE_BPE_TOP}
),
seg AS (SELECT word, cnt, {_byte_fold_expr('word')} AS pieces FROM top)
SELECT word, cnt, pieces,
       CAST(len(string_split(pieces, ' ')) AS INTEGER) AS n_pieces
FROM seg ORDER BY cnt DESC, word
"""


def q_bpe_bytes_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents encoded to byte-level piece ids under the pinned
    merges and the STRUCTURAL vocab (256 base bytes + one id per
    merge — provably OOV-free on arbitrary UTF-8). Segmentation runs
    once per DISTINCT pre-token and joins back; the id map is a
    parameter-sized broadcast."""
    from balboa_spark.operators import bpe

    enc = bpe.byte_encode_corpus(_docs(spark, sf_dir), BYTE_BPE_MERGES)
    return enc.select(
        "doc_id",
        F.size("piece_ids").alias("n_pieces"),
        F.concat_ws(
            " ", F.transform("piece_ids", lambda i: i.cast("string"))
        ).alias("ids_text"),
    ).orderBy("doc_id")


def _bpe_bytes_encode_oracle() -> str:
    from balboa_spark.operators.bpe import byte_vocab

    vocab_rows = ", ".join(
        f"('{p}', {i})" for p, i in byte_vocab(BYTE_BPE_MERGES)
    )
    return f"""
WITH dt AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, len({_BYTE_PRETOK_SQL}) + 1),
           i -> {{'i': i, 'w': {_BYTE_PRETOK_SQL}[i]}})) AS s
  FROM documents
),
dw AS (
  SELECT doc_id, struct_extract(s, 'i') AS wpos,
         struct_extract(s, 'w') AS word
  FROM dt
),
uw AS (SELECT DISTINCT word FROM dw),
dseg AS MATERIALIZED (
  SELECT word, {_byte_fold_expr('word')} AS pieces FROM uw
),
vocab(piece, piece_id) AS (VALUES {vocab_rows}),
dp AS (
  SELECT doc_id, wpos,
         unnest(list_transform(
           range(1, len(string_split(pieces, ' ')) + 1),
           j -> {{'j': j, 'p': string_split(pieces, ' ')[j]}})) AS ps
  FROM dw JOIN dseg USING (word)
),
ids AS (
  SELECT doc_id, wpos, struct_extract(ps, 'j') AS ppos, v.piece_id
  FROM dp JOIN vocab v ON v.piece = struct_extract(ps, 'p')
)
SELECT doc_id,
       CAST(count(*) AS INTEGER) AS n_pieces,
       string_agg(piece_id::VARCHAR, ' ' ORDER BY wpos, ppos) AS ids_text
FROM ids GROUP BY doc_id ORDER BY doc_id
"""


# -- per-language byte-BPE fit (r14) ----------------------------------------

#: merge budget per language for the graded per-group fit — small
#: enough that the unrolled DuckDB replay stays readable, large enough
#: that every language learns several real merges and tie-breaks fire
BPE_BY_LANG_MERGES = 8
BPE_BY_LANG_MIN_COUNT = 2


def q_bpe_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE byte-level tokenizer fit per language in a single
    relational plan (bpe.byte_bpe_fit_by_group — the
    kn_ngram_lm_perplexity_by_group precedent applied to the
    tokenizer family). The graded output is the LEARNED MERGE TABLE
    itself — (lang, step, a, b, pair_count) — so the hash pins the
    whole iterative fit: pre-token histogram, per-group argmax with
    deterministic tie-breaks, greedy merge replay, and per-group
    early stopping. Driver state is |G| rows per round; every data
    pass is shared across groups."""
    from balboa_spark.operators import bpe

    fit = bpe.byte_bpe_fit_by_group(
        _docs(spark, sf_dir),
        group_col="lang",
        num_merges=BPE_BY_LANG_MERGES,
        min_pair_count=BPE_BY_LANG_MIN_COUNT,
    )
    rows = [
        (lang, step + 1, a, b, n)
        for lang, ms in fit.items()
        for step, (a, b, n) in enumerate(ms)
    ]
    return spark.createDataFrame(
        rows, "lang string, step int, a string, b string, pair_count long"
    ).orderBy("lang", "step")


def _bpe_by_lang_oracle() -> str:
    """The per-group greedy fit unrolled round by round (the
    embedding_kmeans unrolled-recursion mechanism): each round counts
    adjacent pairs per language, picks the (n DESC, a, b) argmax via
    row_number, and applies the winning merge to that language's
    vocabulary with the same left-to-right fold the engine uses. A
    language whose best pair falls under the threshold just stops
    producing b-rows (its vocab is frozen, so the same argmax fails
    every later round — no active-set bookkeeping).

    Every pstr is prefixed with a PER-LANGUAGE SENTINEL ('#'||lang):
    DuckDB's vectorized list_reduce can leak lane state between rows
    whose input lists are equal-valued while the lambda's captured
    columns differ (the reproduced corpus_unigram_by_lang cross-talk
    hazard — see that oracle's docstring), and a word shared by two
    languages feeds exactly that shape into this fold with each
    language's own (b.a, b.b) captured. The sentinel makes every
    language's input list distinct; it never merges (merge pieces are
    uppercase hex, the sentinel starts with '#') and sentinel-headed
    adjacent pairs are filtered out of the pair counts."""
    fold = (
        "list_reduce(string_split(v.pstr, ' '), (acc, x) -> "
        "CASE WHEN regexp_extract(acc, '([^ ]+)$', 1) = b.a AND x = b.b "
        "THEN regexp_replace(acc, '([^ ]+)$', b.a || b.b) "
        "ELSE acc || ' ' || x END)"
    )
    parts = [
        f"""v0 AS (
  SELECT lang AS g, count(*) AS cnt,
         '#' || lang || ' ' ||
         array_to_string(regexp_extract_all(hex(encode(word)), '..'), ' ')
           AS pstr
  FROM (
    SELECT lang, unnest({_BYTE_PRETOK_SQL}) AS word
    FROM documents WHERE lang IS NOT NULL
  ) GROUP BY lang, word
)"""
    ]
    for r in range(BPE_BY_LANG_MERGES):
        parts.append(
            f"""p{r} AS (
  SELECT g, struct_extract(s, 'a') AS a, struct_extract(s, 'b') AS b,
         sum(cnt) AS n
  FROM (
    SELECT g, cnt,
           unnest(list_transform(range(1, len(l)),
                                 i -> {{'a': l[i], 'b': l[i + 1]}})) AS s
    FROM (SELECT g, cnt, string_split(pstr, ' ') AS l FROM v{r})
  ) WHERE struct_extract(s, 'a') NOT LIKE '#%' GROUP BY g, a, b
),
b{r} AS (
  SELECT g, a, b, n FROM (
    SELECT g, a, b, n,
           row_number() OVER (PARTITION BY g ORDER BY n DESC, a, b) AS rn
    FROM p{r}
  ) WHERE rn = 1 AND n >= {BPE_BY_LANG_MIN_COUNT}
),
v{r + 1} AS (
  SELECT v.g, v.cnt,
         CASE WHEN b.a IS NOT NULL THEN {fold} ELSE v.pstr END AS pstr
  FROM v{r} v LEFT JOIN b{r} b USING (g)
)"""
        )
    steps = "\nUNION ALL\n".join(
        f"SELECT g, {r + 1} AS step, a, b, n FROM b{r}"
        for r in range(BPE_BY_LANG_MERGES)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
steps AS ({steps})
SELECT g AS lang, CAST(step AS INTEGER) AS step, a, b,
       CAST(n AS BIGINT) AS pair_count
FROM steps ORDER BY lang, step
"""
    )


# -- unigram-LM (SentencePiece-style) tokenizer (r13) -----------------------

#: Unigram piece distribution learned once by unigram.unigram_fit over
#: the sf0.01 documents corpus (seed 64 substrings -> 2 EM rounds with
#: pruning -> final M-step) and pinned; logp rounded to 6dp. The EM
#: fit is verified against brute-force segmentation enumeration in
#: unit tests; the driver grades the Viterbi APPLY path — both engines
#: run the same forward-(s,bp) DP fold and backward trail walk.
UNIGRAM_VOCAB: list[tuple[str, float]] = [
    ("a", -2.759849), ("al", -3.975734), ("as", -7.266568),
    ("at", -6.633161), ("atch", -4.81787), ("b", -3.490193),
    ("ba", -13.172373), ("bat", -13.082016), ("batc", -5.61504),
    ("c", -4.467052), ("ch", -13.016361), ("co", -5.060915),
    ("colu", -5.230852), ("cus", -11.962554), ("cust", -4.447441),
    ("d", -3.373204), ("e", -2.502522), ("er", -3.558284),
    ("f", -3.797699), ("g", -2.879955), ("h", -4.255395),
    ("hash", -4.432786), ("i", -3.785325), ("in", -3.792815),
    ("j", -27.61451), ("join", -4.414902), ("k", -3.803874),
    ("l", -2.784928), ("lu", -9.313436), ("lumn", -5.057592),
    ("m", -3.752829), ("me", -14.51513), ("mer", -4.52033),
    ("mn", -5.229665), ("n", -11.97605), ("o", -8.435956),
    ("ome", -14.44387), ("omer", -4.44907), ("or", -3.394192),
    ("ow", -3.765388), ("p", -4.477289), ("pa", -11.828908),
    ("par", -3.815357), ("q", -4.516351), ("r", -4.002123),
    ("ro", -4.502369), ("row", -4.495647), ("rt", -10.972244),
    ("s", -3.032262), ("scan", -4.444378), ("st", -4.011625),
    ("t", -2.757835), ("ta", -4.059918), ("tch", -10.5841),
    ("to", -8.573719), ("u", -3.956869), ("ue", -4.245564),
    ("v", -3.785463), ("w", -4.485717), ("y", -3.808954),
]
UNIGRAM_MAX_LEN = 4
UNIGRAM_TOP = 30


def q_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram tokenizer's apply path, driver-graded: Viterbi
    max-probability segmentation of the heaviest UNIGRAM_TOP corpus
    words under the pinned piece distribution — the DP itself (a
    forward fold over positions + a backward trail walk, both pure
    Column programs, no UDF) is what the hash checks, score AND
    pieces. Tie contract: equal scores break to the highest
    backpointer (shortest final piece) — identical lexicographic
    struct-max in both engines."""
    from balboa_spark.operators import unigram

    return unigram.unigram_segment_words(
        _docs(spark, sf_dir),
        UNIGRAM_VOCAB,
        max_piece_len=UNIGRAM_MAX_LEN,
        top_n=UNIGRAM_TOP,
    )


def _unigram_oracle() -> str:
    from balboa_spark.operators import unigram

    fwd, trail, pieces, logp = unigram.viterbi_sql(
        "word", UNIGRAM_VOCAB, UNIGRAM_MAX_LEN
    )
    return f"""
WITH {_TOKS_SQL},
words AS (
  SELECT t AS word, count(*) AS cnt
  FROM (SELECT unnest(tk) AS t FROM toks)
  WHERE regexp_matches(t, '^[a-z0-9]+$')
  GROUP BY t
),
top AS (
  SELECT word, cnt FROM words ORDER BY cnt DESC, word LIMIT {UNIGRAM_TOP}
),
staged AS MATERIALIZED (SELECT word, cnt, {fwd} AS fwd FROM top),
staged2 AS MATERIALIZED (SELECT word, cnt, fwd, {trail} AS tr FROM staged),
-- pieces staged ONCE and MATERIALIZED (DuckDB inlines plain CTEs, so
-- a non-materialized stage would still duplicate the transform
-- lambda, re-triggering the lambda cross-talk viterbi_sql documents)
staged3 AS MATERIALIZED (SELECT word, cnt, fwd, {pieces} AS pl FROM staged2)
SELECT word, cnt,
       array_to_string(pl, ' ') AS pieces,
       CAST(len(pl) AS INTEGER) AS n_pieces,
       {logp} AS logp
FROM staged3 ORDER BY cnt DESC, word
"""




# -- per-language unigram segmentation (r14) ---------------------------------

#: Per-language unigram piece distributions learned once by
#: unigram.unigram_fit_by_group over the sf0.01 documents corpus
#: (vocab_size=28, seed_m=32, em_iters=2, max_piece_len=4) and pinned
#: (the UNIGRAM_VOCAB discipline: the apply path is deterministic and
#: SQL-replayable; the grouped EM fit is verified slice-for-slice
#: against unigram_fit in unit tests).
UNIGRAM_BY_LANG_VOCABS: dict[str, list[tuple[str, float]]] = {
    "de": [("a", -2.750258), ("al", -4.290828), ("as", -4.37508), ("at", -4.464816), ("b", -3.487331), ("c", -3.194026), ("cust", -4.452891), ("d", -3.641932), ("e", -2.60383), ("er", -3.81951), ("f", -3.954097), ("g", -3.090916), ("h", -3.156667), ("i", -3.850269), ("in", -3.529796), ("j", -4.488179), ("k", -3.958416), ("l", -2.921341), ("lu", -4.385624), ("m", -3.499621), ("mer", -4.655553), ("n", -3.869886), ("o", -3.70219), ("omer", -4.477361), ("or", -3.617029), ("ow", -3.543087), ("p", -4.688321), ("par", -3.964198), ("q", -4.766105), ("r", -3.571581), ("ro", -4.709197), ("rt", -8.219114), ("s", -2.942728), ("st", -4.459345), ("t", -2.786601), ("ta", -4.557193), ("to", -7.990257), ("u", -4.210488), ("ue", -4.481608), ("v", -3.899576), ("w", -4.612801), ("y", -3.967112)],
    "en": [("a", -2.673409), ("ab", -5.108037), ("al", -4.31051), ("at", -4.347698), ("b", -3.703221), ("c", -3.027703), ("d", -3.882434), ("e", -2.612994), ("er", -4.345721), ("f", -3.966719), ("g", -3.014362), ("h", -3.973206), ("hash", -4.513983), ("i", -3.892668), ("in", -3.513688), ("j", -4.612146), ("k", -3.927854), ("l", -2.913076), ("lu", -4.553231), ("m", -3.528116), ("mer", -3.982373), ("n", -3.923816), ("o", -3.366698), ("or", -4.115539), ("orde", -5.107809), ("ow", -3.558071), ("p", -4.574955), ("par", -3.947153), ("q", -4.715549), ("r", -3.328354), ("rder", -5.388831), ("ro", -4.622368), ("s", -2.911988), ("st", -3.815532), ("t", -2.794011), ("ta", -5.19238), ("to", -5.469852), ("u", -3.61438), ("ue", -4.562615), ("v", -3.961449), ("w", -4.435127), ("y", -3.981356)],
    "es": [("a", -2.813969), ("agg", -4.474196), ("al", -4.082767), ("at", -4.344134), ("b", -3.56828), ("c", -2.954495), ("d", -3.541397), ("e", -2.568934), ("er", -3.702016), ("f", -3.886393), ("g", -3.529955), ("h", -3.9362), ("hash", -4.483302), ("i", -3.939354), ("in", -3.539349), ("j", -4.65336), ("k", -3.928464), ("l", -3.108227), ("lu", -4.58545), ("m", -3.48109), ("mer", -3.865765), ("n", -3.881807), ("o", -3.51766), ("or", -3.639418), ("ow", -4.028256), ("p", -4.611044), ("par", -3.906672), ("q", -4.546388), ("r", -3.56106), ("ro", -4.58859), ("rt", -8.092457), ("s", -3.086134), ("slow", -4.466311), ("st", -3.692481), ("t", -2.86851), ("ta", -4.47361), ("to", -5.472585), ("u", -3.505271), ("ue", -4.480368), ("v", -3.828195), ("w", -4.484515), ("y", -3.886393)],
    "fr": [("a", -3.081223), ("al", -4.116902), ("as", -4.659286), ("atch", -4.454419), ("b", -3.493876), ("c", -3.475095), ("d", -3.884193), ("data", -4.447992), ("e", -2.584567), ("er", -3.581992), ("f", -3.912909), ("g", -2.978747), ("h", -3.651101), ("i", -3.881201), ("in", -3.441014), ("j", -4.482824), ("k", -3.917016), ("l", -2.860726), ("lu", -4.517966), ("m", -3.391856), ("mer", -3.937165), ("n", -4.483763), ("o", -3.396351), ("or", -3.614554), ("ow", -3.536229), ("p", -4.654156), ("par", -4.008621), ("q", -4.454251), ("r", -3.569117), ("ro", -4.681323), ("rt", -7.738329), ("s", -3.050522), ("scan", -4.392862), ("st", -3.817806), ("t", -2.903236), ("ta", -4.99902), ("to", -5.686757), ("u", -3.478702), ("ue", -4.647108), ("v", -3.985128), ("w", -4.465688), ("y", -3.78606)],
    "zh": [("a", -2.599582), ("al", -5.69483), ("as", -4.817384), ("at", -4.499135), ("b", -3.59405), ("c", -2.955474), ("d", -3.568473), ("e", -2.570976), ("er", -3.744752), ("f", -3.890405), ("g", -3.053112), ("h", -3.294137), ("i", -3.963301), ("in", -4.064357), ("j", -24.842702), ("join", -4.419989), ("k", -3.993059), ("l", -3.076592), ("lu", -4.233833), ("m", -3.833718), ("mall", -5.020557), ("mer", -3.896058), ("n", -3.826881), ("o", -3.965343), ("or", -3.6415), ("ow", -3.583842), ("p", -4.627529), ("par", -3.948973), ("q", -4.682353), ("r", -3.561055), ("ro", -4.638093), ("s", -2.884936), ("smal", -5.436034), ("st", -3.823648), ("t", -2.822153), ("ta", -4.480805), ("to", -5.146031), ("u", -3.534822), ("ue", -4.887692), ("v", -3.869715), ("w", -4.636941), ("y", -4.036459)],
}
UNIGRAM_BY_LANG_TOP = 12


def q_unigram_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Viterbi segmentation under per-language pinned
    unigram vocabularies — CCNet's one-model-per-language discipline
    applied to the tokenizer APPLY path (the fit twin of
    corpus_bpe_by_lang). ONE corpus pass builds the (lang, word)
    histogram; the per-language top-K rank and the five DP arms
    (each a pure Column fold under its own pinned piece table) run
    over that checkpointed vocabulary-relational slice, so |langs|
    never multiplies the data passes. Languages without a pinned
    vocabulary produce no rows by contract."""
    from pyspark.sql import Window

    from balboa_spark.operators import unigram

    words = unigram.word_histogram_by_group(_docs(spark, sf_dir), "lang")
    wtop = Window.partitionBy("_g").orderBy(F.col("cnt").desc(), "word")
    top = (
        words.withColumn("_rn", F.row_number().over(wtop))
        .filter(F.col("_rn") <= UNIGRAM_BY_LANG_TOP)
        .drop("_rn")
        .localCheckpoint(eager=False)
    )
    arms = []
    for lang, vocab in sorted(UNIGRAM_BY_LANG_VOCABS.items()):
        staged = top.filter(F.col("_g") == lang).select(
            F.col("_g").alias("lang"),
            "word",
            "cnt",
            unigram.viterbi_forward(
                F.col("word"), vocab, UNIGRAM_MAX_LEN
            ).alias("_fwd"),
        )
        arms.append(
            staged.select(
                "lang",
                "word",
                "cnt",
                F.concat_ws(
                    " ", unigram.viterbi_pieces(F.col("word"), F.col("_fwd"))
                ).alias("pieces"),
                F.round(
                    F.element_at("_fwd", -1)["s"], unigram.LOGP_DP
                ).alias("logp"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.select(
        "lang",
        "word",
        "cnt",
        "pieces",
        F.size(F.split("pieces", " ")).alias("n_pieces"),
        "logp",
    ).orderBy("lang", F.col("cnt").desc(), "word")


def _unigram_by_lang_oracle() -> str:
    """ONE DP block over the lang-tagged word relation, the vocabulary
    selected per row by a CASE over lang (viterbi_sql case_vocabs),
    and the backward walk as a RECURSIVE CTE instead of the
    list_reduce fold. Two formulations were built first and REJECTED
    after reproducing row-level cross-talk (the viterbi_sql trail-note
    hazard family, which the single-vocab oracle never hits because
    its word relation is DISTINCT):

    - one per-language DP block per vocab, UNION ALLed: five
      textually-identical fold stages cross-talked ACROSS blocks (one
      language's trail walked another language's word length);
    - a single block keeping the list_reduce trail: rows sharing the
      same word ACROSS languages still swapped walk results
      run-dependently (the fold's early-exit CASE freezes vector
      lanes at different steps; equal-valued input lists with
      different captured fwd columns collide).

    The recursive walk materializes one row per (lang, word, step) —
    no sequential lambda, nothing lane-local to leak; ~word-length
    recursion depth over a TOP-K-bounded relation."""
    from balboa_spark.operators import unigram

    fwd, _trail, pieces, logp = unigram.viterbi_sql(
        "word",
        None,
        UNIGRAM_MAX_LEN,
        case_col="lang",
        case_vocabs=UNIGRAM_BY_LANG_VOCABS,
    )
    langs = ", ".join(f"'{g}'" for g in sorted(UNIGRAM_BY_LANG_VOCABS))
    return f"""
WITH RECURSIVE words AS (
  SELECT lang, t AS word, count(*) AS cnt
  FROM (
    SELECT lang,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS t
    FROM documents WHERE lang IS NOT NULL
  )
  WHERE regexp_matches(t, '^[a-z0-9]+$')
  GROUP BY lang, t
),
top AS (
  SELECT lang, word, cnt FROM (
    SELECT lang, word, cnt,
           row_number() OVER (PARTITION BY lang
                              ORDER BY cnt DESC, word) AS rn
    FROM words WHERE lang IN ({langs})
  ) WHERE rn <= {UNIGRAM_BY_LANG_TOP}
),
a AS MATERIALIZED (SELECT lang, word, cnt, {fwd} AS fwd FROM top),
walk AS (
  SELECT lang, word, length(word) AS pos, [length(word)] AS tr FROM a
  UNION ALL
  SELECT w.lang, w.word,
         a.fwd[w.pos + 1].bp AS pos,
         list_append(w.tr, a.fwd[w.pos + 1].bp) AS tr
  FROM walk w JOIN a ON a.lang = w.lang AND a.word = w.word
  WHERE w.pos > 0
),
b AS MATERIALIZED (
  SELECT a.lang, a.word, a.cnt, a.fwd, w.tr
  FROM a JOIN walk w ON w.lang = a.lang AND w.word = a.word AND w.pos = 0
),
c AS MATERIALIZED (SELECT lang, word, cnt, fwd, tr, {pieces} AS pl FROM b)
SELECT lang, word, cnt,
       array_to_string(pl, ' ') AS pieces,
       CAST(len(pl) AS INTEGER) AS n_pieces,
       {logp} AS logp
FROM c ORDER BY lang, cnt DESC, word
"""


def q_normalize_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC normalization with a deterministic decomposed prefix
    (e + COMBINING ACUTE) injected so the normalization is observable
    on the ASCII fixture corpus — the clean_text noise trick."""
    from balboa_spark.operators.text import normalize_unicode

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.lit("e\u0301cole "), F.col("text")).alias("text"),
    )
    return normalize_unicode(docs, form="NFC").orderBy("doc_id")


NORMALIZE_UNICODE_ORACLE = """
WITH d AS (
  SELECT doc_id, 'e' || chr(769) || 'cole ' || text AS text FROM documents
)
SELECT doc_id, nfc_normalize(text) AS norm_text,
       -- IS DISTINCT FROM: the engine's changed flag is null-safe
       -- (eqNullSafe), so NULL text reads changed=false, not NULL
       nfc_normalize(text) IS DISTINCT FROM text AS changed
FROM d ORDER BY doc_id
"""


LB_WIDTH, LB_BATCH = 16, 8


def q_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-batching prep: length-bucketed deterministic batch
    assignment over the documents table."""
    return corpus.length_batches(
        _docs(spark, sf_dir), bucket_width=LB_WIDTH, batch_size=LB_BATCH
    ).orderBy("doc_id")


LENGTH_BATCHES_ORACLE = f"""
WITH {_TOKS_SQL},
st AS (
  SELECT doc_id, len(tk) AS n_tokens,
         CAST(len(tk) // {LB_WIDTH} AS INTEGER) AS len_bucket
  FROM toks
)
SELECT doc_id, n_tokens, len_bucket,
       CAST((row_number() OVER (
         PARTITION BY len_bucket ORDER BY n_tokens, doc_id) - 1)
         // {LB_BATCH} AS INTEGER) AS batch_idx
FROM st ORDER BY doc_id
"""


BLOCK_TERMS = ("slow", "spill", "skew")


def q_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist gate over the documents table with a pinned
    3-term list (tokens known present in the fixture corpus)."""
    return corpus.blocklist_signals(_docs(spark, sf_dir), BLOCK_TERMS).orderBy(
        "doc_id"
    )


_BLOCK_ARR = "[" + ", ".join(f"'{t}'" for t in sorted(set(BLOCK_TERMS))) + "]"

BLOCKLIST_ORACLE = f"""
WITH {_TOKS_SQL}
SELECT doc_id,
       CAST(len(list_filter(tk, t -> list_contains({_BLOCK_ARR}, t))) AS INTEGER)
         AS n_blocked_tokens,
       CAST(len(list_intersect(list_distinct(tk), {_BLOCK_ARR})) AS INTEGER)
         AS n_blocked_terms,
       len(list_filter(tk, t -> list_contains({_BLOCK_ARR}, t))) = 0 AS keep
FROM toks ORDER BY doc_id
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-run corpus diff: old = docs with id % 10 != 0,
    new = docs with id % 7 != 0 and every id % 5 == 0 doc's text
    extended — yielding added (id%10==0 & id%7!=0), removed
    (id%7==0 & id%10!=0), and changed (id%5==0, present in both)
    rows by construction."""
    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" edited"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return corpus.snapshot_diff(old, new).orderBy("doc_id")


SNAPSHOT_DIFF_ORACLE = """
WITH o AS (
  SELECT doc_id,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp_old
  FROM documents WHERE doc_id % 10 <> 0
),
n AS (
  SELECT doc_id,
         md5(regexp_replace(trim(lower(
           CASE WHEN doc_id % 5 = 0 THEN text || ' edited' ELSE text END
         )), '\\s+', ' ', 'g')) AS fp_new
  FROM documents WHERE doc_id % 7 <> 0
),
j AS (
  -- presence = join-side id nullness, NOT fp nullness: a NULL-text
  -- doc present on both sides has fp_old IS NULL and would otherwise
  -- misreport as 'added' (the engine uses explicit indicator columns
  -- for the same reason; found by the adversarial-fixture audit)
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, fp_old, fp_new,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN fp_old IS DISTINCT FROM fp_new THEN 'changed'
              ELSE 'unchanged' END AS change
  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
)
SELECT doc_id, change, fp_old, fp_new FROM j
WHERE change <> 'unchanged' ORDER BY doc_id
"""


SPAN_TOKENS = 8


def q_span_dedup_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SpanDedupStore incremental (r10 grading of the persisted
    path): two id-ordered batches through the on-disk store must
    equal one-shot span_dedup — same oracle as corpus_span_dedup
    (global keep-first order == batch order when batches are split
    by ascending doc_id)."""
    import tempfile

    from balboa_spark.operators.dedup_store import SpanDedupStore

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    mid = docs.agg(F.max("doc_id")).first()[0] // 2
    store = SpanDedupStore(
        spark,
        tempfile.mkdtemp(prefix="balboa_spanstore_entry_"),
        span_tokens=SPAN_TOKENS,
    )
    out1 = store.process_batch(docs.filter(F.col("doc_id") <= mid), epoch_id=0)
    out2 = store.process_batch(docs.filter(F.col("doc_id") > mid), epoch_id=1)
    return out1.unionByName(out2).orderBy("doc_id")


def q_bm25_store_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PostingsIndex roundtrip (r10 grading of the persisted path):
    build from the first half of the corpus, incremental-upsert the
    second half, query — must equal one-shot bm25_topk, same oracle
    as corpus_bm25_topk."""
    import tempfile

    from balboa_spark.operators.search import PostingsIndex

    docs = _docs(spark, sf_dir)
    mid = docs.agg(F.max("doc_id")).first()[0] // 2
    idx = PostingsIndex(spark, tempfile.mkdtemp(prefix="balboa_postings_entry_"))
    idx.build(docs.filter(F.col("doc_id") <= mid))
    idx.upsert(docs.filter(F.col("doc_id") > mid), epoch_id=0)
    return idx.topk(BM25_QUERY, k=BM25_K)


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window exact duplicate-span removal (keep-first Lee
    et al. semantics; corpus.span_dedup) on the documents table."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return corpus.span_dedup(docs, span_tokens=SPAN_TOKENS).orderBy("doc_id")


SPAN_DEDUP_ORACLE = f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
  FROM documents
),
tk1 AS (SELECT * FROM tk WHERE len(tk) > 0),
wins AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(tk[i : i + {SPAN_TOKENS} - 1], ' ')) AS h
  FROM tk1, unnest(range(1, len(tk) - {SPAN_TOKENS} + 2)) AS u(i)
  WHERE len(tk) >= {SPAN_TOKENS}
),
ranked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM wins
),
rem AS (
  SELECT doc_id, list_sort(list(pos)) AS rpos
  FROM ranked WHERE rn > 1 GROUP BY doc_id
),
rebuilt AS (
  SELECT t.doc_id,
         len(t.tk) AS n_tokens,
         list_transform(
           list_filter(
             range(1, len(t.tk) + 1),
             i -> r.rpos IS NULL
                  OR len(list_filter(r.rpos,
                         p -> p <= i - 1 AND i - 1 < p + {SPAN_TOKENS})) = 0
           ),
           i -> t.tk[i]
         ) AS kept
  FROM tk1 t LEFT JOIN rem r USING (doc_id)
)
SELECT doc_id,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(n_tokens - len(kept) AS INTEGER) AS n_removed,
       array_to_string(kept, ' ') AS clean_text
FROM rebuilt
WHERE len(kept) > 0
ORDER BY doc_id
"""


def _synth_html_col():
    """Deterministic HTML page wrapping each document (Spark side) —
    title, heading, comment, entity, script. In sync with
    _SYNTH_HTML_SQL."""
    return F.concat(
        F.lit("<html><head><title>"),
        F.col("source"),
        F.lit("</title><style>p{margin:0}</style></head><body><h1>"),
        F.col("source"),
        F.lit("</h1><!-- doc "),
        F.col("doc_id").cast("string"),
        F.lit(" --><p>"),
        F.col("text"),
        F.lit(" &amp; more</p><script>var x = 1 < 2;</script></body></html>"),
    )


_SYNTH_HTML_SQL = (
    "'<html><head><title>' || source || "
    "'</title><style>p{margin:0}</style></head><body><h1>' || source || "
    "'</h1><!-- doc ' || CAST(doc_id AS VARCHAR) || ' --><p>' || text || "
    "' &amp; more</p><script>var x = 1 < 2;</script></body></html>'"
)


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction kernel (text.html_to_text): both sides
    wrap each document in the SAME deterministic HTML page (title,
    heading, comment, entity, script) and run the SAME regex chain
    (HTML_TEXT_RULES — the shared-constants oracle pattern), so the
    hash grades the extraction rules themselves."""
    from balboa_spark.operators.text import html_to_text

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return docs.select(
        "doc_id", html_to_text(_synth_html_col()).alias("clean_text")
    ).orderBy("doc_id")


def _html_extract_oracle() -> str:
    from balboa_spark.operators.text import html_to_text_sql

    return (
        f"SELECT doc_id, {html_to_text_sql(_SYNTH_HTML_SQL)} AS clean_text "
        "FROM documents ORDER BY doc_id"
    )


#: chrome-wrapped page for the main-content gate: link-dense nav,
#: the document text with one inline anchor, a too-short block, a
#: link-dense footer, plus script/comment noise. In sync with
#: _SYNTH_CHROME_SQL.
def _synth_chrome_col():
    return F.concat(
        F.lit(
            "<html><head><title>t</title><style>p{margin:0}</style></head>"
            '<body><div><a href="/">Home</a> <a href="/a">About</a> '
            '<a href="/c">Contact</a></div><h1>'
        ),
        F.col("source"),
        F.lit('</h1><!-- chrome --><p>'),
        F.col("text"),
        F.lit(' See <a href="/d/'),
        F.col("doc_id").cast("string"),
        F.lit(
            '">details</a>.</p><p>short</p>'
            '<div><a href="/p">Privacy</a> <a href="/t">Terms of use</a>'
            "</div><script>var nav = 1 < 2;</script></body></html>"
        ),
    )


_SYNTH_CHROME_SQL = (
    "'<html><head><title>t</title><style>p{margin:0}</style></head>"
    "<body><div><a href=\"/\">Home</a> <a href=\"/a\">About</a> "
    "<a href=\"/c\">Contact</a></div><h1>' || source || "
    "'</h1><!-- chrome --><p>' || text || "
    "' See <a href=\"/d/' || CAST(doc_id AS VARCHAR) || "
    "'\">details</a>.</p><p>short</p>"
    "<div><a href=\"/p\">Privacy</a> <a href=\"/t\">Terms of use</a>"
    "</div><script>var nav = 1 < 2;</script></body></html>'"
)

_MC_MIN_CHARS = 40


def q_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-level main-content extraction (text.extract_main_content,
    the Boilerpipe shallow-text-features gate): every document is
    wrapped in the SAME chrome-heavy page on both sides — the hash
    proves the nav/footer/short blocks drop, the article block with
    its inline anchor survives, and the per-block regex chain matches
    the DuckDB replay exactly."""
    from balboa_spark.operators.text import extract_main_content

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return docs.select(
        "doc_id",
        extract_main_content(
            _synth_chrome_col(), min_block_chars=_MC_MIN_CHARS
        ).alias("main_text"),
    ).orderBy("doc_id")


def _main_content_oracle() -> str:
    from balboa_spark.operators.text import extract_main_content_sql

    # NULL propagation: the engine's codegen chain yields NULL main
    # text for a NULL page, but DuckDB's list/string aggregates can
    # collapse the NULL path to '' — pin NULL-in-NULL-out explicitly.
    # The synth page concatenates text AND source, so either being
    # NULL nulls the page (doc_id is never NULL).
    return (
        "SELECT doc_id, CASE WHEN text IS NULL OR source IS NULL THEN NULL ELSE "
        + extract_main_content_sql(
            _SYNTH_CHROME_SQL, min_block_chars=_MC_MIN_CHARS
        )
        + " END AS main_text FROM documents ORDER BY doc_id"
    )


def _synth_url_col():
    """Deterministic per-document URL (Spark side) — www-prefix,
    subdomain, tld by doc_id residues, covering every
    registered_domain heuristic branch. MUST stay textually in sync
    with _synth_url_sql."""
    return F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("sub"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("."),
        F.col("source"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(".co.uk"))
        .when(F.col("doc_id") % 4 == 1, F.lit(".com"))
        .when(F.col("doc_id") % 4 == 2, F.lit(".org"))
        .otherwise(F.lit(".com.au")),
        F.lit("/d/"),
        F.col("doc_id").cast("string"),
    )


_SYNTH_URL_SQL = (
    "'https://' || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END || "
    "'sub' || CAST(doc_id % 7 AS VARCHAR) || '.' || source || "
    "CASE doc_id % 4 WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com' "
    "WHEN 2 THEN '.org' ELSE '.com.au' END || "
    "'/d/' || CAST(doc_id AS VARCHAR)"
)


def q_domain_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain crawl rollup (corpus.domain_profile over
    functions/url.registered_domain): both sides synthesize the SAME
    deterministic URL per document — www-prefix, subdomain, tld by
    doc_id residues — so every heuristic branch (2-label, 3-label
    second-level registry, www strip) lands in the graded key."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return corpus.domain_profile(
        docs.withColumn("url", _synth_url_col()), url_col="url", text_col="text"
    ).orderBy("domain")


def _domain_profile_oracle() -> str:
    from balboa_spark.functions.psl import full_psl_rules, registered_domain_psl_sql

    return f"""
WITH u AS (
  SELECT text, {_SYNTH_URL_SQL} AS url
  FROM documents
),
tk AS (
  SELECT {registered_domain_psl_sql('url', full_psl_rules())} AS domain,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
             t -> t <> '')) AS nt
  FROM u
)
SELECT domain, count(*) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       CAST(floor(sum(nt) * 1.0 / count(*)) AS BIGINT) AS mean_tokens
FROM tk GROUP BY domain ORDER BY domain
"""


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/DCLM-style LEARNED quality filter: 5-iteration batch-GD
    logistic regression (is-curated-source label) then score the
    corpus. The oracle unrolls the identical training loop as chained
    CTEs, so the hash grades the training trajectory itself — the
    per-iteration 8-decimal rounding on both sides is what makes the
    float trajectories identical (classifier.py module doc)."""
    from balboa_spark.operators import classifier

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return classifier.quality_classifier(docs, "src0").orderBy("doc_id")


def _quality_classifier_oracle() -> str:
    from balboa_spark.operators.classifier import logreg_sql

    return logreg_sql("source = 'src0'")


WS_K = 20


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (A-ES, md5 uniforms): WS_K docs
    per source, weight = document length — the quality-weighted
    subsample primitive with the stratified arm exercised."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return (
        corpus.weighted_sample_k(
            docs, WS_K, F.col("n_chars").cast("double"), strata=("source",)
        )
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


def _weighted_sample_oracle() -> str:
    from balboa_spark.operators.corpus import _WS_HEX, _WS_SIG

    raw = (
        f"(ln((CAST('0x' || substr(md5('ws1' || chr(31) || "
        f"CAST(doc_id AS VARCHAR)), 1, {_WS_HEX}) AS BIGINT) + 1.0)"
        f" / {float(16**_WS_HEX + 2)!r}) / CAST(n_chars AS DOUBLE))"
    )
    scale = f"pow(10.0, {_WS_SIG - 1} - floor(log10(abs({raw}))))"
    return f"""
WITH s AS (
  SELECT doc_id, source, n_chars,
         round({raw} * {scale}, 0) / {scale} AS wkey
  FROM documents WHERE n_chars > 0
),
r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY wkey DESC, doc_id) AS rn
  FROM s
)
SELECT doc_id, source, n_chars FROM r WHERE rn <= {WS_K} ORDER BY doc_id
"""


def q_pipeline_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed CRAWL-curation chain over the r7 operators —
    synth page -> html_to_text -> Gopher gate -> exact dedup
    (keep-first) -> per-domain rollup — integration-graded end to end
    like pipeline_pretrain is for the pretraining chain: the oracle
    replays every stage, so stage contracts (extracted-text
    tokenization feeding the gate, fingerprint after extraction,
    domain key after the gate) are what the hash checks."""
    from balboa_spark.operators import dedup
    from balboa_spark.operators.text import html_to_text

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    # two plan hygiene steps, both measured at sf0.1:
    # - repartition: the documents parquet is ONE scan partition at
    #   test scale, so the Gopher mode-gram arrays would run in one
    #   task (at production scale the scan has real partitions and
    #   this is a near-no-op);
    # - localCheckpoint BELOW the keep filter, with the gate verdict
    #   computed in the same projection chain as the extraction: an
    #   INLINED html_to_text chain re-runs its 16 regexes once per
    #   reference (measured 6.9s -> 1.5s for the gate alone), and a
    #   keep filter pushed below a text-only checkpoint re-inlines the
    #   tokenize chain per reference inside the pushed predicate (the
    #   r16 pretrain_pipeline finding: 1.80s -> 0.86s for the gate
    #   stage) — one checkpoint materializes extraction AND verdict,
    #   each subtree single-use.
    extracted = docs.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id",
        _synth_url_col().alias("url"),
        html_to_text(_synth_html_col()).alias("text"),
    )
    gated = (
        corpus.gopher_filter(extracted, passthrough=("url", "text"))
        .select("doc_id", "url", "text", "keep")
        .localCheckpoint(eager=True)
        .filter("keep")
        .select("doc_id", "url", "text")
    )
    kept = dedup.exact_dedup(gated, "text", "doc_id")
    return corpus.domain_profile(kept, url_col="url", text_col="text").orderBy(
        "domain"
    )


def _pipeline_crawl_oracle() -> str:
    from balboa_spark.functions.psl import full_psl_rules, registered_domain_psl_sql
    from balboa_spark.operators.text import html_to_text_sql

    return f"""
WITH src AS (
  SELECT doc_id, {_SYNTH_URL_SQL} AS url,
         {html_to_text_sql(_SYNTH_HTML_SQL)} AS text
  FROM documents
),
tok AS (
  SELECT *, list_filter(string_split_regex(lower(text), '\\s+'),
                        t -> t <> '') AS tk
  FROM src
),
grams AS (
  SELECT *, {_grams_sql('tk', 2)} AS g2 FROM tok
),
sig AS (
  SELECT doc_id, url, text, tk,
         len(tk) AS n_tokens,
         round(1.0 - len(list_distinct(tk))::DOUBLE / greatest(len(tk), 1), 4)
           AS dup_token_frac,
         {_MODE_FRAC_SQL.format(g='g2')} AS top_2gram_frac
  FROM grams
),
kept0 AS (
  SELECT * FROM sig
  WHERE n_tokens >= {MIN_TOKENS}
    AND dup_token_frac <= {MAX_DUP_TOKEN_FRAC}
    AND top_2gram_frac <= {MAX_TOP_2GRAM_FRAC}
),
fp AS (
  SELECT *, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
  FROM kept0
),
kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fp
  ) WHERE rn = 1
)
SELECT {registered_domain_psl_sql('url', full_psl_rules())} AS domain,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(floor(sum(n_tokens) * 1.0 / count(*)) AS BIGINT) AS mean_tokens
FROM kept GROUP BY 1 ORDER BY domain
"""


DOMAIN_CAP = 10


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (C4 pages-per-site limit, corpus.domain_cap):
    at most DOMAIN_CAP docs per registrable domain of the synthetic
    URL, chosen by the deterministic md5 order both engines replay."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return (
        corpus.domain_cap(
            docs.withColumn("url", _synth_url_col()), cap=DOMAIN_CAP
        )
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def _domain_cap_oracle() -> str:
    from balboa_spark.functions.psl import full_psl_rules, registered_domain_psl_sql

    return f"""
WITH u AS (
  SELECT doc_id, source, {_SYNTH_URL_SQL} AS url FROM documents
),
d AS (
  SELECT doc_id, source, {registered_domain_psl_sql('url', full_psl_rules())} AS dom FROM u
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY dom
           ORDER BY md5('dcap1' || chr(31) || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM d
)
SELECT doc_id, source FROM r WHERE rn <= {DOMAIN_CAP} ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# bigram-LM perplexity (CCNet-style quality filter, self-trained)
# ---------------------------------------------------------------------------

def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from balboa_spark.operators import lm

    return lm.bigram_lm_perplexity(_docs(spark, sf_dir)).orderBy("doc_id")


# Twin of operators.lm.bigram_lm_perplexity: add-1-smoothed bigram LM
# trained on the corpus itself. DuckDB lists are 1-indexed and
# range(a, b) is end-exclusive, so i = 1..len-1 pairs (tk[i], tk[i+1])
# — the mirror of Spark's 0-indexed sequence(1, size-1) walk. Parallel
# unnest() calls zip positionally.
LM_PERPLEXITY_ORACLE = f"""
WITH {_TOKS_SQL},
staged AS (SELECT doc_id, tk FROM toks WHERE len(tk) >= 2),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
         unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
  FROM staged
),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
v AS (
  SELECT count(DISTINCT t) AS vocab
  FROM (SELECT unnest(tk) AS t FROM toks)
)
SELECT doc_id,
       count(*) AS n_bigrams,
       sum(ln((c12.c12 + 1.0) / (c1.c1 + 1.0 * v.vocab))) / count(*)
         AS avg_logprob,
       exp(-(sum(ln((c12.c12 + 1.0) / (c1.c1 + 1.0 * v.vocab))) / count(*)))
         AS perplexity
FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
GROUP BY doc_id, v.vocab
ORDER BY doc_id
"""


def q_lm_store_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigramCountStore roundtrip (r10 grading of the persisted LM
    path): two disjoint batches folded into the on-disk count store,
    compacted into one base generation, then score the corpus from
    ``store.model()`` — counts are associative sums, so the folded
    model must equal the one-shot self-trained LM; same oracle as
    corpus_lm_perplexity."""
    import tempfile

    from balboa_spark.operators import lm

    docs = _docs(spark, sf_dir)
    store = lm.BigramCountStore(
        spark, tempfile.mkdtemp(prefix="balboa_lmstore_entry_")
    )
    for e in range(2):
        store.process_batch(docs.where(F.col("doc_id") % 2 == e), epoch_id=e)
    store.compact()
    return lm.score_bigram_lm(docs, store.model()).orderBy("doc_id")


def q_lm3_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from balboa_spark.operators import lm

    return lm.ngram_lm_perplexity(_docs(spark, sf_dir), n=3).orderBy("doc_id")


# Twin of operators.lm.ngram_lm_perplexity at n=3: context = 2-token
# prefix (space-joined), target = the following token. DuckDB range is
# end-exclusive, so i = 1..len-2 pairs ctx tk[i..i+1] with w tk[i+2].
LM3_PERPLEXITY_ORACLE = f"""
WITH {_TOKS_SQL},
staged AS (SELECT doc_id, tk FROM toks WHERE len(tk) >= 3),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk) - 1),
                i -> array_to_string(list_slice(tk, i, i + 1), ' '))) AS ctx,
         unnest(list_transform(range(1, len(tk) - 1), i -> tk[i + 2])) AS w
  FROM staged
),
cg AS (SELECT ctx, w, count(*) AS c_gram FROM g GROUP BY 1, 2),
cc AS (SELECT ctx, count(*) AS c_ctx FROM g GROUP BY 1),
v AS (
  SELECT count(DISTINCT t) AS vocab
  FROM (SELECT unnest(tk) AS t FROM toks)
)
SELECT doc_id,
       count(*) AS n_grams,
       sum(ln((cg.c_gram + 1.0) / (cc.c_ctx + 1.0 * v.vocab))) / count(*)
         AS avg_logprob,
       exp(-(sum(ln((cg.c_gram + 1.0) / (cc.c_ctx + 1.0 * v.vocab)))
             / count(*))) AS perplexity
FROM g JOIN cg USING (ctx, w) JOIN cc USING (ctx) CROSS JOIN v
GROUP BY doc_id, v.vocab
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# interpolated Kneser-Ney + stupid backoff (r11) — train on the even
# half, score everything, so the unseen-gram / unseen-context / OOV
# arms all execute (self-trained would never leave the seen path)
# ---------------------------------------------------------------------------

def q_lm_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from balboa_spark.operators import lm

    docs = _docs(spark, sf_dir)
    return lm.kn_bigram_lm_perplexity(
        docs, train=docs.where(F.col("doc_id") % 2 == 0)
    ).orderBy("doc_id")


# Twin of operators.lm.kn_bigram_lm_perplexity (interpolated KN,
# Ney-estimated discount D = n1/(n1+2*n2), alpha_c=1 continuation
# smoothing). Every arithmetic expression mirrors the Column tree's
# association order so the doubles agree to the driver's rounding.
# Parametrized on the training predicate: the even-half split for the
# batch entry (exercises the unseen arms), TRUE for the store entry
# (self-trained, matching kn_model over the full folded history).
def _kn_bigram_oracle(train_pred: str) -> str:
    return f"""
WITH {_TOKS_SQL},
ttoks AS (SELECT * FROM toks WHERE {train_pred}),
tbg AS (
  SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
         unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
  FROM ttoks WHERE len(tk) >= 2
),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM tbg GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n1p_fw FROM c12 GROUP BY 1),
cont AS (SELECT w2, count(*) AS n1p_bw FROM c12 GROUP BY 1),
s AS (
  SELECT count(*) AS types,
         sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS n2
  FROM c12
),
v AS (
  SELECT count(DISTINCT t) AS vocab
  FROM (SELECT unnest(tk) AS t FROM ttoks)
),
d AS (
  SELECT CASE WHEN n1 + 2 * n2 > 0 THEN n1 / (n1 + 2 * n2) ELSE 0.5 END
           AS disc
  FROM s
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
         unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
  FROM toks WHERE len(tk) >= 2
),
j AS (
  SELECT bg.doc_id,
         ln(CASE WHEN ctx.c1 IS NOT NULL THEN
              greatest(coalesce(c12.c12, 0) - d.disc, 0.0) / ctx.c1
              + d.disc * ctx.n1p_fw / ctx.c1
                * ((coalesce(cont.n1p_bw, 0) + 1.0)
                   / (s.types + 1.0 * v.vocab))
            ELSE (coalesce(cont.n1p_bw, 0) + 1.0)
                 / (s.types + 1.0 * v.vocab)
            END) AS lp
  FROM bg
  LEFT JOIN c12 USING (w1, w2)
  LEFT JOIN ctx USING (w1)
  LEFT JOIN cont USING (w2)
  CROSS JOIN s CROSS JOIN v CROSS JOIN d
)
SELECT doc_id, count(*) AS n_bigrams,
       sum(lp) / count(*) AS avg_logprob,
       exp(-(sum(lp) / count(*))) AS perplexity
FROM j GROUP BY doc_id ORDER BY doc_id
"""


LM_KN_PERPLEXITY_ORACLE = _kn_bigram_oracle("doc_id % 2 = 0")

_SBO_B1 = 0.4
_SBO_B2 = 0.4 ** 2


def q_lm_sbo_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from balboa_spark.operators import lm

    docs = _docs(spark, sf_dir)
    return lm.stupid_backoff_perplexity(
        docs, n=3, train=docs.where(F.col("doc_id") % 2 == 0)
    ).orderBy("doc_id")


# Twin of operators.lm.stupid_backoff_perplexity at n=3: seen trigram
# wins at face value, else 0.4 * bigram relative frequency, else
# 0.4^2 * add-1 unigram. Backoff powers are interpolated from the same
# Python floats the Column tree uses.
LM_SBO_PERPLEXITY_ORACLE = f"""
WITH {_TOKS_SQL},
ttoks AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
tg AS (
  SELECT ctx, w, count(*) AS c3 FROM (
    SELECT unnest(list_transform(range(1, len(tk) - 1),
             i -> array_to_string(list_slice(tk, i, i + 1), ' '))) AS ctx,
           unnest(list_transform(range(1, len(tk) - 1), i -> tk[i + 2])) AS w
    FROM ttoks WHERE len(tk) >= 3) GROUP BY 1, 2
),
sg3 AS (SELECT ctx, sum(c3) AS s3 FROM tg GROUP BY 1),
bgm AS (
  SELECT ctx, w, count(*) AS c2 FROM (
    SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS ctx,
           unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w
    FROM ttoks WHERE len(tk) >= 2) GROUP BY 1, 2
),
sg2 AS (SELECT ctx, sum(c2) AS s2 FROM bgm GROUP BY 1),
uni AS (
  SELECT t AS w, count(*) AS cu
  FROM (SELECT unnest(tk) AS t FROM ttoks) GROUP BY 1
),
nv AS (
  SELECT count(*) AS n_total, count(DISTINCT t) AS vocab
  FROM (SELECT unnest(tk) AS t FROM ttoks)
),
sg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk) - 1),
           i -> array_to_string(list_slice(tk, i, i + 1), ' '))) AS ctx3,
         unnest(list_transform(range(1, len(tk) - 1), i -> tk[i + 1])) AS ctx2,
         unnest(list_transform(range(1, len(tk) - 1), i -> tk[i + 2])) AS w
  FROM toks WHERE len(tk) >= 3
),
j AS (
  SELECT sg.doc_id,
         ln(CASE
           WHEN tg.c3 IS NOT NULL THEN tg.c3 / (1.0 * sg3.s3)
           WHEN bgm.c2 IS NOT NULL THEN {_SBO_B1!r} * (bgm.c2 / (1.0 * sg2.s2))
           ELSE ((coalesce(uni.cu, 0) + 1.0)
                 / (nv.n_total + 1.0 * nv.vocab)) * {_SBO_B2!r}
         END) AS lp
  FROM sg
  LEFT JOIN tg ON tg.ctx = sg.ctx3 AND tg.w = sg.w
  LEFT JOIN sg3 ON sg3.ctx = sg.ctx3
  LEFT JOIN bgm ON bgm.ctx = sg.ctx2 AND bgm.w = sg.w
  LEFT JOIN sg2 ON sg2.ctx = sg.ctx2
  LEFT JOIN uni ON uni.w = sg.w
  CROSS JOIN nv
)
SELECT doc_id, count(*) AS n_grams,
       sum(lp) / count(*) AS avg_logscore,
       exp(-(sum(lp) / count(*))) AS perplexity
FROM j GROUP BY doc_id ORDER BY doc_id
"""

def q_lm_kn3_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from balboa_spark.operators import lm

    docs = _docs(spark, sf_dir)
    return lm.kn_ngram_lm_perplexity(
        docs, n=3, train=docs.where(F.col("doc_id") % 2 == 0)
    ).orderBy("doc_id")


# Twin of operators.lm.kn_ngram_lm_perplexity at n=3 (recursive
# interpolated KN): raw trigram counts at the top; the order-2 table
# is the ADJUSTED continuation counts (trigram types grouped by their
# last-2-token suffix), the order-1 table likewise from bigram types;
# one Ney discount per order. Arithmetic mirrors the Column tree.
def _kn3_oracle(train_pred: str) -> str:
    return f"""
WITH {_TOKS_SQL},
ttoks AS (SELECT * FROM toks WHERE {train_pred}),
tg3 AS (
  SELECT ctx, w, count(*) AS c3 FROM (
    SELECT unnest(list_transform(range(1, len(tk) - 1),
             i -> array_to_string(list_slice(tk, i, i + 1), ' '))) AS ctx,
           unnest(list_transform(range(1, len(tk) - 1), i -> tk[i + 2])) AS w
    FROM ttoks WHERE len(tk) >= 3) GROUP BY 1, 2
),
bg2 AS (
  SELECT ctx, w, count(*) AS c2 FROM (
    SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS ctx,
           unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w
    FROM ttoks WHERE len(tk) >= 2) GROUP BY 1, 2
),
a2 AS (
  SELECT substring(ctx, strpos(ctx, ' ') + 1) AS ctx, w,
         count(*) AS adj2
  FROM tg3 GROUP BY 1, 2
),
a1 AS (SELECT w, count(*) AS adj1 FROM bg2 GROUP BY 1),
st3 AS (SELECT ctx, sum(c3) AS tot3, count(*) AS nfw3 FROM tg3 GROUP BY 1),
st2 AS (SELECT ctx, sum(adj2) AS tot2, count(*) AS nfw2 FROM a2 GROUP BY 1),
sc AS (
  SELECT (SELECT count(*) FROM bg2) AS a1_total,
         (SELECT count(DISTINCT t) FROM (SELECT unnest(tk) AS t FROM ttoks))
           AS vocab,
         (SELECT CASE WHEN sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END)
                        + 2 * sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END) > 0
                 THEN sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END)
                      / (sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END)
                         + 2 * sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END))
                 ELSE 0.5 END FROM tg3) AS d3,
         (SELECT CASE WHEN sum(CASE WHEN adj2 = 1 THEN 1 ELSE 0 END)
                        + 2 * sum(CASE WHEN adj2 = 2 THEN 1 ELSE 0 END) > 0
                 THEN sum(CASE WHEN adj2 = 1 THEN 1 ELSE 0 END)
                      / (sum(CASE WHEN adj2 = 1 THEN 1 ELSE 0 END)
                         + 2 * sum(CASE WHEN adj2 = 2 THEN 1 ELSE 0 END))
                 ELSE 0.5 END FROM a2) AS d2
),
sg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk) - 1),
           i -> array_to_string(list_slice(tk, i, i + 1), ' '))) AS ctx3,
         unnest(list_transform(range(1, len(tk) - 1), i -> tk[i + 1])) AS ctx2,
         unnest(list_transform(range(1, len(tk) - 1), i -> tk[i + 2])) AS w
  FROM toks WHERE len(tk) >= 3
),
j AS (
  SELECT sg.doc_id,
         ln(CASE WHEN st3.tot3 IS NOT NULL THEN
              greatest(coalesce(tg3.c3, 0) - sc.d3, 0.0) / st3.tot3
              + sc.d3 * st3.nfw3 / st3.tot3
                * (CASE WHEN st2.tot2 IS NOT NULL THEN
                     greatest(coalesce(a2.adj2, 0) - sc.d2, 0.0) / st2.tot2
                     + sc.d2 * st2.nfw2 / st2.tot2
                       * ((coalesce(a1.adj1, 0) + 1.0)
                          / (sc.a1_total + 1.0 * sc.vocab))
                   ELSE (coalesce(a1.adj1, 0) + 1.0)
                        / (sc.a1_total + 1.0 * sc.vocab) END)
            WHEN st2.tot2 IS NOT NULL THEN
              greatest(coalesce(a2.adj2, 0) - sc.d2, 0.0) / st2.tot2
              + sc.d2 * st2.nfw2 / st2.tot2
                * ((coalesce(a1.adj1, 0) + 1.0)
                   / (sc.a1_total + 1.0 * sc.vocab))
            ELSE (coalesce(a1.adj1, 0) + 1.0)
                 / (sc.a1_total + 1.0 * sc.vocab)
            END) AS lp
  FROM sg
  LEFT JOIN tg3 ON tg3.ctx = sg.ctx3 AND tg3.w = sg.w
  LEFT JOIN st3 ON st3.ctx = sg.ctx3
  LEFT JOIN a2 ON a2.ctx = sg.ctx2 AND a2.w = sg.w
  LEFT JOIN st2 ON st2.ctx = sg.ctx2
  LEFT JOIN a1 ON a1.w = sg.w
  CROSS JOIN sc
)
SELECT doc_id, count(*) AS n_grams,
       sum(lp) / count(*) AS avg_logprob,
       exp(-(sum(lp) / count(*))) AS perplexity
FROM j GROUP BY doc_id ORDER BY doc_id
"""


LM_KN3_PERPLEXITY_ORACLE = _kn3_oracle("doc_id % 2 = 0")


def q_lm_mkn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from balboa_spark.operators import lm

    docs = _docs(spark, sf_dir)
    return lm.mkn_bigram_lm_perplexity(
        docs, train=docs.where(F.col("doc_id") % 2 == 0)
    ).orderBy("doc_id")


# Twin of operators.lm.mkn_bigram_lm_perplexity: three count-of-counts
# discounts (Y = n1/(n1+2n2); D_k = k − (k+1)·Y·n_{k+1}/n_k clamped to
# [0, k], fallback k·Y on a zero bucket), per-context discounted-mass
# gamma = D1·N1 + D2·N2 + D3·N3+. Scalar arithmetic and clamp order
# mirror _mkn_discounts exactly.
LM_MKN_PERPLEXITY_ORACLE = f"""
WITH {_TOKS_SQL},
ttoks AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
tbg AS (
  SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
         unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
  FROM ttoks WHERE len(tk) >= 2
),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM tbg GROUP BY 1, 2),
ctx AS (
  SELECT w1, sum(c12) AS c1,
         sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS kn1,
         sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS kn2,
         sum(CASE WHEN c12 >= 3 THEN 1 ELSE 0 END) AS kn3p
  FROM c12 GROUP BY 1
),
cont AS (SELECT w2, count(*) AS n1p_bw FROM c12 GROUP BY 1),
s AS (
  SELECT count(*) AS types,
         sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS n2,
         sum(CASE WHEN c12 = 3 THEN 1 ELSE 0 END) AS n3,
         sum(CASE WHEN c12 = 4 THEN 1 ELSE 0 END) AS n4
  FROM c12
),
v AS (
  SELECT count(DISTINCT t) AS vocab
  FROM (SELECT unnest(tk) AS t FROM ttoks)
),
yy AS (
  SELECT CASE WHEN n1 + 2 * n2 > 0 THEN n1 / (n1 + 2 * n2)
              ELSE 0.5 END AS y
  FROM s
),
dd AS (
  SELECT greatest(0.0, least(CASE WHEN s.n1 > 0
             THEN 1 - 2 * yy.y * s.n2 / s.n1 ELSE 1 * yy.y END, 1.0)) AS d1,
         greatest(0.0, least(CASE WHEN s.n2 > 0
             THEN 2 - 3 * yy.y * s.n3 / s.n2 ELSE 2 * yy.y END, 2.0)) AS d2,
         greatest(0.0, least(CASE WHEN s.n3 > 0
             THEN 3 - 4 * yy.y * s.n4 / s.n3 ELSE 3 * yy.y END, 3.0)) AS d3
  FROM s, yy
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
         unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
  FROM toks WHERE len(tk) >= 2
),
j AS (
  SELECT bg.doc_id,
         ln(CASE WHEN ctx.c1 IS NOT NULL THEN
              (coalesce(c12.c12, 0)
               - CASE WHEN coalesce(c12.c12, 0) >= 3 THEN dd.d3
                      WHEN coalesce(c12.c12, 0) = 2 THEN dd.d2
                      WHEN coalesce(c12.c12, 0) = 1 THEN dd.d1
                      ELSE 0.0 END) / ctx.c1
              + (dd.d1 * ctx.kn1 + dd.d2 * ctx.kn2 + dd.d3 * ctx.kn3p)
                / ctx.c1
                * ((coalesce(cont.n1p_bw, 0) + 1.0)
                   / (s.types + 1.0 * v.vocab))
            ELSE (coalesce(cont.n1p_bw, 0) + 1.0)
                 / (s.types + 1.0 * v.vocab)
            END) AS lp
  FROM bg
  LEFT JOIN c12 USING (w1, w2)
  LEFT JOIN ctx USING (w1)
  LEFT JOIN cont USING (w2)
  CROSS JOIN s CROSS JOIN v CROSS JOIN dd
)
SELECT doc_id, count(*) AS n_bigrams,
       sum(lp) / count(*) AS avg_logprob,
       exp(-(sum(lp) / count(*))) AS perplexity
FROM j GROUP BY doc_id ORDER BY doc_id
"""


def q_lm_store_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KN from the incremental count store (r11): two disjoint batches
    folded on disk, compacted, then the interpolated-KN model derives
    every statistic (context totals, continuation counts, Ney
    discount) from the folded bigram TYPE table — type counts are a
    function of the folded sums, so the result must equal one-shot
    self-trained KN; same oracle with the full-corpus train predicate."""
    import tempfile

    from balboa_spark.operators import lm

    docs = _docs(spark, sf_dir)
    store = lm.BigramCountStore(
        spark, tempfile.mkdtemp(prefix="balboa_knstore_entry_")
    )
    for e in range(2):
        store.process_batch(docs.where(F.col("doc_id") % 2 == e), epoch_id=e)
    store.compact()
    return lm.score_kn_bigram_lm(docs, store.kn_model()).orderBy("doc_id")


def q_exact_dedup_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactDedupStore roundtrip (r11): the corpus plus a parity-
    flipped duplicate block (doc_id + 10001 — an even original's dup
    lands in the ODD batch and vice versa) is processed as two
    stream epochs against a real on-disk fingerprint history. The
    keep rule the oracle replays: first batch to carry a fingerprint
    wins, lowest id within that batch."""
    import tempfile

    from balboa_spark.operators.dedup_store import ExactDedupStore

    docs = load_tables(spark, sf_dir, names=("documents",))[
        "documents"
    ].select("doc_id", "source", "text")
    planted = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 10001).alias("doc_id"), "source", "text"
        )
    )
    store = ExactDedupStore(
        spark, tempfile.mkdtemp(prefix="balboa_exact_store_entry_")
    )
    out0 = store.process_batch(
        planted.where(F.col("doc_id") % 2 == 0), epoch_id=0
    )
    out1 = store.process_batch(
        planted.where(F.col("doc_id") % 2 == 1), epoch_id=1
    )
    return (
        out0.unionByName(out1).select("doc_id", "source").orderBy("doc_id")
    )


EXACT_DEDUP_STORE_ORACLE = r"""
WITH raw AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 10001, source, text FROM documents
),
f AS (
  -- mirrors ExactDedupStore._fp: NULL text -> sentinel 'null' (one
  -- dedup group), empty token list -> md5('') (DuckDB
  -- array_to_string([]) is NULL, Spark array_join([]) is '')
  SELECT doc_id, source, doc_id % 2 AS batch,
         CASE WHEN text IS NULL THEN 'null'
              ELSE md5(coalesce(array_to_string(list_filter(
                string_split_regex(lower(text), '\s+'), t -> t <> ''), ' '), ''))
         END AS fp
  FROM raw
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY fp ORDER BY batch, doc_id) AS rn
  FROM f
)
SELECT doc_id, source FROM r WHERE rn = 1 ORDER BY doc_id
"""


def q_pipeline_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed CCNet curation chain (lm.ccnet_pipeline),
    integration-graded end to end like pipeline_pretrain/crawl: a
    full duplicate of the corpus is planted (doc_id + 10000) so the
    hash-dedup stage is observable (exactly the originals survive),
    the KN LM trains on the kept src0 slice, and every surviving
    document carries its perplexity and head/middle/tail band."""
    from balboa_spark.operators import lm

    docs = load_tables(spark, sf_dir, names=("documents",))[
        "documents"
    ].select("doc_id", "source", "text")
    planted = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 10000).alias("doc_id"), "source", "text"
        )
    )
    return lm.ccnet_pipeline(planted).orderBy("doc_id")


def q_pipeline_ccnet_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The threshold="approx" arm of the CCNet chain — the variant a
    100 TB user actually runs (percentile_approx's bounded sketch
    instead of exact percentile's map-side multiset). The band cut
    points come from a KLL-style sketch, so band LABELS may deviate
    from the exact tertiles within the sketch's rank-error tolerance
    (percentile_approx default accuracy 10000 -> rank error <= 1e-4)
    and no SQL oracle can replay them hash-exactly — so the graded
    output is the SKETCH-INDEPENDENT projection (doc_id, source,
    perplexity): banding never drops or rescores a doc (the sketch
    only moves the two cut points), so these columns are exact by
    construction and the hash pins the whole upstream chain
    (dedup -> KN LM -> score) while the approx-banding code still
    RUNS end to end (the band column is computed, then projected
    away — the corpus_pack_bestfit mechanism of restricting the
    oracle to the deterministic projection)."""
    from balboa_spark.operators import lm

    docs = load_tables(spark, sf_dir, names=("documents",))[
        "documents"
    ].select("doc_id", "source", "text")
    planted = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 10000).alias("doc_id"), "source", "text"
        )
    )
    return (
        lm.ccnet_pipeline(planted, threshold="approx")
        .select("doc_id", "source", "perplexity")
        .orderBy("doc_id")
    )


# The ccnet oracle is assembled from shared pieces (r12) so the
# document-dedup, paragraph-dedup, order-2 and order-5 chain variants
# replay the SAME proven arithmetic: a dedup prefix that must produce
# a CTE named ``kept (doc_id, source, text)``, the tokenizer pair
# ``ktoks``/``ttoks``, a scoring block ending in
# ``scored (doc_id, perplexity)``, and the tertile band suffix.

# Keep-first = min doc_id per normalized-text hash (the engine's
# groupBy-min contract; the oracle's window formulation is equivalent
# on DuckDB's small replay side).
_CCNET_DOC_DEDUP_PREFIX = r"""raw AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 10000, source, text FROM documents
),
rt AS (
  SELECT doc_id, source, text,
         md5(array_to_string(list_filter(
           string_split_regex(lower(text), '\s+'), t -> t <> ''), ' ')) AS fp
  FROM raw
),
kept AS (
  SELECT doc_id, source, text FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM rt
  ) WHERE rn = 1
),
"""

_CCNET_KTOKS = r"""ktoks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\s+'),
                     t -> t <> '') AS tk
  FROM kept
),
ttoks AS (SELECT * FROM ktoks WHERE source = 'src0'),
"""

# Interpolated-KN bigram scoring (same arithmetic as _kn_bigram_oracle)
# -> scored (doc_id, perplexity)
_CCNET_KN2_SCORED = r"""tbg AS (
  SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
         unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
  FROM ttoks WHERE len(tk) >= 2
),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM tbg GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n1p_fw FROM c12 GROUP BY 1),
cont AS (SELECT w2, count(*) AS n1p_bw FROM c12 GROUP BY 1),
s AS (
  SELECT count(*) AS types,
         sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS n2
  FROM c12
),
v AS (
  SELECT count(DISTINCT t) AS vocab
  FROM (SELECT unnest(tk) AS t FROM ttoks)
),
d AS (
  SELECT CASE WHEN n1 + 2 * n2 > 0 THEN n1 / (n1 + 2 * n2) ELSE 0.5 END
           AS disc
  FROM s
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
         unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
  FROM ktoks WHERE len(tk) >= 2
),
j AS (
  SELECT bg.doc_id,
         ln(CASE WHEN ctx.c1 IS NOT NULL THEN
              greatest(coalesce(c12.c12, 0) - d.disc, 0.0) / ctx.c1
              + d.disc * ctx.n1p_fw / ctx.c1
                * ((coalesce(cont.n1p_bw, 0) + 1.0)
                   / (s.types + 1.0 * v.vocab))
            ELSE (coalesce(cont.n1p_bw, 0) + 1.0)
                 / (s.types + 1.0 * v.vocab)
            END) AS lp
  FROM bg
  LEFT JOIN c12 USING (w1, w2)
  LEFT JOIN ctx USING (w1)
  LEFT JOIN cont USING (w2)
  CROSS JOIN s CROSS JOIN v CROSS JOIN d
),
scored AS (
  SELECT doc_id,
         exp(-(sum(lp) / count(*))) AS perplexity
  FROM j GROUP BY doc_id
),
"""

_CCNET_BAND_SUFFIX = r"""b AS (
  SELECT round(quantile_cont(perplexity, 0.1), 6) AS lo,
         round(quantile_cont(perplexity, 0.8), 6) AS hi
  FROM scored
)
SELECT z.doc_id, k.source, z.perplexity,
       CASE WHEN z.perplexity < b.lo THEN 'head'
            WHEN z.perplexity <= b.hi THEN 'middle'
            ELSE 'tail' END AS band
FROM scored z JOIN kept k USING (doc_id), b
ORDER BY z.doc_id
"""

# Replays every stage: normalized-hash keep-first dedup, interpolated
# KN trained on the kept src0 slice, scoring over all kept docs,
# tertile banding by rounded exact quantiles.
PIPELINE_CCNET_ORACLE = (
    "WITH "
    + _CCNET_DOC_DEDUP_PREFIX
    + _CCNET_KTOKS
    + _CCNET_KN2_SCORED
    + _CCNET_BAND_SUFFIX
)

# The approx-banding arm grades its sketch-independent projection:
# same dedup + KN scoring arithmetic as PIPELINE_CCNET_ORACLE, band
# column excluded (the percentile_approx sketch only moves the two
# cut points — row set and perplexities are exact by construction).
PIPELINE_CCNET_APPROX_ORACLE = (
    "WITH "
    + _CCNET_DOC_DEDUP_PREFIX
    + _CCNET_KTOKS
    + _CCNET_KN2_SCORED
    + """final AS (
  SELECT z.doc_id, k.source, z.perplexity
  FROM scored z JOIN kept k USING (doc_id)
)
SELECT * FROM final ORDER BY doc_id
"""
)


def q_lm_store_kn3_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NgramCountStore roundtrip (r11): two disjoint batches folded on
    disk as (k, ctx, w, c) counts for every order 1..3, compacted,
    then scored with the store's order-3 interpolated-KN model —
    every adjusted table, context stat and discount derives from the
    folded counts, so the result equals one-shot self-trained
    kn_ngram_lm_perplexity; same oracle with the full-corpus train
    predicate."""
    import tempfile

    from balboa_spark.operators import lm

    docs = _docs(spark, sf_dir)
    store = lm.NgramCountStore(
        spark, tempfile.mkdtemp(prefix="balboa_kn3store_entry_"), n=3
    )
    for e in range(2):
        store.process_batch(docs.where(F.col("doc_id") % 2 == e), epoch_id=e)
    store.compact()
    return store.kn_perplexity(docs).orderBy("doc_id")


BAND_LO, BAND_HI = 0.1, 0.8


def q_lm_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet band keep over the self-trained bigram perplexities —
    the declarative exact-percentile variant (perplexity_band_keep)
    whose thresholds an oracle can replay (quantile_cont rounded to
    6 decimals, the quality_bins convention)."""
    from balboa_spark.operators import lm

    scored = lm.bigram_lm_perplexity(_docs(spark, sf_dir))
    return (
        lm.perplexity_band_keep(scored, BAND_LO, BAND_HI)
        .select("doc_id", "n_bigrams")
        .orderBy("doc_id")
    )


LM_BAND_ORACLE = f"""
WITH scored AS ({LM_PERPLEXITY_ORACLE.replace("ORDER BY doc_id", "")}),
b AS (
  SELECT round(quantile_cont(perplexity, {BAND_LO}), 6) AS lo,
         round(quantile_cont(perplexity, {BAND_HI}), 6) AS hi
  FROM scored
)
SELECT doc_id, n_bigrams FROM scored, b
WHERE perplexity BETWEEN lo AND hi
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# leakage-safe split (group-aware: exact-dup groups never straddle)
# ---------------------------------------------------------------------------

def q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    g = docs.select("doc_id", F.md5("text").alias("grp"))
    multi = g.groupBy("grp").count().where("count > 1").select("grp")
    mapping = g.join(multi, "grp").select("doc_id", "grp")
    return (
        corpus.leakage_safe_split(docs, groups=mapping)
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


# Exercises BOTH arms of leakage_safe_split: docs whose exact content
# hash is shared get the group key (same side guaranteed), singletons
# fall back to their own id (== plain hash_split).
LEAKAGE_SPLIT_ORACLE = f"""
WITH g AS (SELECT doc_id, md5(text) AS grp FROM documents),
multi AS (SELECT grp FROM g GROUP BY grp HAVING count(*) > 1),
m AS (SELECT g.doc_id, g.grp FROM g JOIN multi USING (grp)),
k AS (
  SELECT d.doc_id,
         coalesce(m.grp, d.doc_id::VARCHAR) AS key
  FROM documents d LEFT JOIN m USING (doc_id)
)
SELECT doc_id,
       CASE WHEN hb < '{TRAIN_HEX}' THEN 'train'
            WHEN hb < '{VAL_HEX}' THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, substring(md5(key || ':{SPLIT_SALT}'), 1, 2) AS hb FROM k)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# r12: order-n KN oracle GENERATOR (graded at n=5, the depth CCNet's
# KenLM filter actually runs), order-5 + paragraph ccnet chains, and
# the char-n-gram NB language-ID stage
# ---------------------------------------------------------------------------

def _kn_ctes(n: int, train_cte: str, score_cte: str) -> str:
    """Generate the CTE chain replaying operators.lm's order-n
    interpolated-KN recursion in DuckDB SQL, for ANY n >= 2 —
    the hand-written ``_kn3_oracle`` is its fixed point at n=3 (a
    test pins row-for-row equality on real data). Consumes two CTEs
    holding (doc_id, tk) token lists: ``train_cte`` for counts,
    ``score_cte`` for the scoring stream; ends with ``j (doc_id,
    lp)`` — the caller appends the per-doc aggregate.

    Table layout mirrors lm._kn_ngram_score_from_counts: raw k-gram
    counts rg2..rg{n}; adjusted continuation tables a1..a{n-1}
    (order-(k+1) TYPE table grouped by its last-k suffix); per-order
    context stats st2..st{n}; one Ney discount per order k >= 2 from
    that order's count-of-counts; the alpha-smoothed continuation
    unigram base."""
    parts: list[str] = []
    for k in range(2, n + 1):
        m = k - 2  # ctx spans k-1 tokens: slice(i, i+m); w = tk[i+k-1]
        parts.append(
            f"rg{k} AS (\n"
            f"  SELECT ctx, w, count(*) AS c FROM (\n"
            f"    SELECT unnest(list_transform(range(1, len(tk) - {m}),\n"
            f"             i -> array_to_string(list_slice(tk, i, i + {m}),"
            f" ' '))) AS ctx,\n"
            f"           unnest(list_transform(range(1, len(tk) - {m}),"
            f" i -> tk[i + {k - 1}])) AS w\n"
            f"    FROM {train_cte} WHERE len(tk) >= {k}) GROUP BY 1, 2\n"
            f")"
        )
    parts.append("a1 AS (SELECT w, count(*) AS a FROM rg2 GROUP BY 1)")
    for k in range(2, n):
        parts.append(
            f"a{k} AS (\n"
            f"  SELECT substring(ctx, strpos(ctx, ' ') + 1) AS ctx, w,\n"
            f"         count(*) AS a\n"
            f"  FROM rg{k + 1} GROUP BY 1, 2\n"
            f")"
        )

    def tbl(k: int) -> tuple[str, str]:
        return (f"rg{n}", "c") if k == n else (f"a{k}", "a")

    for k in range(2, n + 1):
        t, c = tbl(k)
        parts.append(
            f"st{k} AS (SELECT ctx, sum({c}) AS tot, count(*) AS nfw"
            f" FROM {t} GROUP BY 1)"
        )
    dsel = []
    for k in range(2, n + 1):
        t, c = tbl(k)
        one = f"sum(CASE WHEN {c} = 1 THEN 1 ELSE 0 END)"
        two = f"sum(CASE WHEN {c} = 2 THEN 1 ELSE 0 END)"
        dsel.append(
            f"         (SELECT CASE WHEN {one} + 2 * {two} > 0\n"
            f"                 THEN {one} / ({one} + 2 * {two})\n"
            f"                 ELSE 0.5 END FROM {t}) AS d{k}"
        )
    parts.append(
        "sc AS (\n"
        "  SELECT (SELECT count(*) FROM rg2) AS a1_total,\n"
        "         (SELECT count(DISTINCT t)"
        f" FROM (SELECT unnest(tk) AS t FROM {train_cte})) AS vocab,\n"
        + ",\n".join(dsel)
        + "\n)"
    )
    m = n - 2
    sfx = []
    for k in range(n, 1, -1):
        # ctx{k} = last k-1 tokens before w: slice(i + n-k, i + n-2)
        sfx.append(
            f"         unnest(list_transform(range(1, len(tk) - {m}),\n"
            f"           i -> array_to_string(list_slice(tk, i + {n - k},"
            f" i + {m}), ' '))) AS ctx{k}"
        )
    parts.append(
        "sg AS (\n"
        "  SELECT doc_id,\n"
        + ",\n".join(sfx)
        + ",\n"
        f"         unnest(list_transform(range(1, len(tk) - {m}),"
        f" i -> tk[i + {n - 1}])) AS w\n"
        f"  FROM {score_cte} WHERE len(tk) >= {n}\n"
        ")"
    )
    expr = "(coalesce(a1.a, 0) + 1.0) / (sc.a1_total + 1.0 * sc.vocab)"
    for k in range(2, n + 1):
        t, c = tbl(k)
        expr = (
            f"CASE WHEN st{k}.tot IS NOT NULL THEN\n"
            f"              greatest(coalesce({t}.{c}, 0) - sc.d{k}, 0.0)"
            f" / st{k}.tot\n"
            f"              + sc.d{k} * st{k}.nfw / st{k}.tot * ({expr})\n"
            f"            ELSE {expr} END"
        )
    joins = [
        f"  LEFT JOIN rg{n} ON rg{n}.ctx = sg.ctx{n} AND rg{n}.w = sg.w",
        f"  LEFT JOIN st{n} ON st{n}.ctx = sg.ctx{n}",
    ]
    for k in range(n - 1, 1, -1):
        joins.append(
            f"  LEFT JOIN a{k} ON a{k}.ctx = sg.ctx{k} AND a{k}.w = sg.w"
        )
        joins.append(f"  LEFT JOIN st{k} ON st{k}.ctx = sg.ctx{k}")
    joins.append("  LEFT JOIN a1 ON a1.w = sg.w")
    joins.append("  CROSS JOIN sc")
    parts.append(
        "j AS (\n"
        f"  SELECT sg.doc_id, ln({expr}) AS lp\n"
        "  FROM sg\n" + "\n".join(joins) + "\n)"
    )
    return ",\n".join(parts)


def _knN_oracle(n: int, train_pred: str) -> str:
    return f"""
WITH {_TOKS_SQL},
ttoks AS (SELECT * FROM toks WHERE {train_pred}),
{_kn_ctes(n, "ttoks", "toks")}
SELECT doc_id, count(*) AS n_grams,
       sum(lp) / count(*) AS avg_logprob,
       exp(-(sum(lp) / count(*))) AS perplexity
FROM j GROUP BY doc_id ORDER BY doc_id
"""


def q_lm_kn5_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-5 interpolated KN — the depth CCNet's KenLM reference
    filter runs (Wenzek et al. 2020): the full 4-deep recursion of
    adjusted continuation tables, graded against the generated
    DuckDB replay."""
    from balboa_spark.operators import lm

    docs = _docs(spark, sf_dir)
    return lm.kn_ngram_lm_perplexity(
        docs, n=5, train=docs.where(F.col("doc_id") % 2 == 0)
    ).orderBy("doc_id")


LM_KN5_PERPLEXITY_ORACLE = _knN_oracle(5, "doc_id % 2 = 0")


def q_pipeline_ccnet5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet chain at its reference order: hash dedup -> order-5
    interpolated-KN LM on the kept src0 slice -> banding. Same
    planted-duplicate construction as pipeline_ccnet."""
    from balboa_spark.operators import lm

    docs = load_tables(spark, sf_dir, names=("documents",))[
        "documents"
    ].select("doc_id", "source", "text")
    planted = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 10000).alias("doc_id"), "source", "text"
        )
    )
    return lm.ccnet_pipeline(planted, order=5).orderBy("doc_id")


PIPELINE_CCNET5_ORACLE = (
    "WITH "
    + _CCNET_DOC_DEDUP_PREFIX
    + _CCNET_KTOKS
    + _kn_ctes(5, "ttoks", "ktoks")
    + """,
scored AS (
  SELECT doc_id, exp(-(sum(lp) / count(*))) AS perplexity
  FROM j GROUP BY doc_id
),
"""
    + _CCNET_BAND_SUFFIX
)


def q_pipeline_ccnet_par(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet dedup at the paper's actual granularity (paragraph =
    line): every document gets a COMMON boilerplate first line
    planted plus a full +10000 duplicate block, so the paragraph
    keep-first is observable three ways — the boilerplate line
    survives only in the min doc, duplicate docs' paragraphs all
    drop, originals keep their body text."""
    from balboa_spark.operators import lm

    docs = load_tables(spark, sf_dir, names=("documents",))[
        "documents"
    ].select("doc_id", "source", "text")
    with_boiler = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.lit(CCNET_PAR_BOILER), F.lit("\n"), F.col("text")
        ).alias("text"),
    )
    planted = with_boiler.unionByName(
        with_boiler.select(
            (F.col("doc_id") + 10000).alias("doc_id"), "source", "text"
        )
    )
    return lm.ccnet_pipeline(planted, granularity="paragraph").orderBy(
        "doc_id"
    )


CCNET_PAR_BOILER = "subscribe to our newsletter for updates"

# Paragraph dedup replay: split on newline, hash each normalized
# line, keep the global first (doc_id, idx) per hash, drop blank
# lines, reassemble in order; docs keeping nothing vanish. Then the
# shared KN-bigram + banding blocks over the rebuilt text.
_CCNET_PAR_DEDUP_PREFIX = f"""raw AS (
  SELECT doc_id, source,
         '{CCNET_PAR_BOILER}' || chr(10) || text AS text
  FROM documents
  UNION ALL
  SELECT doc_id + 10000, source,
         '{CCNET_PAR_BOILER}' || chr(10) || text
  FROM documents
),
""" + r"""paras AS (
  SELECT doc_id, source,
         unnest(range(1, len(parts) + 1)) AS idx,
         unnest(parts) AS para
  FROM (SELECT doc_id, source, string_split(text, chr(10)) AS parts
        FROM raw)
),
hp AS (
  SELECT doc_id, source, idx, para,
         array_to_string(list_filter(
           string_split_regex(lower(para), '\s+'), t -> t <> ''), ' ')
           AS norm
  FROM paras
),
hpk AS (SELECT *, md5(norm) AS fp FROM hp WHERE norm <> ''),
keepp AS (
  SELECT doc_id, idx FROM (
    SELECT doc_id, idx,
           row_number() OVER (PARTITION BY fp ORDER BY doc_id, idx) AS rn
    FROM hpk
  ) WHERE rn = 1
),
kept AS (
  SELECT h.doc_id, h.source,
         string_agg(h.para, chr(10) ORDER BY h.idx) AS text
  FROM hpk h JOIN keepp USING (doc_id, idx)
  GROUP BY 1, 2
),
"""

PIPELINE_CCNET_PAR_ORACLE = (
    "WITH "
    + _CCNET_PAR_DEDUP_PREFIX
    + _CCNET_KTOKS
    + _CCNET_KN2_SCORED
    + _CCNET_BAND_SUFFIX
)


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-n-gram NB language ID (operators/lid.py — the CCNet
    chain's LID stage): trained on the even-id half with ``source``
    standing in as the language label, classifying every document.
    Training AND scoring replayed in SQL — counts, shared-vocabulary
    add-alpha smoothing, log priors, rounded-score argmax with the
    language tie-break."""
    from balboa_spark.operators import lid

    docs = _docs(spark, sf_dir)
    model = lid.train_char_ngram_lid(
        docs.where(F.col("doc_id") % 2 == 0), label_col="source", n=3
    )
    return lid.classify_lang(docs, model).orderBy("doc_id")


LANG_ID_ORACLE = r"""
WITH tr AS (
  SELECT source AS lang, lower(text) AS s
  FROM documents WHERE doc_id % 2 = 0
),
tg AS (
  SELECT lang,
         unnest(list_transform(range(1, length(s) - 1),
                i -> substring(s, i, 3))) AS gram
  FROM tr
),
cnt AS (SELECT lang, gram, count(*) AS c FROM tg GROUP BY 1, 2),
vv AS (SELECT count(DISTINCT gram) AS vocab FROM cnt),
lt AS (SELECT lang, sum(c) AS tot FROM cnt GROUP BY 1),
nd AS (
  SELECT source AS lang, count(*) AS n_docs
  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
),
td AS (SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 0),
langs AS (
  SELECT lt.lang, lt.tot,
         ln(nd.n_docs / CAST(td.n AS DOUBLE)) AS logprior
  FROM lt JOIN nd USING (lang) CROSS JOIN td
),
sg AS (
  SELECT doc_id, gram, count(*) AS occ FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, length(s) - 1),
                  i -> substring(s, i, 3))) AS gram
    FROM (SELECT doc_id, lower(text) AS s FROM documents)
  ) GROUP BY 1, 2
),
per AS (
  -- count-weighted over distinct grams (engine parity, r12: sum over
  -- occurrences == occ * per-type logprob)
  SELECT sg.doc_id, l.lang,
         round(max(l.logprior)
               + sum(sg.occ * ln((coalesce(c.c, 0) + 1.0)
                        / (l.tot + 1.0 * v.vocab))), 6) AS score
  FROM sg
  CROSS JOIN langs l
  LEFT JOIN cnt c ON c.lang = l.lang AND c.gram = sg.gram
  CROSS JOIN vv v
  GROUP BY 1, 2
),
r AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rn
  FROM per
)
SELECT doc_id, lang, score FROM r WHERE rn = 1 ORDER BY doc_id
"""


def q_lm_kn_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group interpolated-KN LMs in one relational plan (r12 —
    CCNet's per-language models, with ``source`` as the group label):
    one bigram KN per source trained on the ``doc_id % 3 = 0`` slice
    (3 is coprime with the 20-source id cycle, so every source
    trains), scored over all documents. Grades the fully-relational
    statistics path — per-group vocab, unigram mass and Ney discount
    as joined relations instead of collected scalars."""
    from balboa_spark.operators import lm

    docs = _docs(spark, sf_dir)
    return lm.kn_ngram_lm_perplexity_by_group(
        docs,
        n=2,
        group_col="source",
        train=docs.where(F.col("doc_id") % 3 == 0),
    ).orderBy("doc_id")


# Twin of kn_ngram_lm_perplexity_by_group at n=2: _kn_bigram_oracle
# with `source` added to every key — counts, context stats,
# continuation counts, count-of-counts discount, vocabulary and
# unigram mass all per-source; docs join their OWN source's relations.
LM_KN_BY_SOURCE_ORACLE = r"""
WITH gtoks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\s+'),
                     t -> t <> '') AS tk
  FROM documents
),
ttoks AS (SELECT * FROM gtoks WHERE doc_id % 3 = 0),
tbg AS (
  SELECT source,
         unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
         unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
  FROM ttoks WHERE len(tk) >= 2
),
c12 AS (SELECT source, w1, w2, count(*) AS c12 FROM tbg GROUP BY 1, 2, 3),
ctx AS (SELECT source, w1, sum(c12) AS c1, count(*) AS n1p_fw
        FROM c12 GROUP BY 1, 2),
cont AS (SELECT source, w2, count(*) AS n1p_bw FROM c12 GROUP BY 1, 2),
s AS (
  SELECT source, count(*) AS types,
         sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS n2
  FROM c12 GROUP BY 1
),
v AS (
  SELECT source, count(DISTINCT t) AS vocab
  FROM (SELECT source, unnest(tk) AS t FROM ttoks) GROUP BY 1
),
d AS (
  SELECT source,
         CASE WHEN n1 + 2 * n2 > 0 THEN n1 / (n1 + 2 * n2) ELSE 0.5 END
           AS disc
  FROM s
),
bg AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
         unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
  FROM gtoks WHERE len(tk) >= 2
),
j AS (
  -- s/d LEFT-joined with fallbacks: a source with train tokens but
  -- no train bigram still scores through the unigram floor with the
  -- 0.5 default discount (engine parity, r12 review); v stays an
  -- inner join — a source with NO train tokens is absent
  SELECT bg.doc_id, bg.source,
         ln(CASE WHEN ctx.c1 IS NOT NULL THEN
              greatest(coalesce(c12.c12, 0) - coalesce(d.disc, 0.5), 0.0)
                / ctx.c1
              + coalesce(d.disc, 0.5) * ctx.n1p_fw / ctx.c1
                * ((coalesce(cont.n1p_bw, 0) + 1.0)
                   / (coalesce(s.types, 0) + 1.0 * v.vocab))
            ELSE (coalesce(cont.n1p_bw, 0) + 1.0)
                 / (coalesce(s.types, 0) + 1.0 * v.vocab)
            END) AS lp
  FROM bg
  LEFT JOIN c12 USING (source, w1, w2)
  LEFT JOIN ctx USING (source, w1)
  LEFT JOIN cont USING (source, w2)
  LEFT JOIN s USING (source)
  JOIN v USING (source)
  LEFT JOIN d USING (source)
)
SELECT doc_id, source, count(*) AS n_grams,
       sum(lp) / count(*) AS avg_logprob,
       exp(-(sum(lp) / count(*))) AS perplexity
FROM j GROUP BY doc_id, source ORDER BY doc_id
"""


def q_pipeline_ccnet_lid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE CCNet fig.1 chain, driver-graded end to end (r12):
    hash dedup over the dup-planted corpus -> char-trigram NB LID
    (trained on the even-id half, source as language label) -> ONE
    interpolated-KN bigram LM PER detected language trained on that
    language's src0 slice -> per-language head/middle/tail banding.
    Every stage's arithmetic is replayed by the oracle: the dedup
    keep rule, the NB training + rounded-argmax classification, the
    per-group KN statistics (vocab/mass/discount as per-language
    relations), and the per-language rounded exact quantiles."""
    from balboa_spark.operators import lm

    docs = load_tables(spark, sf_dir, names=("documents",))[
        "documents"
    ].select("doc_id", "source", "text")
    planted = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 10000).alias("doc_id"), "source", "text"
        )
    )
    lid_train = docs.where(F.col("doc_id") % 2 == 0).select(
        F.col("source").alias("lang"), "text"
    )
    return lm.ccnet_pipeline(
        planted, lid_train=lid_train, per_language_lm=True
    ).orderBy("doc_id")


# LID replay over the KEPT docs: the LANG_ID_ORACLE training CTEs
# verbatim (model trained on raw even-id documents), classification
# stream switched to `kept`.
_CCNET_LID_CLASSIFY = r"""ltr AS (
  SELECT source AS lang, lower(text) AS s
  FROM documents WHERE doc_id % 2 = 0
),
ltg AS (
  SELECT lang,
         unnest(list_transform(range(1, length(s) - 1),
                i -> substring(s, i, 3))) AS gram
  FROM ltr
),
lcnt AS (SELECT lang, gram, count(*) AS c FROM ltg GROUP BY 1, 2),
lvv AS (SELECT count(DISTINCT gram) AS vocab FROM lcnt),
llt AS (SELECT lang, sum(c) AS tot FROM lcnt GROUP BY 1),
lnd AS (
  SELECT source AS lang, count(*) AS n_docs
  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
),
ltd AS (SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 0),
llangs AS (
  SELECT llt.lang, llt.tot,
         ln(lnd.n_docs / CAST(ltd.n AS DOUBLE)) AS logprior
  FROM llt JOIN lnd USING (lang) CROSS JOIN ltd
),
lsg AS (
  SELECT doc_id, gram, count(*) AS occ FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, length(s) - 1),
                  i -> substring(s, i, 3))) AS gram
    FROM (SELECT doc_id, lower(text) AS s FROM kept)
  ) GROUP BY 1, 2
),
lper AS (
  SELECT lsg.doc_id, l.lang,
         round(max(l.logprior)
               + sum(lsg.occ * ln((coalesce(c.c, 0) + 1.0)
                        / (l.tot + 1.0 * v.vocab))), 6) AS score
  FROM lsg
  CROSS JOIN llangs l
  LEFT JOIN lcnt c ON c.lang = l.lang AND c.gram = lsg.gram
  CROSS JOIN lvv v
  GROUP BY 1, 2
),
klang AS (
  SELECT doc_id, lang FROM (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, lang) AS rn
    FROM lper
  ) WHERE rn = 1
),
"""

# Per-language bigram KN over the kept+classified docs (the
# LM_KN_BY_SOURCE_ORACLE shape keyed by predicted lang; train = each
# language's src0 slice) + per-language banding.
_CCNET_GROUPED_KN_BAND = r"""ktoksl AS (
  SELECT k.doc_id, k.source, g.lang,
         list_filter(string_split_regex(lower(k.text), '\s+'),
                     t -> t <> '') AS tk
  FROM kept k JOIN klang g USING (doc_id)
),
ttoksl AS (SELECT * FROM ktoksl WHERE source = 'src0'),
gtbg AS (
  SELECT lang,
         unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
         unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
  FROM ttoksl WHERE len(tk) >= 2
),
gc12 AS (SELECT lang, w1, w2, count(*) AS c12 FROM gtbg GROUP BY 1, 2, 3),
gctx AS (SELECT lang, w1, sum(c12) AS c1, count(*) AS n1p_fw
         FROM gc12 GROUP BY 1, 2),
gcont AS (SELECT lang, w2, count(*) AS n1p_bw FROM gc12 GROUP BY 1, 2),
gs AS (
  SELECT lang, count(*) AS types,
         sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS n2
  FROM gc12 GROUP BY 1
),
gv AS (
  SELECT lang, count(DISTINCT t) AS vocab
  FROM (SELECT lang, unnest(tk) AS t FROM ttoksl) GROUP BY 1
),
gd AS (
  SELECT lang,
         CASE WHEN n1 + 2 * n2 > 0 THEN n1 / (n1 + 2 * n2) ELSE 0.5 END
           AS disc
  FROM gs
),
gbg AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
         unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
  FROM ktoksl WHERE len(tk) >= 2
),
gj AS (
  -- gs/gd LEFT-joined with fallbacks, mirroring LM_KN_BY_SOURCE's
  -- r12 parity fix: a detected language whose train slice has tokens
  -- but no bigram still scores through the unigram floor with the
  -- 0.5 default discount (the engine's grouped-KN contract); gv
  -- stays the inner group anchor — a language with NO train tokens
  -- is absent from the output
  SELECT gbg.doc_id, gbg.lang,
         ln(CASE WHEN gctx.c1 IS NOT NULL THEN
              greatest(coalesce(gc12.c12, 0) - coalesce(gd.disc, 0.5), 0.0)
                / gctx.c1
              + coalesce(gd.disc, 0.5) * gctx.n1p_fw / gctx.c1
                * ((coalesce(gcont.n1p_bw, 0) + 1.0)
                   / (coalesce(gs.types, 0) + 1.0 * gv.vocab))
            ELSE (coalesce(gcont.n1p_bw, 0) + 1.0)
                 / (coalesce(gs.types, 0) + 1.0 * gv.vocab)
            END) AS lp
  FROM gbg
  LEFT JOIN gc12 USING (lang, w1, w2)
  LEFT JOIN gctx USING (lang, w1)
  LEFT JOIN gcont USING (lang, w2)
  LEFT JOIN gs USING (lang)
  JOIN gv USING (lang)
  LEFT JOIN gd USING (lang)
),
gscored AS (
  SELECT doc_id, lang, exp(-(sum(lp) / count(*))) AS perplexity
  FROM gj GROUP BY doc_id, lang
),
gb AS (
  SELECT lang,
         round(quantile_cont(perplexity, 0.1), 6) AS lo,
         round(quantile_cont(perplexity, 0.8), 6) AS hi
  FROM gscored GROUP BY lang
)
SELECT z.doc_id, k.source, z.lang, z.perplexity,
       CASE WHEN z.perplexity < gb.lo THEN 'head'
            WHEN z.perplexity <= gb.hi THEN 'middle'
            ELSE 'tail' END AS band
FROM gscored z
JOIN kept k USING (doc_id)
JOIN gb USING (lang)
ORDER BY z.doc_id
"""

PIPELINE_CCNET_LID_ORACLE = (
    "WITH "
    + _CCNET_DOC_DEDUP_PREFIX
    + _CCNET_LID_CLASSIFY
    + _CCNET_GROUPED_KN_BAND
)


# ---------------------------------------------------------------------------
# WET -> CCNet (r13): the real crawl entry pipeline, graded end to end
# ---------------------------------------------------------------------------

def q_pipeline_wet_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production crawl ENTRY pipeline, driver-graded end to end:
    WET archive -> main-content extraction -> CCNet (dedup -> LID ->
    per-language KN -> banding) -> attribute store -> mixer.

    The WET stage is REAL: each document is wrapped in the
    chrome-heavy synth page, serialized into 4 gzipped WARC/WET
    shards via wet_bytes (fixture construction — a corpus-sized
    collect is test plumbing; production reads existing archives with
    the same read_wet), read back through sources/wet.py's
    binaryFile + mapInPandas parser, and re-keyed from the WARC
    headers. Any parser defect (lost/duplicated records, mangled
    payload bytes, header mixups) changes the hash — this is the
    first driver grading of the WET parser.

    Downstream, every stage's arithmetic is replayed by the oracle:
    block-gated main content, the tokens-join dedup keep rule, NB LID
    train+classify, per-language KN stats, per-language banding, and
    the mixer's band <> 'tail' keep rule over a real on-disk
    AttributeStore (text touched only by the final id-keyed join)."""
    import os as _os
    import tempfile as _tempfile

    from balboa_spark.operators import lm
    from balboa_spark.operators.attributes import AttributeStore
    from balboa_spark.operators.text import extract_main_content
    from balboa_spark.sources.wet import read_wet, write_wet_shards

    docs = load_tables(spark, sf_dir, names=("documents",))[
        "documents"
    ].select("doc_id", "source", "text")
    pages = docs.select("doc_id", "source", _synth_chrome_col().alias("html"))
    tmp = _tempfile.mkdtemp(prefix="wet_ccnet_")
    # archive construction is DISTRIBUTED (write_wet_shards: executors
    # serialize + write their shard, the driver sees only the 4-row
    # manifest) — the previous corpus-sized collect + driver-side
    # wet_bytes was this entry's sf1.0 bottleneck and exactly the
    # anti-pattern the export sink exists to kill
    arch = _os.path.join(tmp, "archive")
    write_wet_shards(
        pages.select(
            F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("record_id"),
            F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com/"),
                F.col("doc_id"),
            ).alias("target_uri"),
            F.col("html").alias("text"),
            # 32-way sharding = 32 parallel serializer tasks; the
            # oracle replays from `documents` directly, so the shard
            # layout is free to follow the executor count
            F.pmod(F.col("doc_id"), F.lit(32)).alias("_shard"),
        ),
        arch,
        shard_col="_shard",
    ).collect()
    wet = read_wet(spark, arch)
    mc = wet.select(
        F.regexp_extract("record_id", r"urn:doc:(\d+)", 1)
        .cast("long")
        .alias("doc_id"),
        F.regexp_extract("target_uri", r"https://([a-z0-9]+)\.example", 1)
        .alias("source"),
        extract_main_content(
            F.col("text"), min_block_chars=_MC_MIN_CHARS
        ).alias("text"),
    )
    # mc feeds BOTH the ccnet chain and the mixer's docs side —
    # materialize once or the WET parse + block-gate regex chain runs
    # twice (the pipeline_crawl inlined-extraction lesson)
    mc = mc.localCheckpoint(eager=True)
    lid_train = docs.where(F.col("doc_id") % 2 == 0).select(
        F.col("source").alias("lang"), "text"
    )
    banded = lm.ccnet_pipeline(mc, lid_train=lid_train, per_language_lm=True)
    store = AttributeStore(spark, _os.path.join(tmp, "attrs"))
    store.write(
        banded.select("doc_id", "lang", "perplexity", "band"), tagger="ccnet"
    )
    mixed = store.mix(mc, ["ccnet"], "ccnet__band <> 'tail'", keep_attrs=True)
    return mixed.select(
        "doc_id",
        "source",
        F.col("ccnet__lang").alias("lang"),
        F.col("ccnet__perplexity").alias("perplexity"),
        F.col("ccnet__band").alias("band"),
    ).orderBy("doc_id")


def _wet_ccnet_prefix() -> str:
    """The WET-pipeline twin of _CCNET_DOC_DEDUP_PREFIX: ``raw`` is
    the main content of the chrome synth page (the WET round-trip is
    byte-faithful by the wet.py parser contract, so DuckDB replays
    the archive stage as the page expression itself), then the same
    tokens-join keep-first dedup."""
    from balboa_spark.operators.text import extract_main_content_sql

    mc = extract_main_content_sql(
        _SYNTH_CHROME_SQL, min_block_chars=_MC_MIN_CHARS
    )
    return rf"""raw AS (
  -- coalesce models the WET round trip: a NULL page serializes as an
  -- EMPTY payload (wet_bytes contract), so the engine reads back ''
  -- where the direct page expression is NULL
  SELECT doc_id, source, coalesce({mc}, '') AS text FROM documents
),
rt AS (
  SELECT doc_id, source, text,
         md5(array_to_string(list_filter(
           string_split_regex(lower(text), '\s+'), t -> t <> ''), ' ')) AS fp
  FROM raw
),
kept AS (
  SELECT doc_id, source, text FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM rt
  ) WHERE rn = 1
),
"""


#: the grouped-KN band suffix with the MIXER's keep rule applied:
#: band <> 'tail'  <=>  perplexity <= the (rounded) 0.8 quantile.
PIPELINE_WET_CCNET_ORACLE = (
    "WITH "
    + _wet_ccnet_prefix()
    + _CCNET_LID_CLASSIFY
    + _CCNET_GROUPED_KN_BAND.replace(
        "ORDER BY z.doc_id", "WHERE z.perplexity <= gb.hi ORDER BY z.doc_id"
    )
)


# ---------------------------------------------------------------------------
# attribute store + mixer (r12): Dolma-style tagger/mixer split
# ---------------------------------------------------------------------------

#: the shared built-in pii-tagger pattern (operators.attributes) —
#: the DuckDB oracle below keeps an intentionally independent literal
from balboa_spark.operators.attributes import EMAIL_RE as _ATTR_EMAIL_RE  # noqa: E402


def _attr_store_fixture(spark: SparkSession, sf_dir: str):
    """Build a real on-disk AttributeStore over the documents table:
    tagger ``quality`` written as TWO versions (v1 over full text,
    v2 re-tagging every doc_id % 7 == 0 over the first 200 chars —
    latest-wins must pick v2 for those), tagger ``pii`` once. The
    mixer entries below exercise versioned resolution + rule logic
    end-to-end against a DuckDB replay of the same arithmetic."""
    import tempfile

    from balboa_spark.operators.attributes import AttributeStore
    from balboa_spark.operators.text import tokens

    docs = load_tables(spark, sf_dir, names=("documents",))[
        "documents"
    ].select("doc_id", "source", "text")
    store = AttributeStore(
        spark, tempfile.mkdtemp(prefix="balboa_attr_entry_")
    )
    store.write(
        docs.select(
            "doc_id",
            F.size(tokens(F.col("text"))).alias("n_tokens"),
            F.length("text").alias("n_chars"),
        ),
        "quality",
    )
    store.write(
        docs.where(F.col("doc_id") % 7 == 0).select(
            "doc_id",
            F.size(tokens(F.substring("text", 1, 200))).alias("n_tokens"),
            F.least(F.length("text"), F.lit(200)).alias("n_chars"),
        ),
        "quality",
    )
    store.write(
        docs.select(
            "doc_id", F.col("text").rlike(_ATTR_EMAIL_RE).alias("has_email")
        ),
        "pii",
    )
    return docs, store


def q_attr_store_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AttributeStore roundtrip + mix: documents kept by a rule over
    the latest-wins ``quality`` attributes and the ``pii`` tagger.
    Text flows only through the final id-keyed semi-join (the Dolma
    mixer contract, operators/attributes.py module docstring)."""
    docs, store = _attr_store_fixture(spark, sf_dir)
    kept = store.mix(
        docs,
        ["quality", "pii"],
        "quality__n_tokens BETWEEN 25 AND 80 AND NOT pii__has_email",
        keep_attrs=True,
    )
    return (
        kept.select(
            "doc_id", "source", F.col("quality__n_tokens").alias("n_tokens")
        ).orderBy("doc_id")
    )


#: the two-version quality relation + pii relation, shared by both
#: attribute oracles. v2 (truncated retag) wins for doc_id % 7 == 0.
_ATTR_STORE_SQL = rf"""
qv1 AS (
  SELECT doc_id,
         length(list_filter(string_split_regex(lower(text), '\s+'),
                            t -> t <> '')) AS n_tokens
  FROM documents WHERE doc_id % 7 <> 0
),
qv2 AS (
  SELECT doc_id,
         length(list_filter(
           string_split_regex(lower(substring(text, 1, 200)), '\s+'),
           t -> t <> '')) AS n_tokens
  FROM documents WHERE doc_id % 7 = 0
),
q AS (SELECT * FROM qv1 UNION ALL SELECT * FROM qv2),
p AS (
  SELECT doc_id,
         regexp_matches(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}') AS has_email
  FROM documents
)
"""


ATTR_STORE_MIX_ORACLE = (
    "WITH " + _ATTR_STORE_SQL + r"""
SELECT d.doc_id, d.source, q.n_tokens
FROM documents d
JOIN q USING (doc_id)
JOIN p USING (doc_id)
WHERE q.n_tokens BETWEEN 25 AND 80 AND NOT p.has_email
ORDER BY d.doc_id
"""
)


def q_attr_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixer attrition report over a PARTIALLY tagged corpus (quality
    rows only for doc_id % 3 <> 0): per-rule pass/fail counts where an
    untagged document's NULL fails every rule — the Dolma default —
    plus the ``__all__`` conjunction row."""
    import tempfile

    from balboa_spark.operators.attributes import AttributeStore
    from balboa_spark.operators.text import tokens

    docs = load_tables(spark, sf_dir, names=("documents",))[
        "documents"
    ].select("doc_id", "source", "text")
    store = AttributeStore(
        spark, tempfile.mkdtemp(prefix="balboa_attr_rep_entry_")
    )
    store.write(
        docs.where(F.col("doc_id") % 3 != 0).select(
            "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
        ),
        "quality",
    )
    store.write(
        docs.select(
            "doc_id", F.col("text").rlike(_ATTR_EMAIL_RE).alias("has_email")
        ),
        "pii",
    )
    return store.mix_report(
        docs,
        ["quality", "pii"],
        {
            "len_ok": "quality__n_tokens >= 40",
            "no_email": "NOT pii__has_email",
        },
    )


ATTR_MIX_REPORT_ORACLE = r"""
WITH q AS (
  SELECT doc_id,
         length(list_filter(string_split_regex(lower(text), '\s+'),
                            t -> t <> '')) AS n_tokens
  FROM documents WHERE doc_id % 3 <> 0
),
p AS (
  SELECT doc_id,
         regexp_matches(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') AS has_email
  FROM documents
),
j AS (
  SELECT d.doc_id, q.n_tokens, p.has_email
  FROM documents d
  LEFT JOIN q USING (doc_id)
  LEFT JOIN p USING (doc_id)
),
c AS (
  SELECT
    SUM(CASE WHEN n_tokens >= 40 THEN 1 ELSE 0 END) AS p_len,
    SUM(CASE WHEN NOT has_email THEN 1 ELSE 0 END) AS p_email,
    SUM(CASE WHEN n_tokens >= 40 AND NOT has_email THEN 1 ELSE 0 END)
      AS p_all,
    COUNT(*) AS n
  FROM j
)
SELECT rule, CAST(n_pass AS BIGINT) AS n_pass,
       CAST(n - n_pass AS BIGINT) AS n_fail
FROM (
  SELECT '__all__' AS rule, p_all AS n_pass, n FROM c
  UNION ALL SELECT 'len_ok', p_len, n FROM c
  UNION ALL SELECT 'no_email', p_email, n FROM c
)
ORDER BY rule
"""


QUERIES_CORPUS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "corpus_quality_signals": q_quality_signals,
    "corpus_hash_split": q_hash_split,
    "corpus_vocab_topk": q_vocab_topk,
    "corpus_contamination": q_contamination,
    "corpus_pii_redact": q_pii_redact,
    "corpus_hash_sample": q_hash_sample,
    "corpus_trigram_familiarity": q_trigram_familiarity,
    "corpus_chunk_tokens": q_chunk_tokens,
    "corpus_tfidf_keywords": q_tfidf_keywords,
    "corpus_boilerplate": q_boilerplate,
    "corpus_quality_bins": q_quality_bins,
    "corpus_mixture_resample": q_mixture_resample,
    "corpus_clean_text": q_clean_text,
    "corpus_stratified_k": q_stratified_k,
    "corpus_interleave": q_interleave,
    "corpus_winnow": q_winnow,
    "corpus_span_corruption": q_span_corruption,
    "corpus_sentences": q_sentences,
    "corpus_mixture_upsample": q_mixture_upsample,
    "corpus_expectations": q_expectations,
    "corpus_dedup_units": q_dedup_units,
    "corpus_dsir_topk": q_dsir_topk,
    "corpus_epoch_shuffle": q_epoch_shuffle,
    "corpus_bm25_topk": q_bm25_topk,
    "bm25_store_topk": q_bm25_store_topk,
    "corpus_mixture_temperature": q_mixture_temperature,
    "corpus_curriculum_order": q_curriculum_order,
    "corpus_dataset_profile": q_dataset_profile,
    "corpus_bpe_segment": q_bpe_segment,
    "corpus_source_overlap": q_source_overlap,
    "corpus_bpe_vocab": q_bpe_vocab,
    "corpus_bpe_encode": q_bpe_encode,
    "corpus_tokenizer_drift": q_tokenizer_drift,
    "corpus_wordpiece_segment": q_wordpiece_segment,
    "corpus_wordpiece_fit": q_wordpiece_fit,
    "corpus_fim": q_fim,
    "corpus_bpe_bytes": q_bpe_bytes,
    "pipeline_wet_ccnet": q_pipeline_wet_ccnet,
    "pipeline_ccnet_approx": q_pipeline_ccnet_approx,
    "corpus_unigram_segment": q_unigram_segment,
    "corpus_mixture_budget": q_mixture_budget,
    "corpus_bpe_bytes_encode": q_bpe_bytes_encode,
    "corpus_bpe_by_lang": q_bpe_by_lang,
    "corpus_unigram_by_lang": q_unigram_by_lang,
    "corpus_snapshot_diff": q_snapshot_diff,
    "corpus_blocklist": q_blocklist,
    "corpus_length_batches": q_length_batches,
    "corpus_normalize_unicode": q_normalize_unicode,
    "corpus_lm_perplexity": q_lm_perplexity,
    "corpus_lm3_perplexity": q_lm3_perplexity,
    "lm_store_perplexity": q_lm_store_perplexity,
    "corpus_lm_kn_perplexity": q_lm_kn_perplexity,
    "corpus_lm_kn3_perplexity": q_lm_kn3_perplexity,
    "corpus_lm_mkn_perplexity": q_lm_mkn_perplexity,
    "lm_store_kn_perplexity": q_lm_store_kn_perplexity,
    "lm_store_kn3_perplexity": q_lm_store_kn3_perplexity,
    "corpus_lm_sbo_perplexity": q_lm_sbo_perplexity,
    "corpus_lm_band": q_lm_band,
    "pipeline_ccnet": q_pipeline_ccnet,
    "corpus_lm_kn5_perplexity": q_lm_kn5_perplexity,
    "pipeline_ccnet5": q_pipeline_ccnet5,
    "pipeline_ccnet_par": q_pipeline_ccnet_par,
    "corpus_lang_id": q_lang_id,
    "corpus_lm_kn_by_source": q_lm_kn_by_source,
    "pipeline_ccnet_lid": q_pipeline_ccnet_lid,
    "attr_store_mix": q_attr_store_mix,
    "corpus_main_content": q_main_content,
    "attr_mix_report": q_attr_mix_report,
    "exact_dedup_store": q_exact_dedup_store,
    "corpus_leakage_split": q_leakage_split,
    "corpus_span_dedup": q_span_dedup,
    "span_dedup_store": q_span_dedup_store,
    "corpus_html_extract": q_html_extract,
    "corpus_domain_profile": q_domain_profile,
    "corpus_quality_classifier": q_quality_classifier,
    "corpus_weighted_sample": q_weighted_sample,
    "pipeline_crawl": q_pipeline_crawl,
    "corpus_domain_cap": q_domain_cap,
}

ORACLES_CORPUS: dict[str, str] = {
    "corpus_quality_signals": QUALITY_SIGNALS_ORACLE,
    "corpus_hash_split": HASH_SPLIT_ORACLE,
    "corpus_vocab_topk": VOCAB_TOPK_ORACLE,
    "corpus_contamination": CONTAMINATION_ORACLE,
    "corpus_pii_redact": PII_REDACT_ORACLE,
    "corpus_hash_sample": HASH_SAMPLE_ORACLE,
    "corpus_trigram_familiarity": TRIGRAM_FAMILIARITY_ORACLE,
    "corpus_chunk_tokens": CHUNK_TOKENS_ORACLE,
    "corpus_tfidf_keywords": TFIDF_KEYWORDS_ORACLE,
    "corpus_boilerplate": BOILERPLATE_ORACLE,
    "corpus_quality_bins": QUALITY_BINS_ORACLE,
    "corpus_mixture_resample": _mixture_oracle(),
    "corpus_clean_text": _clean_text_oracle(),
    "corpus_stratified_k": STRATIFIED_K_ORACLE,
    "corpus_interleave": INTERLEAVE_ORACLE,
    "corpus_winnow": WINNOW_ORACLE,
    "corpus_span_corruption": _span_corruption_oracle(),
    "corpus_sentences": SENTENCES_ORACLE,
    "corpus_mixture_upsample": _mixture_upsample_oracle(),
    "corpus_expectations": _expectations_oracle(),
    "corpus_dedup_units": DEDUP_UNITS_ORACLE,
    "corpus_dsir_topk": DSIR_TOPK_ORACLE,
    "corpus_epoch_shuffle": EPOCH_SHUFFLE_ORACLE,
    "corpus_bm25_topk": BM25_TOPK_ORACLE,
    "bm25_store_topk": BM25_TOPK_ORACLE,
    "corpus_mixture_temperature": _mixture_temperature_oracle(),
    "corpus_curriculum_order": _curriculum_oracle(),
    "corpus_dataset_profile": DATASET_PROFILE_ORACLE,
    "corpus_bpe_segment": _bpe_oracle(),
    "corpus_source_overlap": SOURCE_OVERLAP_ORACLE,
    "corpus_bpe_vocab": _bpe_vocab_oracle(),
    "corpus_bpe_encode": _bpe_encode_oracle(),
    "corpus_tokenizer_drift": _drift_oracle(),
    "corpus_wordpiece_segment": _wordpiece_oracle(),
    "corpus_wordpiece_fit": _wordpiece_fit_oracle(),
    "corpus_fim": _fim_oracle(),
    "corpus_bpe_bytes": _bpe_bytes_oracle(),
    "pipeline_wet_ccnet": PIPELINE_WET_CCNET_ORACLE,
    "corpus_unigram_segment": _unigram_oracle(),
    "corpus_mixture_budget": _mixture_budget_oracle(),
    "corpus_bpe_bytes_encode": _bpe_bytes_encode_oracle(),
    "corpus_bpe_by_lang": _bpe_by_lang_oracle(),
    "corpus_unigram_by_lang": _unigram_by_lang_oracle(),
    "corpus_snapshot_diff": SNAPSHOT_DIFF_ORACLE,
    "corpus_span_dedup": SPAN_DEDUP_ORACLE,
    "span_dedup_store": SPAN_DEDUP_ORACLE,
    "corpus_html_extract": _html_extract_oracle(),
    "corpus_domain_profile": _domain_profile_oracle(),
    "corpus_quality_classifier": _quality_classifier_oracle(),
    "corpus_weighted_sample": _weighted_sample_oracle(),
    "pipeline_crawl": _pipeline_crawl_oracle(),
    "corpus_domain_cap": _domain_cap_oracle(),
    "corpus_blocklist": BLOCKLIST_ORACLE,
    "corpus_length_batches": LENGTH_BATCHES_ORACLE,
    "corpus_normalize_unicode": NORMALIZE_UNICODE_ORACLE,
    "corpus_lm_perplexity": LM_PERPLEXITY_ORACLE,
    "corpus_lm3_perplexity": LM3_PERPLEXITY_ORACLE,
    "lm_store_perplexity": LM_PERPLEXITY_ORACLE,
    "corpus_lm_kn_perplexity": LM_KN_PERPLEXITY_ORACLE,
    "corpus_lm_kn3_perplexity": LM_KN3_PERPLEXITY_ORACLE,
    "corpus_lm_mkn_perplexity": LM_MKN_PERPLEXITY_ORACLE,
    "lm_store_kn_perplexity": _kn_bigram_oracle("TRUE"),
    "lm_store_kn3_perplexity": _kn3_oracle("TRUE"),
    "corpus_lm_sbo_perplexity": LM_SBO_PERPLEXITY_ORACLE,
    "corpus_lm_band": LM_BAND_ORACLE,
    "pipeline_ccnet": PIPELINE_CCNET_ORACLE,
    "pipeline_ccnet_approx": PIPELINE_CCNET_APPROX_ORACLE,
    "corpus_lm_kn5_perplexity": LM_KN5_PERPLEXITY_ORACLE,
    "pipeline_ccnet5": PIPELINE_CCNET5_ORACLE,
    "pipeline_ccnet_par": PIPELINE_CCNET_PAR_ORACLE,
    "corpus_lang_id": LANG_ID_ORACLE,
    "corpus_lm_kn_by_source": LM_KN_BY_SOURCE_ORACLE,
    "pipeline_ccnet_lid": PIPELINE_CCNET_LID_ORACLE,
    "attr_store_mix": ATTR_STORE_MIX_ORACLE,
    "corpus_main_content": _main_content_oracle(),
    "attr_mix_report": ATTR_MIX_REPORT_ORACLE,
    "exact_dedup_store": EXACT_DEDUP_STORE_ORACLE,
    "corpus_leakage_split": LEAKAGE_SPLIT_ORACLE,
}
