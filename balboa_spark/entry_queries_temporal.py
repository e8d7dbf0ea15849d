"""Driver queries + DuckDB oracles for the temporal operators
(balboa_spark.operators.temporal) and sequence packing
(corpus.pack_sequences).

These extend the engine beyond the reference's surface (SURVEY §2.6
J2 notes the reference has NO temporal joins; §7 declares them
scale-path additions): as-of join (sort-based, merge-join shape),
trailing range-window features (the hypertable rollup access pattern),
and concat-and-chunk sequence packing for pretraining batches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from balboa_spark.operators import corpus, temporal
from balboa_spark.session import load_tables


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, names=("events",))["events"]


# ---------------------------------------------------------------------------
# as-of join: each purchase attached to the user's most recent prior click
# ---------------------------------------------------------------------------

def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("c_event_id"),
        F.col("ts").alias("c_ts"),
    )
    return temporal.asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="c_ts", prefix=""
    ).select("event_id", "user_id", "c_event_id", "c_ts").orderBy("event_id")


#: DuckDB has a native ASOF JOIN — the ideal executable specification
#: for the sort-based union+window implementation (inclusive backward
#: match, left-join nulls).
EVENTS_ASOF_ORACLE = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, event_id AS c_event_id, ts AS c_ts
  FROM events WHERE event_type = 'click'
)
SELECT l.event_id, l.user_id, r.c_event_id, r.c_ts
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.c_ts
ORDER BY l.event_id
"""


# ---------------------------------------------------------------------------
# trailing 1-hour range-window features per user
# ---------------------------------------------------------------------------

def q_events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        temporal.rolling_features(
            _events(spark, sf_dir),
            keys=("user_id",),
            ts_col="ts",
            value_col="value",
            duration_sec=3600,
        )
        .select("event_id", "n_trailing", "sum_value_cents_trailing")
        .orderBy("event_id")
    )


EVENTS_ROLLING_ORACLE = """
SELECT event_id,
       count(*) OVER w AS n_trailing,
       -- DuckDB types sum(BIGINT) as HUGEINT; Spark's is LongType.
       -- isfinite mirrors the engine's finite_cents guard (NaN/Inf -> NULL)
       CAST(sum(CASE WHEN isfinite(value)
                     THEN CAST(round(value * 100) AS BIGINT) END) OVER w AS BIGINT)
         AS sum_value_cents_trailing
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# ordered funnel: signup -> click -> purchase per user
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("signup", "click", "purchase")


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        temporal.funnel(_events(spark, sf_dir), FUNNEL_STEPS)
        .orderBy("user_id")
    )


#: k-level correlated-CTE form — the declarative twin of the engine's
#: per-user ordered fold; strict '>' on every stage keeps both sides
#: independent of tie order.
EVENTS_FUNNEL_ORACLE = f"""
WITH u1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1
),
u2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN u1 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > u1.t1 GROUP BY 1
),
u3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN u2 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > u2.t2 GROUP BY 1
),
base AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type IN {tuple(FUNNEL_STEPS)!r}
)
SELECT b.user_id, u1.t1, u2.t2, u3.t3
FROM base b
LEFT JOIN u1 USING (user_id)
LEFT JOIN u2 USING (user_id)
LEFT JOIN u3 USING (user_id)
ORDER BY b.user_id
"""


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk, global doc_id order)
# ---------------------------------------------------------------------------

PACK_SEQ_LEN = 128


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return corpus.pack_sequences(docs, seq_len=PACK_SEQ_LEN).orderBy("seq_id")


PACK_SEQUENCES_ORACLE = f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
  FROM documents
),
counts AS (SELECT doc_id, len(tk) AS n FROM tk WHERE len(tk) > 0),
offs AS (
  SELECT doc_id,
         coalesce(sum(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM counts
),
tok AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk) + 1),
                               i -> {{'pos': i, 'tok': tk[i]}})) AS s
  FROM tk WHERE len(tk) > 0
),
tok2 AS (
  SELECT o.start + struct_extract(t.s, 'pos') - 1 AS gpos,
         struct_extract(t.s, 'tok') AS tok
  FROM tok t JOIN offs o USING (doc_id)
)
SELECT CAST(floor(gpos / {PACK_SEQ_LEN}) AS BIGINT) AS seq_id,
       count(*) AS n_seq_tokens,
       string_agg(tok, ' ' ORDER BY gpos) AS seq_text
FROM tok2 GROUP BY 1 ORDER BY seq_id
"""


def q_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair assembly (DPO shape, r15): treat each user's
    scored events as rated responses to one prompt — per prompt the
    best-scored response (ties -> lowest event_id) pairs against the
    worst-scored (ties -> lowest event_id), both rendered through the
    chat template. Prompts whose best and worst scores are equal are
    dropped (no strict preference). ONE groupBy with max_by/min_by —
    no per-prompt window, no self-join (operators/sft.py
    preference_pairs)."""
    from balboa_spark.operators.sft import preference_pairs

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    ratings = ev.select(
        F.col("user_id").alias("prompt_id"),
        F.col("event_id").alias("response_id"),
        F.concat(
            F.col("event_type"), F.lit(" "), F.coalesce("props", F.lit(""))
        ).alias("response"),
        F.col("value").alias("score"),
    )
    return preference_pairs(ratings, system_prompt="sys").orderBy(
        "prompt_id"
    )


SFT_PAIRS_ORACLE = """
WITH r AS (
  SELECT user_id AS prompt_id, event_id AS response_id,
         event_type || ' ' || coalesce(props, '') AS response,
         value AS score
  FROM events
  WHERE user_id IS NOT NULL AND event_id IS NOT NULL
    AND value IS NOT NULL AND NOT isnan(value)
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY prompt_id
                            ORDER BY score DESC, response_id ASC) AS rc,
         row_number() OVER (PARTITION BY prompt_id
                            ORDER BY score ASC, response_id ASC) AS rr
  FROM r
),
c AS (SELECT prompt_id, response_id AS chosen_id, response AS chosen_text,
             score AS chosen_score FROM ranked WHERE rc = 1),
j AS (SELECT prompt_id, response_id AS rejected_id, response AS rejected_text,
             score AS rejected_score FROM ranked WHERE rr = 1)
SELECT c.prompt_id, chosen_id, rejected_id, chosen_score, rejected_score,
       '<|system|>sys<|end|>' || '<|user|>' || CAST(c.prompt_id AS VARCHAR)
         || '<|end|>' || '<|assistant|>' || chosen_text || '<|end|>'
         AS chosen,
       '<|system|>sys<|end|>' || '<|user|>' || CAST(c.prompt_id AS VARCHAR)
         || '<|end|>' || '<|assistant|>' || rejected_text || '<|end|>'
         AS rejected
FROM c JOIN j USING (prompt_id)
WHERE chosen_score > rejected_score
ORDER BY c.prompt_id
"""


def q_sft_pairs_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-id preference pairs (r16, the r15 verdict's gap #2
    closed and graded): the same DPO assembly as sft_pairs but with
    UUID-style STRING response ids — 'r' || event_id — whose
    lexicographic order deliberately DIVERGES from numeric order
    ('r10' < 'r9'), so the hash compare actually pins the binary-UTF-8
    tie rule, not a relabeled integer order. Kernel unchanged: ONE
    groupBy, min_by over (-score, id) structs (negating the SCORE is
    what freed the id type)."""
    from balboa_spark.operators.sft import preference_pairs

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    ratings = ev.select(
        F.col("user_id").alias("prompt_id"),
        F.concat(F.lit("r"), F.col("event_id").cast("string")).alias(
            "response_id"
        ),
        F.concat(
            F.col("event_type"), F.lit(" "), F.coalesce("props", F.lit(""))
        ).alias("response"),
        F.col("value").alias("score"),
    )
    return preference_pairs(ratings, system_prompt="sys").orderBy(
        "prompt_id"
    )


SFT_PAIRS_STR_ORACLE = """
WITH r AS (
  SELECT user_id AS prompt_id, 'r' || CAST(event_id AS VARCHAR) AS response_id,
         event_type || ' ' || coalesce(props, '') AS response,
         value AS score
  FROM events
  WHERE user_id IS NOT NULL AND event_id IS NOT NULL
    AND value IS NOT NULL AND NOT isnan(value)
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY prompt_id
                            ORDER BY score DESC,
                                     response_id ASC) AS rc,
         row_number() OVER (PARTITION BY prompt_id
                            ORDER BY score ASC,
                                     response_id ASC) AS rr
  FROM r
),
c AS (SELECT prompt_id, response_id AS chosen_id, response AS chosen_text,
             score AS chosen_score FROM ranked WHERE rc = 1),
j AS (SELECT prompt_id, response_id AS rejected_id, response AS rejected_text,
             score AS rejected_score FROM ranked WHERE rr = 1)
SELECT c.prompt_id, chosen_id, rejected_id, chosen_score, rejected_score,
       '<|system|>sys<|end|>' || '<|user|>' || CAST(c.prompt_id AS VARCHAR)
         || '<|end|>' || '<|assistant|>' || chosen_text || '<|end|>'
         AS chosen,
       '<|system|>sys<|end|>' || '<|user|>' || CAST(c.prompt_id AS VARCHAR)
         || '<|end|>' || '<|assistant|>' || rejected_text || '<|end|>'
         AS rejected
FROM c JOIN j USING (prompt_id)
WHERE chosen_score > rejected_score
ORDER BY c.prompt_id
"""


PAIRS_TOPK_K = 2
PAIRS_TOPK_MARGIN = 10.0


def q_sft_pairs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded all-pairs preference assembly (K-way-ranking DPO shape,
    r16): per prompt the top-2 chosen candidates cross the bottom-2
    rejected candidates, pairs kept only when the score gap clears the
    margin — at most k^2 rows per prompt regardless of response count.
    ONE salted two-stage aggregation builds BOTH candidate lists; the
    k x k expansion is a row-local array cross, no self-join
    (operators/sft.py preference_pairs_topk)."""
    from balboa_spark.operators.sft import preference_pairs_topk

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    ratings = ev.select(
        F.col("user_id").alias("prompt_id"),
        F.col("event_id").alias("response_id"),
        F.concat(
            F.col("event_type"), F.lit(" "), F.coalesce("props", F.lit(""))
        ).alias("response"),
        F.col("value").alias("score"),
    )
    return preference_pairs_topk(
        ratings, k=PAIRS_TOPK_K, min_margin=PAIRS_TOPK_MARGIN,
        system_prompt="sys",
    ).orderBy("prompt_id", "chosen_rank", "rejected_rank")


SFT_PAIRS_TOPK_ORACLE = f"""
WITH r AS (
  SELECT user_id AS prompt_id, event_id AS response_id,
         event_type || ' ' || coalesce(props, '') AS response,
         value AS score
  FROM events
  WHERE user_id IS NOT NULL AND event_id IS NOT NULL
    AND value IS NOT NULL AND NOT isnan(value)
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY prompt_id
                            ORDER BY score DESC, response_id ASC) AS rc,
         row_number() OVER (PARTITION BY prompt_id
                            ORDER BY score ASC, response_id ASC) AS rr
  FROM r
),
c AS (SELECT prompt_id, response_id AS chosen_id, response AS chosen_text,
             score AS chosen_score, CAST(rc AS INTEGER) AS chosen_rank
      FROM ranked WHERE rc <= {PAIRS_TOPK_K}),
j AS (SELECT prompt_id, response_id AS rejected_id, response AS rejected_text,
             score AS rejected_score, CAST(rr AS INTEGER) AS rejected_rank
      FROM ranked WHERE rr <= {PAIRS_TOPK_K})
SELECT c.prompt_id, chosen_id, rejected_id, chosen_score, rejected_score,
       chosen_rank, rejected_rank,
       '<|system|>sys<|end|>' || '<|user|>' || CAST(c.prompt_id AS VARCHAR)
         || '<|end|>' || '<|assistant|>' || chosen_text || '<|end|>'
         AS chosen,
       '<|system|>sys<|end|>' || '<|user|>' || CAST(c.prompt_id AS VARCHAR)
         || '<|end|>' || '<|assistant|>' || rejected_text || '<|end|>'
         AS rejected
FROM c JOIN j USING (prompt_id)
WHERE chosen_score > rejected_score + {PAIRS_TOPK_MARGIN}
  AND chosen_id <> rejected_id
ORDER BY c.prompt_id, chosen_rank, rejected_rank
"""


REJ_THRESHOLD = 50.0
REJ_K = 3


def q_sft_rejection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejection-sampling selection (RFT/best-of-n, r15): per prompt
    keep the top-3 responses clearing the reward threshold, rendered —
    the positive-only sibling of sft_pairs. ONE groupBy; the top-k is
    a slice(sort_array(collect_list)) over the per-prompt response
    list (bounded by responses-per-prompt), no window, no self-join
    (operators/sft.py rejection_sample)."""
    from balboa_spark.operators.sft import rejection_sample

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    ratings = ev.select(
        F.col("user_id").alias("prompt_id"),
        F.col("event_id").alias("response_id"),
        F.concat(
            F.col("event_type"), F.lit(" "), F.coalesce("props", F.lit(""))
        ).alias("response"),
        F.col("value").alias("score"),
    )
    return rejection_sample(
        ratings, threshold=REJ_THRESHOLD, k=REJ_K, system_prompt="sys"
    ).orderBy("prompt_id", "rank")


SFT_REJECTION_ORACLE = f"""
WITH r AS (
  SELECT user_id AS prompt_id, event_id AS response_id,
         event_type || ' ' || coalesce(props, '') AS response,
         value AS score
  FROM events
  WHERE user_id IS NOT NULL AND event_id IS NOT NULL
    AND value IS NOT NULL AND NOT isnan(value)
    AND value >= {REJ_THRESHOLD}
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY prompt_id
                            ORDER BY score DESC, response_id ASC) AS rk
  FROM r
)
SELECT prompt_id, response_id, score, CAST(rk AS INT) AS rank,
       '<|system|>sys<|end|>' || '<|user|>' || CAST(prompt_id AS VARCHAR)
         || '<|end|>' || '<|assistant|>' || response || '<|end|>'
         AS rendered
FROM ranked
WHERE rk <= {REJ_K}
ORDER BY prompt_id, rank
"""


TRAIN_SHARDS_N = 8


def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-shard sink's EXACT layout, graded (r14 verdict
    What's-wrong #3): pack -> shard-assign via the sink's own
    ``shards.shard_of`` (md5-derived since r15, so DuckDB can replay
    the assignment) -> within-shard (shard, seq_id) position — the
    resume cursor a trainer names its position with. The row_number
    window partitioned by shard is the GRADING surface only (it pins
    the within-shard order for the hash compare at sf0.01); the SINK
    itself never computes it — write_training_shards establishes the
    same order via sortWithinPartitions inside the num_shards-way
    repartition, one shuffle, no window (operators/shards.py)."""
    from pyspark.sql import Window

    from balboa_spark.operators.shards import shard_of

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    packed = corpus.pack_sequences(docs, seq_len=PACK_SEQ_LEN)
    sh = packed.withColumn("shard", shard_of(F.col("seq_id"), TRAIN_SHARDS_N))
    w = Window.partitionBy("shard").orderBy("seq_id")
    return sh.select(
        F.col("shard"),
        F.col("seq_id"),
        F.row_number().over(w).cast("int").alias("shard_pos"),
        F.col("n_seq_tokens"),
        F.col("seq_text"),
    ).orderBy("shard", "seq_id")


TRAINING_SHARDS_ORACLE = f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
  FROM documents
),
counts AS (SELECT doc_id, len(tk) AS n FROM tk WHERE len(tk) > 0),
offs AS (
  SELECT doc_id,
         coalesce(sum(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM counts
),
tok AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk) + 1),
                               i -> {{'pos': i, 'tok': tk[i]}})) AS s
  FROM tk WHERE len(tk) > 0
),
tok2 AS (
  SELECT o.start + struct_extract(t.s, 'pos') - 1 AS gpos,
         struct_extract(t.s, 'tok') AS tok
  FROM tok t JOIN offs o USING (doc_id)
),
packed AS (
  SELECT CAST(floor(gpos / {PACK_SEQ_LEN}) AS BIGINT) AS seq_id,
         count(*) AS n_seq_tokens,
         string_agg(tok, ' ' ORDER BY gpos) AS seq_text
  FROM tok2 GROUP BY 1
),
sh AS (
  SELECT *,
         CAST(CAST('0x' || substr(md5(CAST(seq_id AS VARCHAR)), 1, 12)
                   AS BIGINT) % {TRAIN_SHARDS_N} AS INT) AS shard
  FROM packed
)
SELECT shard, seq_id,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY seq_id) AS INT)
         AS shard_pos,
       n_seq_tokens, seq_text
FROM sh
ORDER BY shard, seq_id
"""


def q_pack_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pack_sequences(with_boundaries=True): each packed sequence plus
    the in-sequence offsets where a new document begins — the
    attention-mask reset points a packed-training loader needs. The
    boundary list rides the SAME groupBy as the packing agg (zero
    extra shuffles); emitted comma-joined so the driver canon hashes a
    scalar string."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    packed = corpus.pack_sequences(
        docs, seq_len=PACK_SEQ_LEN, with_boundaries=True
    )
    return packed.select(
        "seq_id",
        "n_seq_tokens",
        F.array_join(F.col("doc_starts"), ",").alias("doc_starts"),
    ).orderBy("seq_id")


PACK_BOUNDARIES_ORACLE = f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
  FROM documents
),
counts AS (SELECT doc_id, len(tk) AS n FROM tk WHERE len(tk) > 0),
offs AS (
  SELECT doc_id,
         coalesce(sum(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM counts
),
tok AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk) + 1),
                               i -> {{'pos': i, 'tok': tk[i]}})) AS s
  FROM tk WHERE len(tk) > 0
),
tok2 AS (
  SELECT o.start + struct_extract(t.s, 'pos') - 1 AS gpos,
         struct_extract(t.s, 'pos') = 1 AS is_head
  FROM tok t JOIN offs o USING (doc_id)
)
SELECT CAST(floor(gpos / {PACK_SEQ_LEN}) AS BIGINT) AS seq_id,
       count(*) AS n_seq_tokens,
       coalesce(
         string_agg(CAST(CAST(gpos % {PACK_SEQ_LEN} AS INTEGER) AS VARCHAR),
                    ',' ORDER BY gpos) FILTER (WHERE is_head),
         '') AS doc_starts
FROM tok2 GROUP BY 1 ORDER BY seq_id
"""


PACK_BESTFIT_GROUPS = 8


def q_pack_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-free FFD bin packing (corpus.pack_bestfit), graded
    through its INVARIANTS (r8 upgrade from rows-only; the FFD loop
    itself is not SQL-expressible, but its correctness conditions
    are): per packing group, (1) piece count and token mass equal the
    chunked input's — DuckDB recomputes both from `documents` alone;
    (2) no bin over capacity; (3) every bin's fill equals its
    seq_text token count; (4) every piece appears exactly once
    (distinct piece ids == piece count); (5) bin count is at least
    the token-mass lower bound ceil(total_fill/seq_len). The oracle
    emits TRUE constants for (2)-(5) — any FFD defect flips a bool or
    shifts a count and the hash goes red. Exact bin composition is
    additionally covered by the pure-Python parity unit tests."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    packed = corpus.pack_bestfit(
        docs, seq_len=PACK_SEQ_LEN, num_groups=PACK_BESTFIT_GROUPS
    )
    bins = packed.select(
        F.col("group").alias("grp"),
        "n_pieces",
        "fill_tokens",
        F.size(F.split("seq_text", " ")).alias("_text_toks"),
        F.split("piece_ids", ",").alias("_pids"),
    )
    per_group = bins.groupBy("grp").agg(
        F.sum("n_pieces").cast("long").alias("n_pieces"),
        F.sum("fill_tokens").cast("long").alias("total_fill"),
        F.count(F.lit(1)).alias("_n_bins"),
        F.bool_and(F.col("fill_tokens") <= F.lit(PACK_SEQ_LEN)).alias(
            "all_within_cap"
        ),
        F.bool_and(F.col("fill_tokens") == F.col("_text_toks")).alias(
            "fill_matches_text"
        ),
        F.bool_and(F.col("n_pieces") == F.size("_pids")).alias("_listed"),
    )
    distinct = (
        bins.select("grp", F.explode("_pids").alias("pid"))
        .groupBy("grp")
        .agg(F.countDistinct("pid").alias("_distinct"))
    )
    return (
        per_group.join(distinct, "grp")
        .select(
            "grp",
            "n_pieces",
            "total_fill",
            "all_within_cap",
            "fill_matches_text",
            (F.col("_listed") & (F.col("_distinct") == F.col("n_pieces"))).alias(
                "pieces_distinct"
            ),
            (
                F.col("_n_bins")
                >= F.ceil(F.col("total_fill") / F.lit(PACK_SEQ_LEN))
            ).alias("bins_lower_ok"),
        )
        .orderBy("grp")
    )


PACK_BESTFIT_ORACLE = f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
  FROM documents
),
sized AS (SELECT doc_id, len(tk) AS n FROM tk WHERE len(tk) > 0),
pieces AS (
  SELECT doc_id, i AS chunk,
         least({PACK_SEQ_LEN}, n - i * {PACK_SEQ_LEN}) AS plen,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(31)
               || CAST(i AS VARCHAR)), 1, 6)) AS BIGINT)
           % {PACK_BESTFIT_GROUPS} AS grp
  FROM sized, unnest(range(0, CAST(ceil(n / {PACK_SEQ_LEN}.0) AS BIGINT))) AS t(i)
)
SELECT CAST(grp AS INTEGER) AS grp,
       count(*) AS n_pieces,
       CAST(sum(plen) AS BIGINT) AS total_fill,
       TRUE AS all_within_cap,
       TRUE AS fill_matches_text,
       TRUE AS pieces_distinct,
       TRUE AS bins_lower_ok
FROM pieces GROUP BY grp ORDER BY grp
"""


# ---------------------------------------------------------------------------
# interval join: clicks inside each purchase's trailing attribution window
# ---------------------------------------------------------------------------


def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via the bucketed equi-join rewrite
    (temporal.interval_join): each purchase opens a 1-hour trailing
    attribution window; every same-user click inside it pairs up."""
    e = _events(spark, sf_dir)
    intervals = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    points = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id", "ts"
    )
    return (
        temporal.interval_join(points, intervals, on=["user_id"])
        .select("p_id", "c_id")
        .orderBy("p_id", "c_id")
    )


EVENTS_INTERVAL_JOIN_ORACLE = """
SELECT p.event_id AS p_id, c.event_id AS c_id
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
ORDER BY p_id, c_id
"""


# ---------------------------------------------------------------------------
# Z-order layout codes over (user_id, epoch-micros)
# ---------------------------------------------------------------------------

ZORDER_BITS = 8


def q_events_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton layout code per event over the (user_id, time) plane
    (plans/zorder.py): the clustering key a store would range-
    partition + sort by so min/max skipping prunes on EITHER column."""
    from balboa_spark.plans.zorder import zorder_code

    e = _events(spark, sf_dir).select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    return zorder_code(e, "user_id", "ts_us", bits=ZORDER_BITS).select(
        "event_id", "zcode"
    ).orderBy("event_id")


def _zorder_oracle() -> str:
    from balboa_spark.plans.zorder import zorder_oracle_expr

    return f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
m AS (
  SELECT min(user_id) AS _mna, max(user_id) AS _mxa,
         min(ts_us) AS _mnb, max(ts_us) AS _mxb
  FROM e
)
SELECT event_id,
       CAST({zorder_oracle_expr("user_id", "ts_us", ZORDER_BITS)} AS BIGINT)
         AS zcode
FROM e, m ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# schema-on-read over the free-form props JSON blob
# ---------------------------------------------------------------------------

def q_events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the semi-structured props column rolled
    up per event_type — the declared-extraction half of schema-on-read
    (a pure JVM projection feeding one small-cardinality aggregate)."""
    from balboa_spark.operators.semistructured import extract_json

    e = extract_json(
        _events(spark, sf_dir), "props", {"k": ("k", "int")}
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


#: the int extraction mirrors Spark's try_cast-to-int semantics with a
#: strict regex guard — DuckDB's own TRY_CAST('1.5' AS INTEGER) ROUNDS
#: to 2 where Spark try_cast yields NULL, and a plain CAST crashes on
#: non-numeric values, so neither is a faithful twin
EVENTS_PROPS_EXTRACT_ORACLE = """
WITH raw AS (
  SELECT event_type,
         CASE WHEN json_valid(props)
              THEN json_extract_string(props, '$.k') END AS kv
  FROM events
),
e AS (
  SELECT event_type,
         CASE WHEN regexp_matches(kv, '^-?\\d+$')
              THEN CAST(kv AS INTEGER) END AS k
  FROM raw
)
SELECT event_type,
       count(*) AS n,
       count(k) AS n_k,
       min(k) AS min_k,
       max(k) AS max_k,
       CAST(sum(k) AS BIGINT) AS sum_k
FROM e GROUP BY event_type ORDER BY event_type
"""


def q_events_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read discovery over props: which keys exist, with
    what scalar types, how often — one corpus pass, schema-sized
    output."""
    from balboa_spark.operators.semistructured import json_key_profile

    return json_key_profile(_events(spark, sf_dir), "props").orderBy(
        "key", "type"
    )


def _props_profile_oracle() -> str:
    """Oracle generated from the engine's OWN classification regexes
    (semistructured._INT_RE/_FLOAT_RE — the shared-constants oracle
    pattern): the engine classifies the string RENDERING of each value
    (a quoted "7" and a bare 7 both render to '7' through the
    map<string,string> parse and both count as int), so a
    json_type-based oracle would diverge on quoted scalars — and it
    must also reproduce the engine's counted ``_corrupt`` row, which
    a json_valid filter would silently drop."""
    from balboa_spark.operators.semistructured import _FLOAT_RE, _INT_RE

    classify = f"""CASE
         WHEN v IS NULL THEN 'null'
         WHEN regexp_matches(v, '{_INT_RE}') THEN 'int'
         WHEN regexp_matches(v, '{_FLOAT_RE}') THEN 'float'
         WHEN v IN ('true', 'false') THEN 'bool'
         WHEN v LIKE '{{%' THEN 'object'
         WHEN v LIKE '[%' THEN 'array'
         ELSE 'string' END"""
    # json_keys/json_type must be reached only through the CASE guard:
    # a lateral "FROM events, unnest(json_keys(props))" evaluates
    # json_keys BEFORE any WHERE filter, so an unguarded form crashes
    # outright on the first malformed blob. The engine's _corrupt
    # definition is "fails the map<string,string> parse", which also
    # covers VALID non-object JSON ('7', '[1,2]', 'null') — the oracle
    # must count those too, not just NOT json_valid.
    obj = (
        "CASE WHEN json_valid(props) THEN "
        "CASE WHEN json_type(props) = 'OBJECT' THEN props END END"
    )
    return f"""
WITH kv AS (
  SELECT k.key,
         json_extract_string(props, '$.' || k.key) AS v
  FROM events, unnest(json_keys({obj})) AS k(key)
),
typed AS (
  SELECT key, {classify} AS type, count(*) AS n
  FROM kv GROUP BY 1, 2
  UNION ALL
  SELECT '_corrupt' AS key, 'corrupt' AS type, count(*) AS n
  FROM events
  WHERE props IS NOT NULL AND ({obj}) IS NULL
  HAVING count(*) > 0
)
SELECT key, type, n FROM typed ORDER BY key, type
"""


# ---------------------------------------------------------------------------
# key-skew diagnostics (the measurement that sizes the salting plan)
# ---------------------------------------------------------------------------

def q_events_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer skew metrics of the events-per-user distribution — one
    corpus-sized groupBy then a one-row reduce; skew_permille is the
    max/mean ratio in integer permille so the hash compare is exact."""
    from balboa_spark.plans import skew

    return skew.skew_metrics(_events(spark, sf_dir), ["user_id"])


EVENTS_SKEW_ORACLE = """
WITH c AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
)
SELECT CAST(sum(n) AS BIGINT) AS total_rows,
       count(*) AS n_keys,
       max(n) AS max_key_rows,
       min(n) AS min_key_rows,
       CAST(floor(1000.0 * max(n) / CAST(sum(n) AS DOUBLE) * count(*))
            AS BIGINT) AS skew_permille
FROM c
"""


def q_events_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest users with integer ppm share — heavy_keys is
    one keys-sized groupBy + a broadcast single-row total + TakeOrdered."""
    from balboa_spark.plans import skew

    return skew.heavy_keys(_events(spark, sf_dir), ["user_id"], top=10)


EVENTS_HEAVY_USERS_ORACLE = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM c)
SELECT user_id, n,
       CAST(floor(1000000.0 * n / tt) AS BIGINT) AS share_ppm
FROM c, t ORDER BY n DESC, user_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# fixed-grid resample with gap generation
# ---------------------------------------------------------------------------

RESAMPLE_STEP = 86400  # 1-day buckets over the 30-day synthetic span


def q_events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily resample with generated gap buckets and a
    forward-filled sum (temporal.resample_events) — the regular-grid
    series a feature pipeline needs; the oracle generates the same
    grid with generate_series and replays the ffill window."""
    from balboa_spark.operators import temporal

    load_tables(spark, sf_dir, names=("events",))
    return temporal.resample_events(
        spark.table("events"), step=RESAMPLE_STEP, fill="ffill"
    ).orderBy("user_id", "bucket_start")


EVENTS_RESAMPLE_ORACLE = f"""
WITH c AS (
  -- exact integer FLOOR division: DuckDB's integer // truncates
  -- toward zero (-30 // 86400 = 0, not -1), so a bare // shifts every
  -- pre-1970 timestamp up one bucket; subtracting the positive mod
  -- first makes the dividend an exact multiple, where truncate ==
  -- floor (the engine uses the same (x - pmod(x,s)) div s identity)
  SELECT user_id,
         (epoch_us(ts) - ((epoch_us(ts) % {RESAMPLE_STEP * 1_000_000})
                          + {RESAMPLE_STEP * 1_000_000}) % {RESAMPLE_STEP * 1_000_000})
           // {RESAMPLE_STEP * 1_000_000} AS b,
         CASE WHEN isfinite(value)
              THEN CAST(round(value * 100) AS BIGINT) END AS cents
  FROM events
),
a AS (
  SELECT user_id, b, COUNT(*) AS n, SUM(cents) AS s
  FROM c GROUP BY 1, 2
),
sp AS (SELECT user_id, MIN(b) AS lo, MAX(b) AS hi FROM c GROUP BY 1),
g AS (
  SELECT user_id, unnest(generate_series(lo, hi)) AS b FROM sp
),
j AS (
  SELECT g.user_id, g.b, COALESCE(a.n, 0) AS n, a.s
  FROM g LEFT JOIN a ON a.user_id = g.user_id AND a.b = g.b
)
SELECT user_id, CAST(b * {RESAMPLE_STEP} AS BIGINT) AS bucket_start,
       CAST(n AS BIGINT) AS n_events,
       CAST(COALESCE(
         last_value(s IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
         AS BIGINT) AS sum_cents
FROM j
ORDER BY user_id, bucket_start
"""


# ---------------------------------------------------------------------------
# SFT (instruction-tuning) assembly: threaded conversations -> chat
# template render -> loss-mask spans (operators.sft)
# ---------------------------------------------------------------------------

SFT_SYSTEM = "you are a helpful assistant"
SFT_GAP_MIN = 30

#: shared turn CTEs: sessionize (gap rule) -> per-conversation turn
#: index -> alternating roles -> content with explicit coalesce (the
#: engine's concat/coalesce contract; DuckDB || would NULL-propagate)
_SFT_TURNS_SQL = f"""
t0 AS (
  -- ts IS NOT NULL: the conversation_turns contract (unstamped
  -- events cannot be ordered; NULL sort position differs per engine)
  SELECT user_id, ts, event_id,
         event_type || ' ' || coalesce(props, '') AS content,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        + INTERVAL {SFT_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_conv
  FROM events WHERE ts IS NOT NULL
),
t1 AS (
  SELECT user_id, ts, event_id, content,
         CAST(sum(new_conv) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conv_id
  FROM t0
),
turns AS (
  SELECT user_id, conv_id,
         CAST(row_number() OVER (PARTITION BY user_id, conv_id
                                 ORDER BY ts, event_id) AS INTEGER) AS turn_idx,
         content
  FROM t1
),
rt AS (
  SELECT user_id, conv_id, turn_idx,
         CASE WHEN turn_idx % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
         content
  FROM turns
)
"""


def _sft_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from balboa_spark.operators import sft

    return sft.conversation_turns(
        _events(spark, sf_dir), gap_minutes=SFT_GAP_MIN
    )


def q_sft_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template rendering of gap-threaded conversations
    (operators.sft): one transcript row per conversation with the
    loss-accounting aggregates (assistant content mass) an SFT packer
    needs. The oracle replays sessionization, turn ordering (exact-
    timestamp ties broken by event_id), role alternation, the
    ChatML-like template, and every aggregate."""
    from balboa_spark.operators import sft

    return sft.render_conversations(
        _sft_turns(spark, sf_dir), system_prompt=SFT_SYSTEM
    ).orderBy("user_id", "conv_id")


SFT_RENDER_ORACLE = f"""
WITH {_SFT_TURNS_SQL},
r AS (
  SELECT user_id, conv_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         '<|system|>{SFT_SYSTEM}<|end|>'
           || coalesce(
                string_agg('<|' || role || '|>' || content || '<|end|>',
                           '' ORDER BY turn_idx), '') AS rendered,
         CAST(sum(CASE WHEN role = 'assistant' THEN length(content) ELSE 0 END)
              AS BIGINT) AS assistant_chars,
         CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
              AS BIGINT) AS assistant_turns
  FROM rt GROUP BY user_id, conv_id
)
SELECT user_id, conv_id, n_turns, rendered,
       CAST(length(rendered) AS BIGINT) AS total_chars,
       assistant_chars, assistant_turns
FROM r ORDER BY user_id, conv_id
"""


def q_sft_loss_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn [content_start, content_end) codepoint spans inside
    the rendered transcript plus the assistant loss mask — the
    (conv, span, mask) relation a trainer consumes without re-scanning
    text. Offsets come from an exclusive cumulative sum of rendered
    piece lengths over the per-conversation window (key-bounded)."""
    from balboa_spark.operators import sft

    return sft.loss_mask_spans(
        _sft_turns(spark, sf_dir), system_prompt=SFT_SYSTEM
    ).orderBy("user_id", "conv_id", "turn_idx")


# piece = '<|' + role + '|>' + content + '<|end|>' -> 4 + len(role)
# + len(content) + 7 codepoints; system prefix rendered once up front
_SFT_PREFIX_LEN = len("<|system|>") + len(SFT_SYSTEM) + len("<|end|>")

SFT_LOSS_SPANS_ORACLE = f"""
WITH {_SFT_TURNS_SQL}
SELECT user_id, conv_id, turn_idx, role,
       CAST({_SFT_PREFIX_LEN}
            + coalesce(sum(4 + length(role) + length(content) + 7) OVER (
                PARTITION BY user_id, conv_id ORDER BY turn_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + 4 + length(role) AS BIGINT) AS content_start,
       CAST({_SFT_PREFIX_LEN}
            + coalesce(sum(4 + length(role) + length(content) + 7) OVER (
                PARTITION BY user_id, conv_id ORDER BY turn_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + 4 + length(role) + length(content) AS BIGINT) AS content_end,
       CAST(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS INTEGER)
         AS loss_mask
FROM rt ORDER BY user_id, conv_id, turn_idx
"""


SFT_PACK_LEN = 64


def q_pipeline_sft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed POST-TRAINING data pipeline, graded end to end
    like pipeline_pretrain: events -> gap-threaded conversations ->
    chat-template transcripts -> concat-and-chunk packed sequences.
    Each conversation becomes one 'document' keyed user_id*100000 +
    conv_id (deterministic global pack order on both engines); the
    oracle replays sessionization, the render, and the packer's
    global prefix-sum arithmetic.

    Packing unit here is WHITESPACE tokens of the rendered transcript
    — chosen because it keeps every stage exactly SQL-replayable; a
    production run feeds the same transcripts through the byte-BPE
    tokenizer (corpus_bpe_bytes_encode's kernel) and packs piece ids
    with the identical fragment packer."""
    from balboa_spark.operators import sft

    rendered = sft.render_conversations(
        _sft_turns(spark, sf_dir), system_prompt=SFT_SYSTEM
    )
    docs = rendered.select(
        (F.col("user_id") * 100000 + F.col("conv_id")).alias("doc_id"),
        F.col("rendered").alias("text"),
    )
    return corpus.pack_sequences(docs, seq_len=SFT_PACK_LEN).orderBy("seq_id")


PIPELINE_SFT_ORACLE = f"""
WITH {_SFT_TURNS_SQL},
r AS (
  SELECT user_id * 100000 + conv_id AS doc_id,
         '<|system|>{SFT_SYSTEM}<|end|>'
           || coalesce(
                string_agg('<|' || role || '|>' || content || '<|end|>',
                           '' ORDER BY turn_idx), '') AS text
  FROM rt GROUP BY user_id, conv_id
),
tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
  FROM r
),
counts AS (SELECT doc_id, len(tk) AS n FROM tk WHERE len(tk) > 0),
offs AS (
  SELECT doc_id,
         coalesce(sum(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM counts
),
tok AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk) + 1),
                               i -> {{'pos': i, 'tok': tk[i]}})) AS s
  FROM tk WHERE len(tk) > 0
),
tok2 AS (
  SELECT o.start + struct_extract(t.s, 'pos') - 1 AS gpos,
         struct_extract(t.s, 'tok') AS tok
  FROM tok t JOIN offs o USING (doc_id)
)
SELECT CAST(floor(gpos / {SFT_PACK_LEN}) AS BIGINT) AS seq_id,
       count(*) AS n_seq_tokens,
       string_agg(tok, ' ' ORDER BY gpos) AS seq_text
FROM tok2 GROUP BY 1 ORDER BY seq_id
"""


QUERIES_TEMPORAL: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_resample": q_events_resample,
    "events_asof": q_events_asof,
    "events_rolling_1h": q_events_rolling,
    "events_funnel": q_events_funnel,
    "corpus_pack_sequences": q_pack_sequences,
    "corpus_pack_boundaries": q_pack_boundaries,
    "corpus_training_shards": q_training_shards,
    "corpus_pack_bestfit": q_pack_bestfit,
    "events_zorder": q_events_zorder,
    "events_interval_join": q_events_interval_join,
    "events_props_extract": q_events_props_extract,
    "events_props_profile": q_events_props_profile,
    "events_skew_metrics": q_events_skew,
    "events_heavy_users": q_events_heavy_users,
    "sft_render": q_sft_render,
    "sft_loss_spans": q_sft_loss_spans,
    "pipeline_sft": q_pipeline_sft,
    "sft_pairs": q_sft_pairs,
    "sft_pairs_str": q_sft_pairs_str,
    "sft_pairs_topk": q_sft_pairs_topk,
    "sft_rejection": q_sft_rejection,
}

ORACLES_TEMPORAL: dict[str, str] = {
    "events_resample": EVENTS_RESAMPLE_ORACLE,
    "events_asof": EVENTS_ASOF_ORACLE,
    "events_rolling_1h": EVENTS_ROLLING_ORACLE,
    "events_funnel": EVENTS_FUNNEL_ORACLE,
    "corpus_pack_sequences": PACK_SEQUENCES_ORACLE,
    "corpus_pack_boundaries": PACK_BOUNDARIES_ORACLE,
    "corpus_training_shards": TRAINING_SHARDS_ORACLE,
    "corpus_pack_bestfit": PACK_BESTFIT_ORACLE,
    "events_zorder": _zorder_oracle(),
    "events_interval_join": EVENTS_INTERVAL_JOIN_ORACLE,
    "events_props_extract": EVENTS_PROPS_EXTRACT_ORACLE,
    "events_props_profile": _props_profile_oracle(),
    "events_skew_metrics": EVENTS_SKEW_ORACLE,
    "events_heavy_users": EVENTS_HEAVY_USERS_ORACLE,
    "sft_render": SFT_RENDER_ORACLE,
    "sft_loss_spans": SFT_LOSS_SPANS_ORACLE,
    "pipeline_sft": PIPELINE_SFT_ORACLE,
    "sft_pairs": SFT_PAIRS_ORACLE,
    "sft_pairs_str": SFT_PAIRS_STR_ORACLE,
    "sft_pairs_topk": SFT_PAIRS_TOPK_ORACLE,
    "sft_rejection": SFT_REJECTION_ORACLE,
}
