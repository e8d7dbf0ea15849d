"""SFT (instruction-tuning) data assembly: event streams -> threaded
conversations -> chat-template rendering -> loss-mask spans.

Pretraining gets documents; post-training gets CONVERSATIONS. The
assembly pipeline every SFT data build runs is (1) thread raw
interaction logs into ordered per-session turns, (2) render each
conversation through a chat template (role tags + end-of-turn
markers), (3) compute which character/token spans the loss applies to
(assistant turns only — user/system turns are context, not target).
This module does all three relationally:

- `conversation_turns`: sessionize (gap rule) + row_number per
  conversation. All windows are partitioned by user/conversation —
  key-bounded by per-user activity, never corpus-wide (the unbounded
  content-keyed window class dedup.py eliminated stays banned here).
- `render_conversations`: per-conversation template render via
  sort_array(collect_list(struct(...))) + aggregate/concat — one
  shuffle with map-side combine, rendered text stays distributed
  (never collected). A conversation's turn list is bounded by the
  session gap rule, so the per-group array is session-sized, not
  corpus-sized — same boundedness contract as pack_sequences' per-doc
  fragment arrays.
- `loss_mask_spans`: per-turn [start, end) character offsets of each
  turn's CONTENT inside the rendered string, via an exclusive
  cumulative sum of rendered piece lengths over the per-conversation
  window. Offsets are codepoint-based (Spark `length` == DuckDB
  `length` on VARCHAR), so a downstream tokenizer with byte offsets
  must convert — documented, not hidden.

Scale: at 100 TB of logs the only shuffles are the per-user session
window and the per-conversation groupBy — both partition on high-
cardinality keys (users/conversations), both AQE-splittable. No
driver-side state, no UDFs (the whole path is JVM codegen).

Chat template (fixed, ChatML-like): every turn renders as
``<|role|>content<|end|>``; an optional system preamble renders as a
turn 0 with role ``system``. Roles alternate user/assistant by turn
parity — real logs carry explicit roles; the alternation default
exists so raw event streams (no role column) still thread into a
usable transcript, and any `role_col` overrides it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ROLE_OPEN = "<|"
ROLE_CLOSE = "|>"
END_TAG = "<|end|>"


def _tag(role: Column) -> Column:
    return F.concat(F.lit(ROLE_OPEN), role, F.lit(ROLE_CLOSE))


def conversation_turns(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple = ("event_id",),
    content_col: Column | None = None,
    role_col: str | None = None,
    session_mode: str | None = None,
    heavy_user_rows: int = 1_000_000,
) -> DataFrame:
    """(user_id, conv_id, turn_idx, role, content, ts) — one row per
    turn, conversations split on > gap_minutes of inactivity.

    conv_id is the cumulative count of gap-breaks per user; turn_idx
    is 1-based within the conversation, ordered by
    (ts, *order_cols) so exact timestamp ties are deterministic.
    content defaults to ``event_type`` + ' ' + ``coalesce(props, '')``
    with explicit coalesce on BOTH engines (concat propagates NULL in
    DuckDB but concat_ws silently drops it in Spark — the parity
    trap).

    Scale shape (r14, adaptive since r15): the threading runs through
    ``temporal.gap_sessions`` in its default ADAPTIVE mode — one
    user-counts probe picks the classic per-user lag+cumsum window on
    flat data (no two-phase overhead when no user is heavy) and the
    TWO-PHASE gaps-and-islands plan (per-(user, day-bucket) local
    windows + a bucket-summary stitch) when any user exceeds the
    heavy threshold, so one heavy user (a 10^8-event bot) is never a
    single unsplittable window partition. Numbering is identical
    either way."""
    # NULL timestamps are excluded by contract (gap_sessions enforces
    # it too): an unstamped event cannot be ordered into a
    # conversation, and Spark windows sort NULLs FIRST while DuckDB
    # sorts them LAST — letting one through silently diverges engines
    from balboa_spark.operators.temporal import gap_sessions

    if content_col is None:
        content_col = F.concat(
            F.col("event_type"), F.lit(" "), F.coalesce(F.col("props"), F.lit(""))
        )
    base = events.filter(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        *[F.col(c) for c in order_cols],
        content_col.alias("content"),
        *( [F.col(role_col).alias("_role")] if role_col else [] ),
    )
    turns = gap_sessions(
        base,
        gap_minutes=gap_minutes,
        user_col="user_id",
        ts_col="ts",
        order_cols=order_cols,
        with_turn_idx=True,
        mode=session_mode,
        heavy_user_rows=heavy_user_rows,
    )
    role = (
        F.col("_role")
        if role_col
        else F.when(F.col("turn_idx") % 2 == 1, F.lit("user")).otherwise(
            F.lit("assistant")
        )
    )
    return turns.select(
        "user_id",
        "conv_id",
        "turn_idx",
        role.alias("role"),
        "content",
        "ts",
    )


def _piece(role: Column, content: Column) -> Column:
    """One turn's rendered chunk: <|role|>content<|end|>."""
    return F.concat(_tag(role), content, F.lit(END_TAG))


def render_conversations(
    turns: DataFrame,
    system_prompt: str | None = None,
) -> DataFrame:
    """One row per conversation: the rendered transcript plus the
    loss-accounting aggregates an SFT packer needs up front.

    Columns: user_id, conv_id, n_turns, rendered, total_chars,
    assistant_chars (sum of assistant CONTENT codepoints — the
    loss-bearing mass), assistant_turns.

    The render is sort_array over a per-conversation collect_list of
    (turn_idx, piece) structs — deterministic regardless of physical
    row order — then one array-concat. No window, one shuffle."""
    piece = _piece(F.col("role"), F.col("content"))
    sys_piece = (
        _piece(F.lit("system"), F.lit(system_prompt)) if system_prompt else None
    )
    agg = (
        turns.select(
            "user_id",
            "conv_id",
            F.struct(F.col("turn_idx"), piece.alias("piece")).alias("tp"),
            F.col("role"),
            F.length("content").alias("content_len"),
        )
        .groupBy("user_id", "conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("tp")), lambda s: s["piece"]
                ),
                "",
            ).alias("body"),
            F.sum(
                F.when(F.col("role") == "assistant", F.col("content_len")).otherwise(
                    F.lit(0)
                )
            ).alias("assistant_chars"),
            F.sum(
                F.when(F.col("role") == "assistant", F.lit(1)).otherwise(F.lit(0))
            ).alias("assistant_turns"),
        )
    )
    rendered = (
        F.concat(sys_piece, F.col("body")) if sys_piece is not None else F.col("body")
    )
    return agg.select(
        "user_id",
        "conv_id",
        "n_turns",
        rendered.alias("rendered"),
        F.length(rendered).alias("total_chars"),
        "assistant_chars",
        "assistant_turns",
    )


def loss_mask_spans(
    turns: DataFrame,
    system_prompt: str | None = None,
) -> DataFrame:
    """Per-turn [content_start, content_end) codepoint offsets inside
    the rendered transcript, plus loss_mask (1 for assistant turns).

    piece_len(turn) = len('<|'+role+'|>') + len(content) + len(END).
    content_start = prefix + exclusive-cumsum(piece_len) + tag_len;
    the cumsum window is per-conversation ordered by turn_idx —
    key-bounded. A trainer consumes this as (conv, span, mask) and
    never re-scans the rendered text to find the assistant spans."""
    prefix_len = (
        len(ROLE_OPEN + "system" + ROLE_CLOSE) + len(system_prompt) + len(END_TAG)
        if system_prompt
        else 0
    )
    tag_len = F.length(_tag(F.col("role")))
    piece_len = tag_len + F.length("content") + F.lit(len(END_TAG))
    w = (
        Window.partitionBy("user_id", "conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(piece_len).over(w), F.lit(0)) + F.lit(prefix_len)
    start = before + tag_len
    return turns.select(
        "user_id",
        "conv_id",
        "turn_idx",
        "role",
        start.alias("content_start"),
        (start + F.length("content")).alias("content_end"),
        F.when(F.col("role") == "assistant", F.lit(1))
        .otherwise(F.lit(0))
        .alias("loss_mask"),
    )


def preference_pairs(
    ratings: DataFrame,
    prompt_col: str = "prompt_id",
    prompt_text_col: str | None = None,
    response_col: str = "response",
    score_col: str = "score",
    id_col: str = "response_id",
    system_prompt: str | None = None,
) -> DataFrame:
    """Preference-pair assembly (the DPO/RLHF-reward data shape — the
    SFT family's natural sibling): per prompt, pair the BEST-scored
    response (chosen) with the WORST-scored one (rejected), rendered
    through the same chat template as :func:`render_conversations`.

    Selection is deterministic: chosen = highest ``score_col``, ties
    to the LOWEST ``id_col``; rejected = lowest score, ties to the
    lowest id. Prompts where the best and worst scores are EQUAL are
    dropped (no strict preference exists — emitting an arbitrary pair
    would teach the model a coin flip), which also drops
    single-response prompts. NULL/NaN scores and NULL ids are
    excluded by contract (an unscored response can't be ranked; NaN
    orders differently across engines). ``id_col`` may be integral or
    string (UUIDs straight from a rating log work; string ties break
    on binary UTF-8 order, identical in Spark and DuckDB).

    Scale shape: ONE groupBy per prompt with max_by/min_by over
    (score, id) structs — map-side combined, no per-prompt window,
    no self-join; state per group is two rows regardless of how many
    responses a prompt has. Output columns: prompt_id, chosen_id,
    rejected_id, chosen_score, rejected_score, chosen, rejected
    (rendered transcripts).
    """
    id_type = dict(ratings.dtypes).get(id_col, "")
    if id_type not in ("tinyint", "smallint", "int", "bigint", "string"):
        # the tie-break needs a totally ordered, engine-stable id.
        # Integral and string (binary UTF-8 collation, identical in
        # Spark and DuckDB) qualify; float ids (NaN), binary, or
        # nested ids do not.
        raise ValueError(
            f"preference_pairs: id_col {id_col!r} must be an integral "
            f"or string type (got {id_type!r}) — the deterministic "
            "tie-break orders by it"
        )
    r = ratings.filter(
        F.col(score_col).isNotNull()
        & ~F.isnan(F.col(score_col))
        & F.col(id_col).isNotNull()
        & F.col(prompt_col).isNotNull()
    )
    payload = F.struct(
        F.col(id_col).alias("_id"),
        F.col(score_col).alias("_score"),
        F.col(response_col).alias("_text"),
        *(
            [F.col(prompt_text_col).alias("_prompt")]
            if prompt_text_col
            else []
        ),
    )
    # min over (-score, id): highest score, ties -> lowest id;
    # min over (score, id): lowest score, ties -> lowest id.
    # Negating the SCORE (always numeric) instead of the id keeps the
    # id column free to be a string — production rating logs carry
    # UUID response ids (r15 verdict gap #2).
    best = F.min_by(payload, F.struct(-F.col(score_col), F.col(id_col)))
    worst = F.min_by(payload, F.struct(F.col(score_col), F.col(id_col)))
    g = r.groupBy(F.col(prompt_col).alias("prompt_id")).agg(
        best.alias("_c"), worst.alias("_r")
    )
    g = g.filter(F.col("_c._score") > F.col("_r._score"))
    sys_piece = (
        _piece(F.lit("system"), F.lit(system_prompt)) if system_prompt else None
    )

    def render(which: str) -> Column:
        prompt_txt = (
            F.col(f"{which}._prompt")
            if prompt_text_col
            else F.col("prompt_id").cast("string")
        )
        body = F.concat(
            _piece(F.lit("user"), prompt_txt),
            _piece(F.lit("assistant"), F.col(f"{which}._text")),
        )
        return F.concat(sys_piece, body) if sys_piece is not None else body

    return g.select(
        "prompt_id",
        F.col("_c._id").alias("chosen_id"),
        F.col("_r._id").alias("rejected_id"),
        F.col("_c._score").alias("chosen_score"),
        F.col("_r._score").alias("rejected_score"),
        render("_c").alias("chosen"),
        render("_r").alias("rejected"),
    )


def rejection_sample(
    ratings: DataFrame,
    threshold: float,
    k: int = 1,
    prompt_col: str = "prompt_id",
    prompt_text_col: str | None = None,
    response_col: str = "response",
    score_col: str = "score",
    id_col: str = "response_id",
    system_prompt: str | None = None,
    salt_partitions: int = 16,
) -> DataFrame:
    """Rejection-sampling selection (the RFT/STaR/best-of-n data
    shape): per prompt, keep the top-``k`` responses whose score
    clears ``threshold``, rendered through the chat template — the
    positive-only sibling of :func:`preference_pairs` (DPO wants a
    contrast pair; rejection finetuning wants only the accepted
    completions).

    Ranking is deterministic: score desc, ties to the LOWEST
    ``id_col``. NULL/NaN scores and NULL ids are excluded by contract.

    Scale shape: a salted TWO-STAGE top-k, because ``collect_list``
    has no partial aggregation — a single-stage groupBy would land a
    hot prompt's entire surviving response list in one reducer (a
    best-of-n sweep over one viral prompt is exactly that shape).
    Stage 1 groups on (prompt, md5-salt) and keeps each salt bucket's
    local top-k (deterministic salt — the plans/skew.with_salt rule:
    reshuffle/retry-stable, never rand()); stage 2 merges the
    <= salt_partitions x k survivors per prompt and re-slices. The
    result is IDENTICAL to the single-stage plan (top-k is
    merge-decomposable under the total order), the worst reducer
    holds k x salt_partitions structs per prompt, and the extra
    shuffle moves only stage-1 survivors. Measured: one 2M-response
    hot prompt, threshold below every score — worst-task shuffle rows
    bounded by the salt instead of 2M. No window, no self-join.
    Output: prompt_id, response_id, score, rank (1-based), rendered.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    id_type = dict(ratings.dtypes).get(id_col, "")
    if id_type not in ("tinyint", "smallint", "int", "bigint", "string"):
        raise ValueError(
            f"rejection_sample: id_col {id_col!r} must be an integral "
            f"or string type (got {id_type!r}) — the deterministic rank "
            "sorts on (-score, id), which only needs the id to be "
            "totally ordered and engine-stable"
        )
    r = ratings.filter(
        F.col(score_col).isNotNull()
        & ~F.isnan(F.col(score_col))
        & F.col(id_col).isNotNull()
        & F.col(prompt_col).isNotNull()
        & (F.col(score_col) >= F.lit(float(threshold)))
    )
    # sort key (-score, id): ascending sort_array = score desc, id asc
    entry = F.struct(
        (-F.col(score_col)).alias("_negscore"),
        F.col(id_col).alias("_id"),
        F.col(score_col).alias("_score"),
        F.col(response_col).alias("_text"),
        *(
            [F.col(prompt_text_col).alias("_prompt")]
            if prompt_text_col
            else []
        ),
    )
    salt = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(int(salt_partitions)),
    )
    local = r.groupBy(
        F.col(prompt_col).alias("prompt_id"), salt.alias("_salt")
    ).agg(
        F.slice(F.sort_array(F.collect_list(entry)), 1, int(k)).alias("_lt")
    )
    g = (
        local.select("prompt_id", F.explode("_lt").alias("_e1"))
        .groupBy("prompt_id")
        .agg(
            F.slice(
                F.sort_array(F.collect_list("_e1")), 1, int(k)
            ).alias("_top")
        )
        .select(
            "prompt_id",
            F.posexplode("_top").alias("_rk0", "_e"),
        )
    )
    sys_piece = (
        _piece(F.lit("system"), F.lit(system_prompt)) if system_prompt else None
    )
    prompt_txt = (
        F.col("_e._prompt")
        if prompt_text_col
        else F.col("prompt_id").cast("string")
    )
    body = F.concat(
        _piece(F.lit("user"), prompt_txt),
        _piece(F.lit("assistant"), F.col("_e._text")),
    )
    rendered = F.concat(sys_piece, body) if sys_piece is not None else body
    return g.select(
        "prompt_id",
        F.col("_e._id").alias("response_id"),
        F.col("_e._score").alias("score"),
        (F.col("_rk0") + 1).cast("int").alias("rank"),
        rendered.alias("rendered"),
    )


def preference_pairs_topk(
    ratings: DataFrame,
    k: int = 4,
    min_margin: float = 0.0,
    prompt_col: str = "prompt_id",
    prompt_text_col: str | None = None,
    response_col: str = "response",
    score_col: str = "score",
    id_col: str = "response_id",
    system_prompt: str | None = None,
    salt_partitions: int = 16,
) -> DataFrame:
    """Bounded ALL-PAIRS preference assembly (the K-way-ranking DPO
    data shape, r16): where :func:`preference_pairs` emits one
    best-vs-worst pair per prompt, real rating logs carry K scored
    responses and standard DPO datasets expand every strict
    preference among them. Unbounded all-pairs is quadratic in
    responses-per-prompt (a 2M-response viral prompt would emit 4e12
    rows), so this operator emits the top-``k`` chosen candidates x
    bottom-``k`` rejected candidates per prompt — at most k^2 pairs —
    keeping only pairs with ``chosen_score > rejected_score +
    min_margin`` (``min_margin`` drops near-tie pairs that teach the
    reward model noise).

    Ranking is deterministic (score then id — string or integral ids,
    the r16 preference-family convention). Scale shape: ONE salted
    TWO-STAGE aggregation produces BOTH candidate lists (the
    rejection_sample de-skew: stage 1 caps each (prompt, md5-salt)
    bucket at k per side, stage 2 merges <= salt_partitions x k
    survivors); the k x k expansion is a row-LOCAL cross of two
    k-bounded arrays on the merged prompt row — no self-join, no
    window, no additional shuffle. Output: prompt_id, chosen_id,
    rejected_id, chosen_score, rejected_score, chosen_rank (1-based
    among chosen candidates), rejected_rank (1-based among rejected,
    worst first), chosen, rejected (rendered).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    id_type = dict(ratings.dtypes).get(id_col, "")
    if id_type not in ("tinyint", "smallint", "int", "bigint", "string"):
        raise ValueError(
            f"preference_pairs_topk: id_col {id_col!r} must be an "
            f"integral or string type (got {id_type!r})"
        )
    r = ratings.filter(
        F.col(score_col).isNotNull()
        & ~F.isnan(F.col(score_col))
        & F.col(id_col).isNotNull()
        & F.col(prompt_col).isNotNull()
    )
    payload = [
        F.col(id_col).alias("_id"),
        F.col(score_col).alias("_score"),
        F.col(response_col).alias("_text"),
        *(
            [F.col(prompt_text_col).alias("_prompt")]
            if prompt_text_col
            else []
        ),
    ]
    # ascending sort_array over (-score, id) = best first;
    # over (score, id) = worst first — both string-id safe
    top_e = F.struct((-F.col(score_col)).alias("_neg"), *payload)
    bot_e = F.struct(F.col(score_col).alias("_pos"), *payload)
    salt = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(int(salt_partitions)),
    )
    local = r.groupBy(
        F.col(prompt_col).alias("prompt_id"), salt.alias("_salt")
    ).agg(
        F.slice(F.sort_array(F.collect_list(top_e)), 1, int(k)).alias("_lt"),
        F.slice(F.sort_array(F.collect_list(bot_e)), 1, int(k)).alias("_lb"),
    )
    merged = (
        local.select(
            "prompt_id",
            F.explode(F.arrays_zip("_lt", "_lb")).alias("_z"),
        )
        .select("prompt_id", F.col("_z._lt").alias("_t"), F.col("_z._lb").alias("_b"))
        .groupBy("prompt_id")
        .agg(
            F.slice(
                F.sort_array(F.collect_list("_t")), 1, int(k)
            ).alias("_top"),
            F.slice(
                F.sort_array(F.collect_list("_b")), 1, int(k)
            ).alias("_bot"),
        )
    )
    pairs = merged.select(
        "prompt_id",
        F.posexplode("_top").alias("_ci0", "_c"),
        "_bot",
    ).select(
        "prompt_id",
        "_ci0",
        "_c",
        F.posexplode("_bot").alias("_ri0", "_r"),
    ).filter(
        (F.col("_c._score") > F.col("_r._score") + F.lit(float(min_margin)))
        & (F.col("_c._id") != F.col("_r._id"))
    )
    sys_piece = (
        _piece(F.lit("system"), F.lit(system_prompt)) if system_prompt else None
    )

    def render(which: str) -> Column:
        prompt_txt = (
            F.col(f"{which}._prompt")
            if prompt_text_col
            else F.col("prompt_id").cast("string")
        )
        body = F.concat(
            _piece(F.lit("user"), prompt_txt),
            _piece(F.lit("assistant"), F.col(f"{which}._text")),
        )
        return F.concat(sys_piece, body) if sys_piece is not None else body

    return pairs.select(
        "prompt_id",
        F.col("_c._id").alias("chosen_id"),
        F.col("_r._id").alias("rejected_id"),
        F.col("_c._score").alias("chosen_score"),
        F.col("_r._score").alias("rejected_score"),
        (F.col("_ci0") + 1).cast("int").alias("chosen_rank"),
        (F.col("_ri0") + 1).cast("int").alias("rejected_rank"),
        render("_c").alias("chosen"),
        render("_r").alias("rejected"),
    )
