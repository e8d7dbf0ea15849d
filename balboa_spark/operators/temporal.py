"""Temporal operators: as-of join and trailing range-window features.

The reference has no temporal joins (SURVEY §2.6 J2: only the alias
self-join exists), but any event/observation store grows these needs
immediately; they are declared §7 scale-path surface alongside the
window/rollup queries the engine already exposes.

Scale notes (100 TB):
- asof_join is SORT-BASED: both sides are tagged and unioned, one
  shuffle on the join keys, then a per-partition ordered forward-fill
  (last non-null) — the classic merge-join formulation of as-of. No
  range cross-join, no per-row binary search, state bounded by the
  partition. Skewed keys behave like any other shuffle key (AQE skew
  handling applies).
- trailing_window uses a RANGE frame over epoch-microseconds: Spark
  evaluates it with a sliding two-pointer over each sorted partition,
  O(n) amortized per key — the hypertable "continuous rollup" access
  pattern without a second table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    prefix: str = "r_",
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the LAST right row with the same keys
    and ``right_ts <= left_ts`` (inclusive, DuckDB/pandas ``merge_asof``
    backward semantics). Left rows with no prior right row keep nulls
    (left-join behavior).

    Output: every left column, plus each non-key right column renamed
    ``{prefix}{col}``.

    ``tiebreak``: right-side column ordering rows that share an exact
    timestamp (last one wins), making the match deterministic when
    (keys, right_ts) is not unique.

    Implementation: tagged union + one window pass. Right rows sort
    BEFORE left rows at an equal timestamp, so the inclusive bound
    falls out of the sort order; ``last(_payload, ignorenulls)`` over
    rows-unbounded-preceding is the forward fill.
    """
    on = list(on)
    payload_cols = [c for c in right.columns if c not in on]
    payload = F.struct(*[F.col(c) for c in payload_cols])
    tieb = (
        F.col(tiebreak)
        if tiebreak is not None
        else F.lit(0).cast("long")
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        tieb.cast("long").alias("_tie"),
        payload.alias("_payload"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("_lrow"),
    )
    payload_type = dict(zip(r.columns, [f.dataType for f in r.schema.fields]))["_payload"]
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tie"),
        F.lit(None).cast(payload_type).alias("_payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).withColumn(
        "_m", F.last("_payload", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_side") == 1).select(
        F.col("_lrow.*"),
        *[F.col(f"_m.{c}").alias(prefix + c) for c in payload_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join: every point row pairs with every
    interval row sharing the keys whose [start, end] (both inclusive)
    contains the point's timestamp — attribution windows, validity
    ranges, maintenance windows.

    Spark has no native range-join strategy: the declarative BETWEEN
    predicate plans as a per-key nested-loop (BroadcastNestedLoopJoin
    or worse), O(|points| x |intervals|) within each key — the 100 TB
    killer. This operator rewrites it as an EQUI-join: each interval
    explodes to the coarse time buckets it covers (ceil(len/bucket)+1
    rows — bounded by interval length), each point maps to its single
    bucket, the join runs on (keys..., bucket) through the ordinary
    shuffled-hash/broadcast machinery (AQE-decided, skew-splittable),
    and the exact BETWEEN residual filters after. A point matches an
    interval in exactly one bucket (its own), so no dedup is needed.

    ``bucket_seconds`` trades interval fan-out against join
    selectivity — set it near the typical interval length. Points and
    intervals keep all their columns; clashing names must be
    disambiguated by the caller.
    """
    on = list(on)
    b_us = int(bucket_seconds) * 1_000_000
    pb = points.withColumn(
        "_b", F.expr(f"unix_micros({point_ts}) div {b_us}")
    )
    ib = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_col}) div {b_us}"),
                F.expr(f"unix_micros({end_col}) div {b_us}"),
            )
        ),
    )
    out = (
        pb.join(ib, on + ["_b"])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("_b")
    )
    return out


def finite_cents(value: Column) -> Column:
    """``round(value * 100)`` as exact integer cents — the module's
    order-independent exactness convention — with a FINITE-guard:
    NaN/±Inf readings (failed sensors, upstream div-by-zero) map to
    NULL instead of an ANSI CAST_OVERFLOW that kills the whole job,
    and aggregates skip them like any NULL. The comparison form
    excludes NaN without isnan(): Spark orders NaN above +Inf, so
    ``value < Inf`` is false for NaN. DuckDB oracles mirror this as
    ``CASE WHEN isfinite(value) THEN CAST(round(value*100) AS BIGINT)
    END``."""
    inf = float("inf")
    return F.when(
        (value > F.lit(-inf)) & (value < F.lit(inf)),
        F.round(value * 100).cast("long"),
    )


def trailing_window(
    keys: Sequence[str], ts_col: str, duration_sec: int
) -> WindowSpec:
    """RANGE frame covering ``[t - duration, t]`` (both ends inclusive)
    per key, ordered by epoch-microseconds — rows with identical
    timestamps are peers and always aggregate together, so results are
    deterministic under any shuffle order.

    The order key is cast to TIMESTAMP first: parquet written without
    the UTC-adjusted flag reads as TIMESTAMP_NTZ, which unix_micros
    rejects. With the session timezone pinned UTC the cast is value-
    preserving, so both physical source types produce the same frame.
    """
    return (
        Window.partitionBy(*keys)
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
        .rangeBetween(-duration_sec * 1_000_000, 0)
    )


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel completion per user: for steps (s1, s2, ... sk),
    t1 = first s1 event, t2 = first s2 event STRICTLY after t1, and so
    on. Output: one row per user having any step event, with nullable
    t1..tk — strictly-increasing timestamps by construction, so
    conversion counts/latencies are one aggregation away.

    Plan shape: filter to step events -> ONE shuffle (groupBy user) ->
    per-user ordered fold over the collected event array (the funnel
    recurrence is sequential per user, which a fold expresses without a
    k-way self-join; the DuckDB oracle is the k-level correlated-CTE
    form). Per-user state is that user's step events only; a
    pathologically hot user is bounded by its own event count, and the
    strict '>' step condition makes results independent of tie order.
    """
    k = len(steps)
    if k == 0:
        raise ValueError("funnel needs at least one step")
    evs = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_tp"),
    )
    per_user = evs.groupBy(user_col).agg(
        F.sort_array(F.collect_list(F.struct("_ts", "_tp"))).alias("_seq")
    )
    steps_arr = F.array(*[F.lit(s) for s in steps])
    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])

    def fold(acc, x):
        # stage i completes at this event iff it is still open, the
        # event has stage i's type, and the previous stage completed
        # strictly earlier (F.get is 0-based and null-safe at -1, so
        # the i=0 branch needs no special casing beyond the OR)
        return F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.when(F.get(acc, i).isNotNull(), F.get(acc, i))
            .when(
                (x["_tp"] == F.get(steps_arr, i))
                & ((i == F.lit(0)) | (x["_ts"] > F.get(acc, i - 1))),
                x["_ts"],
            )
            .otherwise(F.lit(None).cast("timestamp")),
        )

    done = per_user.select(
        F.col(user_col), F.aggregate("_seq", init, fold).alias("_st")
    )
    return done.select(
        F.col(user_col),
        *[F.get("_st", i).alias(f"t{i + 1}") for i in range(k)],
    )


def rolling_features(
    df: DataFrame,
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    duration_sec: int = 3600,
) -> DataFrame:
    """Per-event trailing-window features: how many events, and how
    much accumulated value, this key produced in the window ending at
    this event (inclusive).

    The value sum is carried as integer CENTS (``round(value*100)``)
    so it is order-independent and hash-exact across engines — float
    accumulation order differs between Spark's running frame and
    DuckDB's segment tree.
    """
    w = trailing_window(keys, ts_col, duration_sec)
    cents = finite_cents(F.col(value_col))
    return df.select(
        "*",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum(cents).over(w).alias("sum_value_cents_trailing"),
    )


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event, and each (cohort, offset) cell counts the
    distinct users from that cohort active ``offset`` periods later.

    Periods are integer epoch buckets (floor(epoch_sec / (86400 * p)))
    rather than calendar weeks — timezone- and week-start-free, so the
    result is identical across engines and cluster timezones.

    Output: (cohort_period, period_offset, n_users), offset >= 0.

    Plan shape: ONE shuffle computes each user's first period (groupBy
    min — map-side combined), the events then join that narrow
    (user, cohort) relation on the user key (AQE picks broadcast only
    if the user dimension is truly small; otherwise a co-partitioned
    shuffle join), and ONE more shuffle aggregates the distinct-user
    counts. No window over the raw event stream, no per-user arrays.
    """
    period = F.floor(
        F.unix_timestamp(F.col(ts_col).cast("timestamp")) / (86400 * period_days)
    )
    first = events.groupBy(user_col).agg(
        F.min(period).alias("cohort_period")
    )
    return (
        events.select(F.col(user_col), period.alias("_p"))
        .join(first, user_col)
        .groupBy(
            "cohort_period",
            (F.col("_p") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def anomaly_scores(
    df: DataFrame,
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    duration_sec: int = 3600,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-event anomaly score: how far this event's value sits from
    its key's TRAILING-window distribution (population z-score over
    the window ending at the event, inclusive). Window n == 1 or zero
    variance yields a null z (no distribution to deviate from).

    Output: every input column plus (n_window, z, is_anomaly with
    |z| >= z_threshold).

    All window aggregates are INTEGER-cents sums (value*100 and its
    square), so mean/variance derive from exact integers and the
    rounded z is hash-identical across engines — the same trick as
    rolling_features, extended to second moments. Same O(n)-per-key
    sliding RANGE frame; no second pass, no self-join.

    Supported value range: the squared-cents sum runs in exact
    decimal(38,0) (DuckDB: HUGEINT) — cents itself is a 64-bit long
    (|value| ≤ ~9e16) and cents² ≤ ~8.5e37 fits the 38-digit
    accumulator at any realistic window size. A previous long-typed
    s2 bounded |value| at ~3e7 and, worse, one out-of-range event
    KILLED the whole job with an ANSI multiply overflow (found by the
    adversarial-fixture audit planting value=1e15) — at 100 TB a
    single absurd sensor reading must not be a job-stopper.
    """
    w = trailing_window(keys, ts_col, duration_sec)
    cents = finite_cents(F.col(value_col))
    c38 = cents.cast("decimal(38,0)")
    n = F.count(F.lit(1)).over(w)
    # moments divide by the count of USABLE readings, not the window
    # row count: an unreadable (NULL/non-finite) value contributes
    # nothing to s1/s2 and must not dilute the mean toward zero —
    # n_window still reports every event in the window
    nv = F.count(cents).over(w)
    s1 = F.sum(c38).over(w)  # wide too: a window of near-max cents must not overflow the sum
    s2 = F.sum(c38 * c38).over(w)
    mean = s1.cast("double") / nv
    var = (s2.cast("double") - s1.cast("double") * s1 / nv) / nv
    std = F.sqrt(var)
    # guard on var > 0, NOT std > 0: float cancellation can drive var
    # epsilon-negative, where sqrt gives NaN and Spark's NaN ordering
    # evaluates NaN > 0 as TRUE — emitting z = NaN where the oracle's
    # var-gated form emits NULL (hash mismatch on near-constant windows)
    z = F.when((nv > 1) & (var > 0), F.round((cents - mean) / std, 4))
    return df.select(
        "*",
        n.alias("n_window"),
        z.alias("z"),
        (F.abs(z) >= z_threshold).alias("is_anomaly"),
    )


def resample_events(
    df: DataFrame,
    step: int = 86400,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    fill: str = "zero",
) -> DataFrame:
    """Fixed-interval downsampling WITH gap generation: bucket each
    key's events into ``step``-second intervals over that key's own
    [min, max] span, emitting EMPTY buckets for the gaps — the
    regular-grid series every charting/feature pipeline needs, which
    a plain groupBy can never produce (it has no rows to group where
    nothing happened).

    Output: (key, bucket_start [epoch seconds], n_events, sum_cents)
    ordered-safe for hashing; values are integer cents (the module's
    order-independent exactness convention). ``fill="zero"`` leaves
    empty buckets at 0; ``fill="ffill"`` carries the last non-empty
    bucket's sum forward (a step-function resample — gauge-style
    metrics), leading gaps 0.

    Plan shape: one groupBy for the bucket aggregates, one
    keys-sized groupBy for the spans, a per-key ``sequence`` explode
    for the grid (grid size = span/step per key — RESOLUTION-bounded,
    the caller's step choice, never event-count-bounded), and one
    grid-keyed left join. The ffill arm adds a per-key ordered window
    over the grid — bounded by the same resolution, the
    rolling_features risk class, not a content-skew window. Bucket
    index is integer FLOOR-division arithmetic on unix micros (no
    double division near bucket edges, and no double-precision loss
    at micros magnitude): BOTH Spark's ``div`` and DuckDB's integer
    ``//`` truncate toward zero (measured: -30 // 86400 = 0 in
    DuckDB), so each side subtracts its positive mod first —
    ``(x - pmod(x, s)) div s`` here, ``(x - ((x%s)+s)%s) // s`` in
    the oracle — making the dividend an exact multiple, where
    truncation equals floor for either sign (r13 ADVICE fix,
    completed on the oracle side by the adversarial-fixture audit:
    a pre-1970 event shifted one bucket between engines)."""
    if step < 1:
        raise ValueError(f"step must be >= 1 second, got {step}")
    if fill not in ("zero", "ffill"):
        raise ValueError(f"fill must be 'zero' or 'ffill', got {fill!r}")
    step_us = int(step) * 1_000_000
    fdiv = (
        f"((unix_micros({ts_col}) - pmod(unix_micros({ts_col}), {step_us}))"
        f" div {step_us})"
    )
    b = F.expr(fdiv)
    cents = finite_cents(F.col(value_col))
    agg = (
        df.select(F.col(key_col), b.alias("_b"), cents.alias("_c"))
        .groupBy(key_col, "_b")
        .agg(
            F.count(F.lit(1)).alias("_n"), F.sum("_c").alias("_s")
        )
    )
    # endpoints use the SAME integer floor-div as the bucket index — a
    # double division could round up across an integer boundary and
    # silently drop the min/max event's bucket from the grid
    span = df.groupBy(key_col).agg(
        F.expr(f"min({fdiv})").alias("_lo"),
        F.expr(f"max({fdiv})").alias("_hi"),
    )
    grid = span.select(
        F.col(key_col), F.explode(F.sequence("_lo", "_hi")).alias("_b")
    )
    out = grid.join(agg, [key_col, "_b"], "left")
    if fill == "ffill":
        w = (
            Window.partitionBy(key_col)
            .orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = F.last("_s", ignorenulls=True).over(w)
    else:
        filled = F.col("_s")
    return out.select(
        F.col(key_col),
        (F.col("_b") * step).cast("long").alias("bucket_start"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
        F.coalesce(filled, F.lit(0)).cast("long").alias("sum_cents"),
    )


#: Process-wide default arm for :func:`gap_sessions` (and everything
#: that rides it: conversation_turns, the sft chain). "adaptive" runs
#: ONE probe aggregation job at plan-BUILD time (gap_sessions is not
#: fully lazy in that mode — r15 ADVICE); latency-sensitive
#: deployments that know their key distribution can set this to
#: "classic" or "two_phase" once instead of threading mode= through
#: every call site.
DEFAULT_SESSION_MODE = "adaptive"


def gap_sessions(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
    bucket_minutes: int = 24 * 60,
    sess_col: str = "conv_id",
    with_turn_idx: bool = False,
    mode: str | None = None,
    heavy_user_rows: int = 1_000_000,
) -> DataFrame:
    """Gap-rule sessionization. Three plan arms, identical numbering
    (parity pinned both ways in tests/test_temporal.py):

    - ``mode="classic"``: the single lag+cumsum window per user —
      one shuffle, the cheapest plan, but one mega-user (a bot with
      10^8 events) is a single window partition AQE cannot split;
    - ``mode="two_phase"``: the gaps-and-islands decomposition below —
      skew-immune (heaviest partition = one user's day-bucket), at a
      measured ~2x local cost on FLAT data (extra summary shuffles +
      the join-back; r14 bench, sft_assembly 2.45 -> 5.22s);
    - ``mode="adaptive"`` (the default via the module-level
      ``DEFAULT_SESSION_MODE``; pass mode= or set that global to opt
      latency-sensitive call sites out): ONE probe aggregation over the
      user column (``plans/skew.key_counts`` -> max, map-side
      combined, shuffle volume = distinct users) picks the arm: the
      classic window when no user exceeds ``heavy_user_rows``
      (insurance the data doesn't need), the two-phase otherwise.
      The probe runs a job at PLAN-BUILD time — gap_sessions in
      adaptive mode is not fully lazy. ``heavy_user_rows`` defaults
      to 1M: a 1M-row sorted window partition is a comfortable
      single task; beyond it the unsplittable-partition risk
      outweighs the two-phase overhead.

    The two-phase arm: no per-user unbounded window anywhere (the r13
    verdict's one remaining unsplittable-partition shape at 100x
    scale: one bot / service account with 10^8 events is a single
    window partition the classic lag+cumsum formulation cannot split
    and AQE cannot save).

    Semantics are EXACTLY the classic single-window rule: a new
    session starts when the previous event of the same ``user_col``
    (ordered by ``ts_col, *order_cols``) is more than ``gap_minutes``
    older; ``sess_col`` is the 1-based cumulative session index per
    user; ``with_turn_idx`` adds the 1-based position within the
    session. NULL ``ts_col`` rows are excluded by contract (an
    unstamped event cannot be ordered; Spark sorts NULLs FIRST and
    DuckDB LAST, so letting one through diverges engines).

    The decomposition (the pack_sequences distributed-prefix-sum
    pattern applied to gaps-and-islands):

    1. events bucket by integer FLOOR-division of unix micros into
       ``bucket_minutes`` spans (the resample_events idiom — exact at
       any timestamp sign/magnitude);
    2. LOCAL sessionization per (user, bucket): lag + running sum
       windows partitioned by BOTH keys — the heaviest partition is
       one user's single bucket, not their history;
    3. a per-(user, bucket) SUMMARY relation (first/last ts, local
       session count) — one row per bucket with events, so the
       per-user stitch windows below run over a bucket-count-sized
       relation (a 10^8-event bot at daily buckets is ~365 rows);
    4. boundary stitch: bucket b's first local session merges with
       bucket b-1's last iff the boundary gap is within
       ``gap_minutes`` (chains transitively through single-session
       buckets); the global id is
       offset(b) + local_id - attach(b), with offset(b) the exclusive
       prefix sum of (local_count - attach) over earlier buckets —
       identical numbering to the single-window cumsum;
    5. turn_idx, when requested, two-phases the same way: local
       row_number per (user, bucket, session) + the exclusive prefix
       of per-bucket session row counts over the summary-sized
       (user, session, bucket) relation.

    Every window in the plan is partitioned by (user, bucket) over
    events or by user over the SUMMARY relation; the events-side
    exchange on (user, bucket) is reused between the local and
    summary branches (same subtree). Choose ``bucket_minutes`` so one
    user-bucket fits an executor task (default: 1 day).
    """
    if gap_minutes < 1:
        raise ValueError(f"gap_minutes must be >= 1, got {gap_minutes}")
    if bucket_minutes < gap_minutes:
        raise ValueError(
            f"bucket_minutes ({bucket_minutes}) must be >= gap_minutes "
            f"({gap_minutes}) so a boundary merge only ever looks one "
            "present bucket back"
        )
    if mode is None:
        mode = DEFAULT_SESSION_MODE
    if mode not in ("adaptive", "classic", "two_phase"):
        raise ValueError(
            f"mode must be adaptive|classic|two_phase, got {mode!r}"
        )
    if mode == "adaptive":
        from balboa_spark.plans.skew import key_counts

        probe = events.filter(F.col(ts_col).isNotNull()).select(user_col)
        row = key_counts(probe, [user_col]).agg(F.max("n")).first()
        worst = row[0] or 0
        mode = "classic" if worst <= int(heavy_user_rows) else "two_phase"
    if mode == "classic":
        order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
        gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTE")
        w = Window.partitionBy(user_col).orderBy(*order)
        lag_ts = F.lag(ts_col).over(w)
        out = (
            events.filter(F.col(ts_col).isNotNull())
            .withColumn(
                "_new",
                F.when(
                    lag_ts.isNull() | (F.col(ts_col) > lag_ts + gap),
                    F.lit(1),
                ).otherwise(F.lit(0)),
            )
            .withColumn(
                sess_col,
                F.sum("_new")
                .over(w.rowsBetween(Window.unboundedPreceding, 0))
                .cast("bigint"),
            )
            .drop("_new")
        )
        if with_turn_idx:
            out = out.withColumn(
                "turn_idx",
                F.row_number().over(
                    Window.partitionBy(user_col, sess_col).orderBy(*order)
                ),
            )
        return out
    bucket_us = int(bucket_minutes) * 60_000_000
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTE")
    x = f"unix_micros(cast({ts_col} as timestamp))"
    bkt = F.expr(f"(({x} - pmod({x}, {bucket_us})) div {bucket_us})")

    ev = events.filter(F.col(ts_col).isNotNull()).withColumn("_bkt", bkt)
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    wl = Window.partitionBy(user_col, "_bkt").orderBy(*order)
    lag_ts = F.lag(ts_col).over(wl)
    ev = ev.withColumn(
        "_new",
        F.when(lag_ts.isNull() | (F.col(ts_col) > lag_ts + gap), F.lit(1))
        .otherwise(F.lit(0)),
    ).withColumn(
        "_loc",
        F.sum("_new").over(wl.rowsBetween(Window.unboundedPreceding, 0)),
    )
    if with_turn_idx:
        # local row_number per (user, bucket, LOCAL session) computed
        # on ev BEFORE any join: the (user, _bkt) hash exchange already
        # satisfies the finer clustering (partitioning on a prefix of
        # the keys), so this costs a sort extension, not a shuffle —
        # and it keeps every turn-idx input derivable from the single
        # checkpointed relation below
        wlr = Window.partitionBy(user_col, "_bkt", "_loc").orderBy(*order)
        ev = ev.withColumn("_lrn", F.row_number().over(wlr))
    # The aggregate branches (bucket summary, turn-idx before-counts)
    # read only a SLIM projection of the windowed relation — keys, ts,
    # session flags — never the wide payload columns. Keeping them on
    # a separate slim subtree means the wide relation computes exactly
    # once (inside the final join-back). Checkpointing was measured
    # and REJECTED here: materializing the wide rows cost 3x the
    # recompute (content strings), and even the slim checkpoint was a
    # wash against simply recomputing the cheap projected subtree.
    slim = ev.select(user_col, "_bkt", "_loc", "_new", ts_col)

    ws = Window.partitionBy(user_col).orderBy("_bkt")
    prev_last = F.lag("_last").over(ws)
    summ = (
        slim.groupBy(user_col, "_bkt")
        .agg(
            F.min(ts_col).alias("_first"),
            F.max(ts_col).alias("_last"),
            F.sum("_new").alias("_ns"),
        )
        .withColumn(
            "_att",
            F.when(
                prev_last.isNotNull() & (F.col("_first") <= prev_last + gap),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
    )
    summ = summ.select(
        user_col,
        "_bkt",
        "_att",
        F.coalesce(
            F.sum(F.col("_ns") - F.col("_att")).over(
                ws.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
    )
    if not with_turn_idx:
        out = ev.join(summ, [user_col, "_bkt"]).withColumn(
            sess_col,
            (F.col("_off") + F.col("_loc") - F.col("_att")).cast("bigint"),
        )
        return out.drop("_bkt", "_new", "_loc", "_att", "_off")

    # turn-idx path: fold the stitch scalars AND the before-counts
    # (turns in earlier buckets of the same global session) into ONE
    # per-(user, bucket, local-session) relation, so the wide events
    # relation joins exactly once. The before-counts are the exclusive
    # prefix sum of per-bucket local-session row counts over the
    # summary-sized relation, keyed by the same global-id formula.
    wcs = (
        Window.partitionBy(user_col, "_sess")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stitch = (
        slim.groupBy(user_col, "_bkt", "_loc")
        .agg(F.count(F.lit(1)).alias("_cn"))
        .join(summ, [user_col, "_bkt"])
        .withColumn(
            "_sess",
            (F.col("_off") + F.col("_loc") - F.col("_att")).cast("bigint"),
        )
        .select(
            user_col,
            "_bkt",
            "_loc",
            "_sess",
            F.coalesce(F.sum("_cn").over(wcs), F.lit(0)).alias("_tb"),
        )
    )
    out = (
        ev.join(stitch, [user_col, "_bkt", "_loc"])
        .withColumn(sess_col, F.col("_sess"))
        .withColumn("turn_idx", (F.col("_tb") + F.col("_lrn")).cast("int"))
    )
    return out.drop("_bkt", "_new", "_loc", "_sess", "_lrn", "_tb")
