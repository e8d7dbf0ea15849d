"""Additional driver queries closing out the §2.12 operator contract
and exposing the general OLAP surface Spark gives the engine for free
(SURVEY §2.4 note: grouping/window/join operators beyond the
reference's own).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from balboa_spark.obsmap import OBS_SQL, with_agg_cte, with_obs_cte
from balboa_spark.operators.aggregate import aggregate, merge_increment
from balboa_spark.session import load_tables


def _obs(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("events",))
    return spark.sql(OBS_SQL)


# --- §2.12 #4: incremental re-aggregation invariant ------------------------

def q_agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge(agg(batch even), batch odd) — oracle is the one-shot
    aggregate, so the driver verifies the associativity law itself."""
    obs = _obs(spark, sf_dir)
    b1 = obs.filter(F.col("event_id") % 2 == 0)
    b2 = obs.filter(F.col("event_id") % 2 == 1)
    return merge_increment(aggregate(b1), b2).select(
        "rrname", "sensor_id", "rrtype", "rdata", "count", "first_seen", "last_seen"
    )


AGG_INCREMENTAL_ORACLE = with_agg_cte(
    "SELECT rrname, sensor_id, rrtype, rdata, count, first_seen, last_seen FROM observations"
)


# --- §2.12 #2: explode of array and map columns ----------------------------

def q_explode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + explode (the P1/P2 flatMap shape) expressed
    over events: each event becomes 2 rows (start/end markers)."""
    load_tables(spark, sf_dir, names=("events",))
    return spark.sql(
        """
        SELECT event_id, marker, value
        FROM (SELECT event_id, value, array('start', 'end') AS markers FROM events)
        LATERAL VIEW explode(markers) AS marker
        """
    ).select("event_id", "marker", F.round("value", 2).alias("value"))


EXPLODE_ORACLE = """
SELECT event_id, unnest(['start', 'end']) AS marker, round(value, 2) AS value
FROM events
"""


# --- §2.12 #8: tag-routing partition property ------------------------------

def q_tag_routing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint regex-tag routes over the observation stream; output
    per-route row counts + the total, proving the routes partition the
    input (U3/F1-F4 through the driver gate)."""
    from balboa_spark.streaming.selectors import SelectorRule, compile_selectors, route

    obs = _obs(spark, sf_dir).withColumn("tags", F.array().cast("array<string>"))
    rules = [
        SelectorRule(name="dom0", tags=["t_dom0"], mode="select", patterns=[r"\.dom0\."]),
        SelectorRule(name="rest", tags=["t_rest"], mode="filter", patterns=[r"\.dom0\."]),
    ]
    tagged = compile_selectors(rules)(obs)
    routes = route(tagged, {"dom0": ["t_dom0"], "rest": ["t_rest"]})
    counts = [
        df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(name).alias("route"), "n")
        for name, df in sorted(routes.items())
    ]
    total = tagged.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("total").alias("route"), "n"
    )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out.unionAll(total)


TAG_ROUTING_ORACLE = with_obs_cte(
    """
    SELECT 'dom0' AS route, count(*) AS n FROM input_observations WHERE regexp_matches(rrname, '\\.dom0\\.')
    UNION ALL
    SELECT 'rest', count(*) FROM input_observations WHERE NOT regexp_matches(rrname, '\\.dom0\\.')
    UNION ALL
    SELECT 'total', count(*) FROM input_observations
    """
)


# --- F7: COF projection (API output shape) ---------------------------------

def q_cof_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observation -> COF wire fields with unix-seconds AND rfc3339
    time variants (observation/observation.go:26-37,
    query/query_graphql.go:333-376)."""
    agg = aggregate(_obs(spark, sf_dir))
    return agg.select(
        F.col("rrname"),
        F.col("rrtype"),
        F.col("rdata"),
        F.col("sensor_id"),
        F.col("count"),
        F.unix_timestamp("first_seen").alias("time_first"),
        F.unix_timestamp("last_seen").alias("time_last"),
        F.date_format("first_seen", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("time_first_rfc3339"),
        F.date_format("last_seen", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("time_last_rfc3339"),
    )


COF_ORACLE = with_agg_cte(
    """
    SELECT rrname, rrtype, rdata, sensor_id, count,
           epoch(date_trunc('second', first_seen))::BIGINT AS time_first,
           epoch(date_trunc('second', last_seen))::BIGINT AS time_last,
           strftime(first_seen, '%Y-%m-%dT%H:%M:%SZ') AS time_first_rfc3339,
           strftime(last_seen, '%Y-%m-%dT%H:%M:%SZ') AS time_last_rfc3339
    FROM observations
    """
)


# --- U1: multi-backend union (duplicates preserved) ------------------------

def q_multi_backend_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two 'backends' (A-records store; sensor0-only store) answering
    the same rdata query; results concatenated WITH duplicates
    (db/db_remote.go:133-202, README.md:291-293)."""
    from balboa_spark.operators.query import Query, entries

    agg = aggregate(_obs(spark, sf_dir))
    be1 = agg.filter(F.col("rrtype") == "A")
    be2 = agg.filter(F.col("sensor_id") == "sensor0")
    q = Query(rdata="10.0.0.0", limit=1000)
    return entries(be1, q).unionAll(entries(be2, q)).select(
        "rrname", "sensor_id", "rrtype", "rdata", "count", "first_seen", "last_seen"
    )


MULTI_BACKEND_ORACLE = with_agg_cte(
    """
    SELECT * FROM (
      (SELECT rrname, sensor_id, rrtype, rdata, count, first_seen, last_seen
       FROM observations WHERE rrtype = 'A' AND rdata = '10.0.0.0'
       ORDER BY rrname, sensor_id, rrtype, rdata LIMIT 1000)
      UNION ALL
      (SELECT rrname, sensor_id, rrtype, rdata, count, first_seen, last_seen
       FROM observations WHERE sensor_id = 'sensor0' AND rdata = '10.0.0.0'
       ORDER BY rrname, sensor_id, rrtype, rdata LIMIT 1000)
    )
    """
)


# --- general OLAP surface (joins, windows, scan-agg) -----------------------

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )


TPCH_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join with broadcast dims: order revenue per nation."""
    t = load_tables(spark, sf_dir, names=("orders", "customer", "nation"))
    o, c, n = t["orders"], t["customer"], t["nation"]
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


JOIN_ENRICH_ORACLE = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k: 3 largest orders per customer segment."""
    t = load_tables(spark, sf_dir, names=("orders", "customer"))
    j = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "rk", "o_orderkey", "o_totalprice")
    )


TOPK_PER_GROUP_ORACLE = """
SELECT c_mktsegment, rk, o_orderkey, o_totalprice
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rk <= 3
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute gap rule. The ORACLE replays
    the classic single-window lag + cumulative-sum formulation; the
    ENGINE runs temporal.gap_sessions in ADAPTIVE mode (r15): a
    user-counts probe picks the classic window on flat data and the
    two-phase gaps-and-islands plan — whose heaviest window partition
    is one user's day-bucket, not one user's entire history (the r13
    verdict's named scale-killer) — when any user is heavy. Both arms
    produce identical session numbering (parity pinned in
    tests/test_temporal.py)."""
    from balboa_spark.operators.temporal import gap_sessions

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    s = gap_sessions(
        ev.select("user_id", "ts", "event_id"),
        gap_minutes=30,
        sess_col="session_id",
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


SESSIONIZE_ORACLE = """
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM (
  SELECT user_id, ts,
         cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM events WHERE ts IS NOT NULL
  )
)
GROUP BY user_id, session_id
"""


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup with Spark's window() — the batch twin of
    the Structured Streaming windowed aggregation (same expression works
    on a stream with a watermark; SURVEY §2.9 T3 extension)."""
    load_tables(spark, sf_dir, names=("events",))
    # explicit NULL-ts exclusion: Spark's window() silently drops
    # NULL-ts rows while DuckDB's time_bucket groups them under a NULL
    # bucket — pin the same contract on both sides
    events = spark.table("events").filter(F.col("ts").isNotNull())
    w = F.window("ts", "1 hour")
    return (
        events.groupBy(w, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("ws"),
            F.col("window.end").alias("we"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS we,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events WHERE ts IS NOT NULL
GROUP BY 1, 2, 3
"""


def q_rollup_observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS over the observation fold — the aggregation
    surface the reference lacks and SURVEY §2.4 commits the new engine
    to exposing (per-(rrtype, sensor) counts, per-rrtype subtotals,
    grand total), computed in ONE pass via ROLLUP."""
    load_tables(spark, sf_dir, names=("events",))
    from balboa_spark.obsmap import OBS_SQL

    spark.sql(OBS_SQL).createOrReplaceTempView("input_observations")
    return spark.sql(
        """
        SELECT coalesce(rrtype, '(all)') AS rrtype,
               coalesce(sensor_id, '(all)') AS sensor_id,
               cast(sum(count) AS BIGINT) AS total_count,
               count(*) AS n_rows
        FROM input_observations
        GROUP BY ROLLUP(rrtype, sensor_id)
        """
    )


ROLLUP_ORACLE = with_obs_cte(
    """
    SELECT coalesce(rrtype, '(all)') AS rrtype,
           coalesce(sensor_id, '(all)') AS sensor_id,
           cast(sum(count) AS BIGINT) AS total_count,
           count(*) AS n_rows
    FROM input_observations
    GROUP BY ROLLUP(rrtype, sensor_id)
    """
)


def q_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (median / p90 of event value per
    type) — Spark's sort-based `percentile` matches DuckDB's
    quantile_cont definition (linear interpolation) exactly.

    Scale note: exact percentiles sort each group; at 100 TB the
    engine-native path is `percentile_approx` (t-digest sketch, one
    pass, mergeable across partitions) — same query shape, declared
    approximate, so it has no hash oracle and is exercised in unit
    tests instead."""
    load_tables(spark, sf_dir, names=("events",))
    # finite-only: Spark's percentile ranks NaN ABOVE +Inf while
    # DuckDB's quantile_cont ignores it — non-finite readings are
    # excluded from the distribution AND from n on both engines
    # (value > -Inf AND value < Inf is false for NaN/±Inf/NULL)
    return spark.sql(
        """
        SELECT event_type,
               round(percentile(value, 0.5), 4) AS p50,
               round(percentile(value, 0.9), 4) AS p90,
               count(*) AS n
        FROM events
        WHERE value > double('-Infinity') AND value < double('Infinity')
        GROUP BY event_type ORDER BY event_type
        """
    )


QUANTILES_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       count(*) AS n
FROM events WHERE isfinite(value)
GROUP BY event_type ORDER BY event_type
"""




# --- cohort retention (temporal.retention) ---------------------------------

RETENTION_PERIOD_DAYS = 7


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix over the event stream: integer epoch
    periods (timezone/week-start-free), distinct users per (cohort,
    offset) cell."""
    from balboa_spark.operators import temporal

    load_tables(spark, sf_dir, names=("events",))
    return temporal.retention(
        spark.table("events"), period_days=RETENTION_PERIOD_DAYS
    ).orderBy("cohort_period", "period_offset")


RETENTION_ORACLE = f"""
WITH p AS (
  SELECT user_id,
         CAST(floor(epoch_us(ts) / (86400.0 * {RETENTION_PERIOD_DAYS} * 1000000)) AS BIGINT) AS period
  FROM events
),
f AS (SELECT user_id, min(period) AS cohort_period FROM p GROUP BY 1)
SELECT cohort_period, period - cohort_period AS period_offset,
       count(DISTINCT user_id) AS n_users
FROM p JOIN f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""




#: TPC-H Q3 shape (shipping-priority): 3-way join + filter + agg +
#: top-k — identical text runs in Spark SQL and DuckDB. Catalyst gets
#: the join order/broadcast decisions (customer and the date-filtered
#: orders are small sides under AQE); the top-10 is a TakeOrdered,
#: not a global sort. Deterministic ordering via the orderkey tiebreak.
TPCH_Q3_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < timestamp '1995-03-15 00:00:00'
  AND l_shipdate > timestamp '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("customer", "orders", "lineitem"))
    return spark.sql(TPCH_Q3_SQL)




# --- link-graph ranking (crawl/domain curation) -----------------------------

#: customer -> supplier "who buys from whom" edges — the stand-in for a
#: host-link graph at test SF (same shape: many small-out-degree
#: sources, a popular-sink skew, and an entire dangling class: the
#: supplier side has no out-edges, so the dangling-mass redistribution
#: is exercised on every iteration, not just in a corner case).
_PR_EDGES_SQL = (
    "SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src, "
    "'s' || CAST(l_suppkey AS VARCHAR) AS dst "
    "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
)
_PR_ITERS = 3


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer->supplier graph (operators/graph.py):
    3 rounded iterations with uniform teleport + dangling
    redistribution; the oracle unrolls the SAME arithmetic
    (pagerank_sql), so the driver grades the iteration, not just a
    projection."""
    from balboa_spark.operators.graph import pagerank

    t = load_tables(spark, sf_dir, names=("orders", "lineitem"))
    edges = (
        t["orders"]
        .join(
            t["lineitem"],
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
    )
    return pagerank(edges, iters=_PR_ITERS).orderBy("node")


def _graph_pagerank_oracle() -> str:
    from balboa_spark.operators.graph import pagerank_sql

    return pagerank_sql(_PR_EDGES_SQL, iters=_PR_ITERS) + " ORDER BY node"


# --- trailing-window anomaly scores ----------------------------------------

def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1h z-score per user (temporal.anomaly_scores),
    projected to the score columns."""
    from balboa_spark.operators import temporal

    load_tables(spark, sf_dir, names=("events",))
    return temporal.anomaly_scores(spark.table("events")).select(
        "event_id", "n_window", "z", "is_anomaly"
    ).orderBy("event_id")


ANOMALY_ORACLE = """
WITH c AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         CASE WHEN isfinite(value)
              THEN CAST(round(value * 100) AS BIGINT) END AS cents
  FROM events
),
w AS (
  -- HUGEINT accumulators mirror the engine's decimal(38,0): BIGINT
  -- cents*cents overflows (errors) at |value| > ~3e7. nv = usable
  -- readings (count(cents) skips NULL/non-finite) — the moment
  -- divisor; n = every event — the reported window size
  SELECT event_id, cents,
         count(*) OVER win AS n,
         count(cents) OVER win AS nv,
         sum(CAST(cents AS HUGEINT)) OVER win AS s1,
         sum(CAST(cents AS HUGEINT) * cents) OVER win AS s2
  FROM c
  WINDOW win AS (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
)
SELECT event_id, n AS n_window,
       CASE WHEN nv > 1 AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nv) / nv > 0
            THEN round((cents - CAST(s1 AS DOUBLE) / nv)
                       / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nv) / nv), 4)
       END AS z,
       CASE WHEN nv > 1 AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nv) / nv > 0
            THEN abs(round((cents - CAST(s1 AS DOUBLE) / nv)
                       / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nv) / nv), 4)) >= 3.0
       END AS is_anomaly
FROM w ORDER BY event_id
"""


# --- exact-recall fuzzy matching (entity resolution) -----------------------

def q_customer_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every pair of distinct customer names within Levenshtein
    distance 1 — SymSpell deletion-neighborhood candidates + exact
    levenshtein refilter (operators/fuzzy.py), provably the same set
    as the oracle's brute-force all-pairs scan."""
    from balboa_spark.operators import fuzzy

    load_tables(spark, sf_dir, names=("customer",))
    return fuzzy.fuzzy_value_pairs(spark.table("customer"), "c_name", 1).orderBy(
        "val_a", "val_b"
    )


CUSTOMER_FUZZY_ORACLE = """
WITH d AS (SELECT DISTINCT c_name AS v FROM customer WHERE len(c_name) >= 4)
SELECT a.v AS val_a, b.v AS val_b, levenshtein(a.v, b.v) AS dist
FROM d a, d b
WHERE a.v < b.v
  AND abs(len(a.v) - len(b.v)) <= 1
  AND levenshtein(a.v, b.v) <= 1
ORDER BY val_a, val_b
"""


def q_supplier_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: exact-recall fuzzy pairs
    (lev<=1 on supplier names) -> connected components (size-gated
    union-find / distributed star loop, both arms parity-tested) ->
    canonical = min name per cluster, singletons map to themselves.
    The oracle replays the whole chain: brute-force levenshtein pairs
    + a recursive-CTE transitive closure."""
    from balboa_spark.operators import dedup, fuzzy

    sup = load_tables(spark, sf_dir, names=("supplier",))["supplier"]
    names = sup.select(F.col("s_name").alias("v")).distinct()
    pairs = fuzzy.fuzzy_value_pairs(sup, "s_name", 1).select(
        F.col("val_a").alias("id_a"), F.col("val_b").alias("id_b")
    )
    cc = dedup.connected_components(pairs)
    return (
        names.join(cc, names["v"] == cc["id"], "left")
        .select(
            F.col("v").alias("s_name"),
            F.coalesce(F.col("comp"), F.col("v")).alias("canonical"),
        )
        .orderBy("s_name")
    )


SUPPLIER_ENTITY_ORACLE = """
WITH RECURSIVE d AS (SELECT DISTINCT s_name AS v FROM supplier),
pairs AS (
  SELECT a.v AS val_a, b.v AS val_b FROM d a, d b
  WHERE a.v < b.v AND abs(len(a.v) - len(b.v)) <= 1
    AND len(a.v) >= 4 AND len(b.v) >= 4
    AND levenshtein(a.v, b.v) <= 1
),
sym AS (
  SELECT val_a AS a, val_b AS b FROM pairs
  UNION
  SELECT val_b, val_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a
),
comp AS (SELECT a AS v, least(a, min(b)) AS canonical FROM reach GROUP BY a)
SELECT d.v AS s_name, coalesce(c.canonical, d.v) AS canonical
FROM d LEFT JOIN comp c ON c.v = d.v
ORDER BY s_name
"""


# --- wildcard blocklist (threat-intel indicator) matching ------------------

BLOCKLIST = ("dom1.example", "dom4.example", "host11.dom5.example", "absent.example")


def q_obs_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indicator-feed matching over the observation stream: wildcard
    suffix semantics via suffix-explode + equi-join
    (operators/query.blocklist_match), rolled up per (indicator,
    rrname)."""
    from balboa_spark.operators.query import blocklist_match

    obs = _obs(spark, sf_dir)
    bl = spark.createDataFrame([(d,) for d in BLOCKLIST], "domain string")
    return (
        blocklist_match(obs, bl)
        .groupBy("domain", "rrname")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("count").alias("total_count"),
        )
        .orderBy("domain", "rrname")
    )


def _obs_blocklist_oracle() -> str:
    values = ", ".join(f"('{d}')" for d in BLOCKLIST)
    return with_obs_cte(f"""
, sfx AS (
  SELECT o.rrname, o.count,
         unnest(CASE WHEN len(string_split(o.rrname, '.')) <= 2
                     THEN [o.rrname]
                     ELSE list_transform(
                       range(1, len(string_split(o.rrname, '.'))),
                       i -> array_to_string(string_split(o.rrname, '.')[i:], '.'))
                END) AS s
  FROM input_observations o
),
bl(domain) AS (VALUES {values})
SELECT b.domain, f.rrname,
       count(*) AS n_obs,
       CAST(sum(f.count) AS BIGINT) AS total_count
FROM sfx f JOIN bl b ON f.s = b.domain
GROUP BY 1, 2 ORDER BY 1, 2
""")


# --- PSI drift monitor -----------------------------------------------------

PSI_EDGES = (5.0, 15.0, 35.0, 70.0, 150.0)


def q_events_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift of the value distribution, clicks (reference) vs
    purchases (candidate) — expectations.psi_drift on shared fixed
    bin edges; sum(contrib) is the PSI."""
    from balboa_spark.operators.expectations import psi_drift

    e = load_tables(spark, sf_dir, names=("events",))["events"]
    return psi_drift(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
        "value",
        PSI_EDGES,
    ).orderBy("bin")


def _events_psi_oracle() -> str:
    from balboa_spark.operators.expectations import psi_oracle_sql

    return psi_oracle_sql(
        "(SELECT * FROM events WHERE event_type = 'click')",
        "(SELECT * FROM events WHERE event_type = 'purchase')",
        "value",
        PSI_EDGES,
    )


QUERIES_EXTRA: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_quantiles": q_events_quantiles,
    "events_tumbling": q_events_tumbling,
    "rollup_observations": q_rollup_observations,
    "agg_incremental": q_agg_incremental,
    "explode_normalize": q_explode_normalize,
    "tag_routing_counts": q_tag_routing_counts,
    "cof_projection": q_cof_projection,
    "multi_backend_union": q_multi_backend_union,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "graph_pagerank": q_graph_pagerank,
    "join_enrich": q_join_enrich,
    "topk_per_group": q_topk_per_group,
    "events_sessionize": q_events_sessionize,
    "events_retention": q_events_retention,
    "events_anomaly": q_events_anomaly,
    "customer_fuzzy_pairs": q_customer_fuzzy,
    "supplier_entity_resolve": q_supplier_entity,
    "obs_blocklist_match": q_obs_blocklist,
    "events_psi_drift": q_events_psi,
}

ORACLES_EXTRA: dict[str, str] = {
    "events_quantiles": QUANTILES_ORACLE,
    "events_tumbling": TUMBLING_ORACLE,
    "rollup_observations": ROLLUP_ORACLE,
    "agg_incremental": AGG_INCREMENTAL_ORACLE,
    "explode_normalize": EXPLODE_ORACLE,
    "tag_routing_counts": TAG_ROUTING_ORACLE,
    "cof_projection": COF_ORACLE,
    "multi_backend_union": MULTI_BACKEND_ORACLE,
    "tpch_q1": TPCH_Q1_ORACLE,
    "tpch_q3": TPCH_Q3_SQL,
    "graph_pagerank": _graph_pagerank_oracle(),
    "join_enrich": JOIN_ENRICH_ORACLE,
    "topk_per_group": TOPK_PER_GROUP_ORACLE,
    "events_sessionize": SESSIONIZE_ORACLE,
    "events_retention": RETENTION_ORACLE,
    "events_anomaly": ANOMALY_ORACLE,
    "customer_fuzzy_pairs": CUSTOMER_FUZZY_ORACLE,
    "supplier_entity_resolve": SUPPLIER_ENTITY_ORACLE,
    "obs_blocklist_match": _obs_blocklist_oracle(),
    "events_psi_drift": _events_psi_oracle(),
}
