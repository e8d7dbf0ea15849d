"""Declarative data-quality expectations — the contract gate a
pipeline runs before publishing a corpus snapshot (the
Deequ/Great-Expectations niche, restated as one Spark aggregate).

A check suite is a dict of rule name -> BOOLEAN SQL predicate over the
row (pass = TRUE; NULL counts as a VIOLATION — unknown is not a pass),
plus optional uniqueness rules per key column. The whole suite
evaluates in ONE pass over the table: every rule is a conditional sum
inside a single aggregate (map-side combined — at 100 TB this costs
one scan regardless of how many rules run), then the one result row
unpivots to (rule, n_rows, n_violations, violation_rate) via stack.

Keep predicates in the engine-shared SQL subset (comparisons, IN,
IS NOT NULL, length()) and the same suite is directly runnable on any
SQL engine — which is also what makes it oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_expectations(
    df: DataFrame,
    checks: dict[str, str],
    unique: Sequence[str] = (),
) -> DataFrame:
    """Evaluate the suite; returns one row per rule:
    (rule, n_rows, n_violations, violation_rate).

    ``checks``: rule name -> boolean SQL predicate (row passes iff the
    predicate is TRUE; NULL/unknown violates). ``unique``: column
    names that must be key-unique (violations = n_rows - n_distinct).
    Rule names must be distinct across both kinds.
    """
    names = list(checks) + [f"unique:{c}" for c in unique]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names in {names}")
    if not names:
        raise ValueError("empty expectation suite")
    aggs = [
        F.sum(F.when(F.expr(pred), 0).otherwise(1)).cast("long").alias(name)
        for name, pred in checks.items()
    ]
    aggs += [
        (F.count(F.lit(1)) - F.count_distinct(F.col(c)))
        .cast("long")
        .alias(f"unique:{c}")
        for c in unique
    ]
    row = df.agg(F.count(F.lit(1)).alias("_n"), *aggs)
    stack_args = ", ".join(f"'{n}', `{n}`" for n in names)
    return row.select(
        F.expr(f"stack({len(names)}, {stack_args}) AS (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        F.round(F.col("n_violations") / F.col("n_rows"), 6).alias(
            "violation_rate"
        ),
    )


def expectations_oracle_sql(
    table: str, checks: dict[str, str], unique: Sequence[str] = ()
) -> str:
    """The DuckDB twin of validate_expectations for the same suite —
    generated from the identical predicates so both engines grade one
    definition."""
    branches = [
        f"SELECT '{name}' AS rule, "
        f"sum(CASE WHEN ({pred}) THEN 0 ELSE 1 END) AS n_violations "
        f"FROM {table}"
        for name, pred in checks.items()
    ]
    branches += [
        f"SELECT 'unique:{c}', count(*) - count(DISTINCT {c}) FROM {table}"
        for c in unique
    ]
    body = "\nUNION ALL\n".join(branches)
    return f"""
WITH n AS (SELECT count(*) AS n_rows FROM {table}),
v AS ({body})
SELECT rule, n.n_rows, CAST(v.n_violations AS BIGINT) AS n_violations,
       round(v.n_violations / n.n_rows, 6) AS violation_rate
FROM v, n ORDER BY rule
"""


def psi_drift(
    ref: DataFrame,
    new: DataFrame,
    value_col: str,
    bin_edges: Sequence[float],
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two distributions of
    ``value_col`` — the standard drift monitor for a deployed score
    (quality classifier, DSIR weight, length profile): bin both
    relations on FIXED ``bin_edges`` (len+1 bins including the two
    open tails), compare proportions, and report each bin's PSI
    contribution (p_new - p_ref) * ln(p_new / p_ref) with ``eps``
    smoothing so empty bins stay finite. Sum of ``contrib`` is the
    PSI; the conventional read: < 0.1 stable, 0.1-0.25 drifting,
    > 0.25 shifted.

    Scale shape: one map-side-combined groupBy per relation (bin
    count = len(bin_edges)+1 rows each), a bins-sized join, pure
    arithmetic after — nothing corpus-sized leaves the aggregates.
    Deterministic and SQL-replayable: the bin id is a fixed CASE
    ladder over the shared edges (psi_oracle_sql)."""
    edges = list(bin_edges)
    if sorted(edges) != edges or len(edges) < 1:
        raise ValueError("bin_edges must be a non-empty ascending sequence")

    def bin_col() -> Column:
        c = F.when(F.col(value_col) < edges[0], F.lit(0))
        for i in range(1, len(edges)):
            c = c.when(F.col(value_col) < edges[i], F.lit(i))
        return c.otherwise(F.lit(len(edges)))

    def props(df: DataFrame, name: str) -> DataFrame:
        counts = df.select(bin_col().alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias("_n")
        )
        # total = sum of the bins-sized counts (a window over <=
        # len(edges)+1 rows) — NOT df.count(), which would be a second
        # corpus-sized scan per relation
        from pyspark.sql import Window

        tot = F.sum("_n").over(Window.partitionBy())
        return counts.select(
            "bin",
            (F.col("_n") / F.greatest(tot, F.lit(1)).cast("double")).alias(name),
        )

    bins = range(len(edges) + 1)
    spark = ref.sparkSession
    all_bins = spark.createDataFrame([(b,) for b in bins], "bin int")
    joined = (
        all_bins.join(props(ref, "p_ref"), "bin", "left")
        .join(props(new, "p_new"), "bin", "left")
        .fillna(0.0, ["p_ref", "p_new"])
    )
    pr = F.col("p_ref") + eps
    pn = F.col("p_new") + eps
    return joined.select(
        "bin",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_new", 6).alias("p_new"),
        F.round((pn - pr) * F.log(pn / pr), 6).alias("contrib"),
    )


def psi_oracle_sql(
    ref_sql: str,
    new_sql: str,
    value_col: str,
    bin_edges: Sequence[float],
    eps: float = 1e-6,
) -> str:
    """DuckDB replay of psi_drift: ``ref_sql``/``new_sql`` are
    relation expressions (table names or parenthesized subqueries)."""
    edges = list(bin_edges)
    case = "CASE "
    case += f"WHEN {value_col} < {edges[0]!r} THEN 0 "
    for i in range(1, len(edges)):
        case += f"WHEN {value_col} < {edges[i]!r} THEN {i} "
    case += f"ELSE {len(edges)} END"
    nb = len(edges) + 1
    return f"""
WITH bins AS (SELECT unnest(range(0, {nb})) AS bin),
r AS (
  SELECT {case} AS bin, count(*) AS n FROM {ref_sql} GROUP BY 1
),
rt AS (SELECT greatest(sum(n), 1) AS t FROM r),
nw AS (
  SELECT {case} AS bin, count(*) AS n FROM {new_sql} GROUP BY 1
),
nt AS (SELECT greatest(sum(n), 1) AS t FROM nw),
j AS (
  SELECT b.bin,
         coalesce(r.n, 0) * 1.0 / rt.t AS p_ref,
         coalesce(nw.n, 0) * 1.0 / nt.t AS p_new
  FROM bins b
  LEFT JOIN r ON r.bin = b.bin
  LEFT JOIN nw ON nw.bin = b.bin, rt, nt
)
SELECT CAST(bin AS INTEGER) AS bin,
       round(p_ref, 6) AS p_ref,
       round(p_new, 6) AS p_new,
       round(((p_new + {eps!r}) - (p_ref + {eps!r}))
             * ln((p_new + {eps!r}) / (p_ref + {eps!r})), 6) AS contrib
FROM j ORDER BY bin
"""
