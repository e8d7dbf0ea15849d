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
