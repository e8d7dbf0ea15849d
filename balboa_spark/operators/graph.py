"""Link-graph ranking for crawl/domain curation.

Production crawl corpora are not sampled uniformly: CommonCrawl ranks
the domain graph (harmonic centrality / PageRank over host links) and
the crawl frontier and per-domain quotas follow that ranking; a
pretraining pipeline reuses the same scores to weight or cap sources
(the `domain_cap` / `mixture` operators downstream of this one).

This module supplies the ranking itself as DataFrame-relational
iteration — the same discipline as the engine's other iterative
kernels (classifier.logreg_fit, similarity.ivf_fit, dedup's
alternating-star connected components):

- per iteration: ONE edges⋈ranks join + one map-side-combinable
  groupBy(dst) sum, plus a 1-row dangling-mass aggregate joined back
  by broadcast — no windows, no driver-side vectors, no
  collect beyond the one scalar node count;
- every iteration's rank is rounded to ``round_dp`` decimals, so the
  float trajectory is reshuffle-deterministic AND engine-replayable
  (the logreg/weighted-sample rounding convention: re-rounding each
  step stops last-ulp drift from compounding);
- the per-iteration relation is node-sized and narrow; iterations are
  ``localCheckpoint``-ed to cut lineage (an unrolled 20-join plan is
  what kills iterative DataFrame jobs, not the data).

Scale: state is (node, rank) — nodes-sized, never edges-sized; the
edges relation is scanned once per iteration with the shuffle keyed
on src/dst (bucket edges by src on a real cluster to make the
per-iteration join shuffle-free on one side). PageRank per Page et
al. 1999 / Brin & Page 1998, teleport ``1-damping`` uniform, dangling
mass redistributed uniformly per iteration (the standard stochastic
fix-up, e.g. Berkhin 2005 survey).

``pagerank_sql`` unrolls the SAME arithmetic as DuckDB CTEs so the
driver oracle grades the training loop, not just the final
projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_ROUND = 9


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    round_dp: int = PR_ROUND,
) -> DataFrame:
    """Rank every node of the directed graph ``edges`` (duplicate
    edges collapse to one; self-loops count like any edge). Returns
    ``(node, rank)``, ranks summing to ~1. See the module docstring
    for the iteration shape and determinism contract."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # the one driver scalar (graph order)
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    d = float(damping)
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n), round_dp).alias("rank")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        # mass flowing along edges: rank/outdeg from each linking node
        contrib = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"])
            .join(e, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("m"))
        )
        # dangling nodes (no out-edges) spread their mass uniformly —
        # a 1-row aggregate, broadcast back by construction
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    F.lit((1.0 - d) / n)
                    + F.lit(d)
                    * (F.coalesce(F.col("m"), F.lit(0.0)) + F.col("dm") / n),
                    round_dp,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_sql(
    edges_sql: str,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    round_dp: int = PR_ROUND,
) -> str:
    """The full iteration unrolled as CTEs over ``edges_sql`` (a query
    producing ``src_col``/``dst_col``) — the DuckDB replay of
    :func:`pagerank`, rounding where the Spark loop rounds."""
    r = round_dp
    d = float(damping)
    parts = [
        f"e AS (SELECT DISTINCT {src_col} AS src, {dst_col} AS dst "
        f"FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT COUNT(*) AS c FROM nodes)",
        "od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        f"r0 AS (SELECT node, round(1.0 / c, {r}) AS rank FROM nodes, nn)",
    ]
    for k in range(1, iters + 1):
        p = f"r{k-1}"
        parts.append(
            f"""c{k} AS (
  SELECT e.dst AS node, SUM({p}.rank / od.outdeg) AS m
  FROM {p} JOIN od ON {p}.node = od.src JOIN e ON e.src = {p}.node
  GROUP BY e.dst
)"""
        )
        parts.append(
            f"""d{k} AS (
  SELECT COALESCE(SUM({p}.rank), 0.0) AS dm
  FROM {p} LEFT JOIN od ON {p}.node = od.src
  WHERE od.src IS NULL
)"""
        )
        parts.append(
            f"""r{k} AS (
  SELECT nodes.node,
         round({(1.0 - d)!r} / c + {d!r} * (COALESCE(m, 0.0) + dm / c),
               {r}) AS rank
  FROM nodes CROSS JOIN nn CROSS JOIN d{k}
  LEFT JOIN c{k} ON c{k}.node = nodes.node
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, rank FROM r{iters}"
