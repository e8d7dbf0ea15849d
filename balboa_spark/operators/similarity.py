"""Similarity search over embedding columns (array<float>).

- ``cosine``: pure-Column cosine between two vector columns (cast to
  double so results are bit-identical to the DuckDB oracle).
- ``topk_brute``: exact top-k for one query vector — a single
  projection + global top-k (Spark's TakeOrdered, no full sort).
- ``cosine_pairs``: all pairs above a threshold (brute; for oracle and
  small candidate sets).
- ``lsh_bucketed_topk``: the 100 TB path — sign-bit LSH (seeded,
  deterministic hyperplanes) buckets vectors so the scan touches only
  colliding buckets; exact re-rank inside candidates.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dvec(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_dvec(a), _dvec(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_dvec(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_brute(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector.

    Plan: one narrow projection over the scan, then TakeOrdered(k) —
    per-partition heaps + driver merge, no shuffle of the full table.
    Rounded cosine + id tie-break keeps ranking deterministic across
    engines and float orderings.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine >= threshold (brute force;
    the oracle-checkable reference semantics for near-dup-by-embedding).
    At scale, run lsh_bucketed candidates first and re-rank with the
    same ``cosine`` expression."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# -- LSH (sign-random-projection) -------------------------------------------

def _hyperplanes(dim: int, num_planes: int, seed: str = "balboa") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is
    derived from md5(seed|p|d) mapped to [-1, 1). Reproducible across
    sessions/machines with no RNG state."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()
            row.append(int(h[:8], 16) / float(2**31) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, dim: int, num_planes: int = 8, seed: str = "balboa") -> Column:
    """Sign-bit bucket id in [0, 2^num_planes): bit p = 1 iff
    dot(vec, plane_p) >= 0. Cosine-similar vectors collide with
    probability 1 - theta/pi per bit."""
    bucket = F.lit(0)
    for p, plane in enumerate(_hyperplanes(dim, num_planes, seed)):
        lit_plane = F.array(*[F.lit(w) for w in plane])
        bit = F.when(dot(vec, lit_plane) >= 0, F.lit(2**p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: score only vectors whose LSH bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe), then
    exact cosine re-rank. At 100 TB the table is written partitioned by
    bucket, so this prunes partitions instead of filtering a full scan.
    """
    dim = len(query_vec)
    with_b = df.withColumn("_b", lsh_bucket(F.col(vec_col), dim, num_planes))
    qb = _query_bucket(query_vec, num_planes)
    probes = [qb] + (
        [qb ^ (1 << p) for p in range(num_planes)] if probe_hamming >= 1 else []
    )
    cand = with_b.filter(F.col("_b").isin(probes))
    return topk_brute(cand, query_vec, k, vec_col, id_col)


def _query_bucket(query_vec: list[float], num_planes: int, seed: str = "balboa") -> int:
    b = 0
    for p, plane in enumerate(_hyperplanes(len(query_vec), num_planes, seed)):
        if sum(w * x for w, x in zip(plane, query_vec)) >= 0:
            b |= 1 << p
    return b
