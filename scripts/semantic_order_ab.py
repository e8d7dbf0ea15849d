"""A/B: the semantic_order cluster proxy vs the published kNN-graph
traversal (Shi et al. 2023, in-context pretraining) on the metric the
published result is about — mean pairwise cosine similarity among the
documents that land in the same context window.

``similarity.semantic_order`` is a DECLARED approximation: it orders
by (nearest-centroid cell, cosine-to-centroid DESC, id) in one
zero-shuffle projection, where the published method traverses a
document-level kNN graph (n x k similarity joins plus a sequential
traversal that does not shuffle-partition — unusable at 100 TB).
This script measures what the proxy costs on the driver-graded
fixture so the approximation is adopted WITH a number (r15 verdict
gap #3), not by assertion. Results land in PERF.md (r16).

Usage: python scripts/semantic_order_ab.py [sf_dir] [window] [knn_k] [k_centroids]
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _orderings(ids, X, spark, emb, window: int, knn_k: int, k_cents: int | None):
    """id sequences to compare: random / id-order / cluster proxy /
    greedy kNN-graph traversal."""
    from balboa_spark.entry_queries_docs import KM_ITERS, KM_K

    if k_cents:
        KM_K = k_cents
    from balboa_spark.operators import similarity
    from pyspark.sql import functions as F

    n = len(ids)
    pos = {v: i for i, v in enumerate(ids)}

    rng = random.Random(42)
    rand = list(ids)
    rng.shuffle(rand)

    # cluster proxy — exactly the corpus_semantic_order entry's recipe
    seed_rows = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(KM_K)
        .select("embedding")
        .collect()
    )
    C = similarity.ivf_fit(
        emb, 64, k=KM_K, iters=KM_ITERS,
        seeds=[list(r[0]) for r in seed_rows], round_digits=9,
    )
    proxy = [
        r.vec_id
        for r in similarity.semantic_order(emb, C)
        .orderBy("cell", F.col("sim").desc(), "vec_id")
        .collect()
    ]

    # kNN-graph greedy traversal (the published shape, exact graph):
    # visit the most-similar unvisited neighbor of the current doc;
    # when the current doc's k-neighborhood is exhausted, jump to the
    # unvisited doc most similar to the current one (path restart).
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -np.inf)
    nbrs = np.argsort(-S, axis=1)[:, :knn_k]
    visited = np.zeros(n, dtype=bool)
    cur = 0
    walk = [ids[cur]]
    visited[cur] = True
    for _ in range(n - 1):
        nxt = -1
        for cand in nbrs[cur]:
            if not visited[cand]:
                nxt = int(cand)
                break
        if nxt < 0:
            masked = np.where(visited, -np.inf, S[cur])
            nxt = int(np.argmax(masked))
        visited[nxt] = True
        walk.append(ids[nxt])
        cur = nxt

    return {
        "random": rand,
        "id_order": list(ids),
        "cluster_proxy": proxy,
        "knn_traversal": walk,
    }, S, pos


def window_similarity(order, S, pos, window: int) -> float:
    """Mean pairwise cosine within consecutive windows of ``window``
    docs (the context-window adjacency the packing order exists to
    maximize)."""
    vals = []
    for s in range(0, len(order) - window + 1, window):
        idx = [pos[v] for v in order[s : s + window]]
        block = S[np.ix_(idx, idx)]
        iu = np.triu_indices(len(idx), k=1)
        vals.append(float(block[iu].mean()))
    return float(np.mean(vals))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    knn_k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    k_cents = int(sys.argv[4]) if len(sys.argv) > 4 else None

    from balboa_spark.session import get_spark, load_tables

    spark = get_spark()
    emb = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    rows = sorted(
        (r.vec_id, list(r.embedding))
        for r in emb.select("vec_id", "embedding").collect()
    )
    ids = [r[0] for r in rows]
    X = np.array([r[1] for r in rows], dtype=np.float64)

    orders, S, pos = _orderings(ids, X, spark, emb, window, knn_k, k_cents)
    print(f"# n={len(ids)} dim={X.shape[1]} window={window} knn_k={knn_k} k_cents={k_cents} sf={sf_dir}")
    base = None
    for name, order in orders.items():
        assert sorted(order) == ids, name
        m = window_similarity(order, S, pos, window)
        if name == "knn_traversal":
            base = m
        print(f"{name:16s} mean_within_window_cos = {m:+.4f}")
    proxy = window_similarity(orders["cluster_proxy"], S, pos, window)
    if base:
        print(f"# proxy/traversal ratio = {proxy / base:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
