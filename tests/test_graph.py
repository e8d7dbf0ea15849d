"""PageRank: hand-computed fixtures, mass conservation, dangling
redistribution, DuckDB replay parity, plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from balboa_spark.operators.graph import pagerank, pagerank_sql


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_pagerank_two_cycle_stays_uniform(spark):
    """a<->b is symmetric: ranks stay exactly 0.5 at any iteration."""
    got = _ranks(pagerank(_edges(spark, [("a", "b"), ("b", "a")]), iters=4))
    assert got == {"a": 0.5, "b": 0.5}


def test_pagerank_sink_attracts_and_mass_conserved(spark):
    """Star a->b, c->b (+ b->a back-edge to avoid a fully dangling
    graph): the linked-to nodes (b, and a via b's whole mass) far
    outrank c, who only ever holds its teleport share; total mass
    stays ~1."""
    got = _ranks(
        pagerank(
            _edges(spark, [("a", "b"), ("c", "b"), ("b", "a")]), iters=10
        )
    )
    assert got["b"] > got["c"] and got["a"] > got["c"]
    assert abs(got["c"] - 0.05) < 1e-9  # teleport share only: 0.15/3
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_dangling_hand_computed(spark):
    """a->b with b dangling, one iteration by hand (d=0.85, n=2):
    dangling mass = rank(b) = 0.5 spread uniformly.
      r(a) = 0.15/2 + 0.85*(0 + 0.5/2)      = 0.2875
      r(b) = 0.15/2 + 0.85*(0.5/1 + 0.5/2)  = 0.7125
    """
    got = _ranks(pagerank(_edges(spark, [("a", "b")]), iters=1))
    assert got == {"a": 0.2875, "b": 0.7125}
    # mass conserved across further iterations despite the dangler
    got5 = _ranks(pagerank(_edges(spark, [("a", "b")]), iters=5))
    assert abs(sum(got5.values()) - 1.0) < 1e-6


def test_pagerank_iter0_uniform_and_duplicate_edges(spark):
    got = _ranks(
        pagerank(
            _edges(spark, [("a", "b"), ("a", "b"), ("b", "c")]), iters=0
        )
    )
    assert set(got) == {"a", "b", "c"}
    assert all(abs(v - round(1 / 3, 9)) < 1e-12 for v in got.values())
    with pytest.raises(ValueError, match="iters"):
        pagerank(_edges(spark, [("a", "b")]), iters=-1)


def test_pagerank_matches_duckdb_replay(spark):
    """Spark loop == unrolled-CTE replay on a 6-node graph with a
    hub, a cycle, and two danglers — exact equality after the shared
    per-iteration rounding."""
    pairs = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("c", "d"), ("e", "c"), ("a", "f"),
    ]  # d and f dangle
    got = _ranks(pagerank(_edges(spark, pairs), iters=4))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE el (src VARCHAR, dst VARCHAR); "
        + "INSERT INTO el VALUES "
        + ", ".join(f"('{s}','{t}')" for s, t in pairs)
    )
    want = dict(
        con.execute(
            pagerank_sql("SELECT src, dst FROM el", iters=4)
        ).fetchall()
    )
    assert got == want


def test_pagerank_plan_shape(spark):
    """No window anywhere; the only cartesian is the 1-row dangling
    broadcast (BroadcastNestedLoopJoin with a single-row build side is
    the intended plan for a scalar join-back)."""
    out = pagerank(_edges(spark, [("a", "b"), ("b", "a")]), iters=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_pagerank_matches_python_power_iteration_fuzz(spark):
    """Random digraphs (dangling nodes, hubs, self-loops, duplicate
    edges) vs an independent pure-Python power iteration applying the
    identical per-iteration rounding — exact equality."""
    import random

    def rnd(x, dp=9):
        # Spark's round() is HALF_UP; Python's built-in round() is
        # half-even — a tie at the 10th digit would silently diverge
        from decimal import ROUND_HALF_UP, Decimal

        return float(
            Decimal(repr(x)).quantize(
                Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP
            )
        )

    def py_pagerank(pairs, iters, d=0.85):
        e = sorted(set(pairs))
        nodes = sorted({s for s, _ in e} | {t for _, t in e})
        n = len(nodes)
        out = {}
        for s, _ in e:
            out[s] = out.get(s, 0) + 1
        r = {v: rnd(1.0 / n) for v in nodes}
        for _ in range(iters):
            contrib = {v: 0.0 for v in nodes}
            for s, t in e:
                contrib[t] += r[s] / out[s]
            dm = sum(r[v] for v in nodes if v not in out)
            r = {
                v: rnd((1 - d) / n + d * (contrib[v] + dm / n))
                for v in nodes
            }
        return r

    rng = random.Random(23)
    for case in range(4):
        n_nodes = rng.randint(4, 18)
        pairs = [
            (f"n{rng.randint(0, n_nodes)}", f"n{rng.randint(0, n_nodes)}")
            for _ in range(rng.randint(3, 40))
        ]
        iters = rng.randint(1, 4)
        got = _ranks(pagerank(_edges(spark, pairs), iters=iters))
        want = py_pagerank(pairs, iters)
        assert got == want, f"case={case} iters={iters}"


# ---------------------------------------------------------------------------
# harmonic centrality (HyperBall) — exact at unit scale
# ---------------------------------------------------------------------------


def test_harmonic_path_hand_computed(spark):
    """a->b->c: harmonic(c) = 1/1 (b) + 1/2 (a) = 1.5; harmonic(b) =
    1 (a); harmonic(a) = 0. Sparse-mode HLL is exact here."""
    from balboa_spark.operators.graph import harmonic_centrality

    out = {
        r["node"]: (r["harmonic"], r["ball_size"])
        for r in harmonic_centrality(
            _edges(spark, [("a", "b"), ("b", "c")]), max_dist=3
        ).collect()
    }
    assert out == {"a": (0.0, 1), "b": (1.0, 2), "c": (1.5, 3)}


def test_harmonic_hub_cycle_selfloop(spark):
    """Star into a hub: harmonic(hub) = indegree; a 2-cycle gives 1.0
    each; self-loops and duplicate edges add nothing."""
    from balboa_spark.operators.graph import harmonic_centrality

    star = [("s1", "h"), ("s2", "h"), ("s3", "h"), ("h", "h"), ("s1", "h")]
    out = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality(_edges(spark, star), max_dist=2).collect()
    }
    assert out["h"] == 3.0 and out["s1"] == 0.0
    cyc = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality(
            _edges(spark, [("a", "b"), ("b", "a")]), max_dist=4
        ).collect()
    }
    assert cyc == {"a": 1.0, "b": 1.0}
    import pytest as _pt

    with _pt.raises(ValueError, match="max_dist"):
        harmonic_centrality(_edges(spark, [("a", "b")]), max_dist=0)


def test_harmonic_matches_python_bfs_fuzz(spark):
    """Random digraphs vs exact python BFS harmonic centrality —
    sparse HLL stays exact at these ball sizes, so equality is
    exact (6dp rounding both sides)."""
    import random
    from collections import deque

    from balboa_spark.operators.graph import harmonic_centrality

    def py_harmonic(pairs, max_dist):
        e = set(pairs)
        nodes = sorted({s for s, _ in e} | {t for _, t in e})
        fwd = {}
        for s, t in e:
            fwd.setdefault(s, set()).add(t)
        h = {}
        for v in nodes:
            # BFS over REVERSE reachability: distance from u to v
            dist = {v: 0}
            dq = deque([v])
            rev = {}
            for s, t in e:
                rev.setdefault(t, set()).add(s)
            while dq:
                x = dq.popleft()
                if dist[x] >= max_dist:
                    continue
                for u in rev.get(x, ()):
                    if u not in dist:
                        dist[u] = dist[x] + 1
                        dq.append(u)
            h[v] = round(
                sum(1.0 / d for u, d in dist.items() if d > 0), 6
            )
        return h

    rng = random.Random(5)
    for case in range(3):
        n_nodes = rng.randint(4, 14)
        pairs = [
            (f"n{rng.randint(0, n_nodes)}", f"n{rng.randint(0, n_nodes)}")
            for _ in range(rng.randint(3, 30))
        ]
        md = rng.randint(1, 3)
        got = {
            r["node"]: r["harmonic"]
            for r in harmonic_centrality(
                _edges(spark, pairs), max_dist=md
            ).collect()
        }
        assert got == py_harmonic(pairs, md), f"case={case} md={md}"


def test_personalized_pagerank_seeds(spark):
    """PPR (seeds): teleport + dangling mass land only on the seed
    set. In a->b, c->b with seed {a}: c's rank decays to 0 (no
    teleport, no in-links from the seed side), while a keeps the
    teleport share; mass stays ~1; DuckDB replay matches exactly."""
    pairs = [("a", "b"), ("c", "b"), ("b", "a")]
    got = _ranks(pagerank(_edges(spark, pairs), iters=8, seeds=["a"]))
    assert got["c"] == 0.0
    assert got["a"] > 0.15  # teleport share at minimum
    assert abs(sum(got.values()) - 1.0) < 1e-6
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE el (src VARCHAR, dst VARCHAR); INSERT INTO el VALUES "
        + ", ".join(f"('{s}','{t}')" for s, t in pairs)
    )
    want = dict(
        con.execute(
            pagerank_sql("SELECT src, dst FROM el", iters=8, seeds=["a"])
        ).fetchall()
    )
    assert got == want
    # two seeds split the teleport; dangling graph conserves mass
    got2 = _ranks(
        pagerank(_edges(spark, [("a", "b")]), iters=6, seeds=["a", "b"])
    )
    assert abs(sum(got2.values()) - 1.0) < 1e-6
    with pytest.raises(ValueError, match="seeds"):
        pagerank(_edges(spark, pairs), seeds=[])
    with pytest.raises(ValueError, match="seeds"):
        pagerank_sql("SELECT 1", seeds=[])


def test_pagerank_to_domain_quota_composition(spark):
    """The README recipe proven end to end: rank a domain graph, turn
    ranks into per-domain quotas, and cap a document set with
    domain_cap — higher-ranked domains keep more documents, and the
    kept subset is deterministic."""
    from balboa_spark.operators.corpus import domain_cap

    edges = _edges(
        spark,
        # hub.example is linked from everyone; cold.example from no one
        [("a.example", "hub.example"), ("b.example", "hub.example"),
         ("c.example", "hub.example"), ("hub.example", "a.example")],
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    assert ranks["hub.example"] > ranks["c.example"]
    # quota: 3 docs for above-median domains, 1 below (driver-side
    # arithmetic over the node-sized rank relation)
    med = sorted(ranks.values())[len(ranks) // 2]
    docs = spark.createDataFrame(
        [
            (d * 10 + i, f"https://{dom}/p/{i}", f"doc {d}-{i}")
            for d, dom in enumerate(sorted(ranks))
            for i in range(4)
        ],
        "doc_id long, url string, text string",
    )
    capped = []
    for dom in ranks:
        quota = 3 if ranks[dom] >= med else 1
        kept = domain_cap(
            docs.where(F.col("url").startswith(f"https://{dom}/")),
            quota,
            url_col="url",
        )
        capped.append((dom, kept.count(), quota))
    assert all(n == q for _, n, q in capped), capped


def test_pagerank_bucketed_edges_bit_identical_no_edge_exchange(spark, tmp_path):
    """The 100 TB arm: pagerank over a catalog edge table bucketed on
    src (write_graph_edges_bucketed) must (a) produce BIT-IDENTICAL
    ranks to the DataFrame arm — same float expressions, same 9dp
    per-step rounding — and (b) read the edges side of the
    per-iteration join straight off the bucketed scan with NO
    Exchange: the representative ranks⋈edges join plan carries
    exactly one fewer Exchange than its unbucketed twin (the missing
    one is the edges shuffle, paid once at write time instead of once
    per iteration per run)."""
    from balboa_spark.operators.graph import (
        harmonic_centrality,
        write_graph_edges_bucketed,
    )

    pairs = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
        ("d", "e"), ("e", "a"), ("b", "d"), ("f", "a"),
    ]
    edges = _edges(spark, pairs)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        write_graph_edges_bucketed(
            edges, "b_pr_edges", str(tmp_path / "b_pr_edges"), 4
        )
        got_b = _ranks(pagerank("b_pr_edges", iters=5))
        got_d = _ranks(pagerank(edges, iters=5))
        assert got_b == got_d  # bit-identical trajectory

        # representative per-iteration join shape, bucketed vs not:
        # the bucketed plan must be exactly one Exchange lighter
        ranks0 = spark.createDataFrame(
            [(n, 1.0 / 6) for n in "abcdef"], "node string, rank double"
        )
        ew_tbl = spark.table("b_pr_edges")
        ew_raw = edges.distinct().join(
            edges.distinct().groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")),
            "src",
        )
        def _plan(ew):
            j = (
                ranks0.join(ew, ranks0["node"] == ew["src"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("m"))
            )
            return j._jdf.queryExecution().executedPlan().toString()
        plan_b, plan_raw = _plan(ew_tbl), _plan(ew_raw)
        assert "SortMergeJoin" in plan_b, plan_b
        # bucketed arm: the ONLY exchanges are the ranks side of the
        # join and the final dst aggregation — the edges side is the
        # bucketed file scan itself (visible as SelectedBucketsCount),
        # with no Exchange and no write-time outdeg re-derivation
        assert plan_b.count("Exchange") == 2, plan_b
        assert "SelectedBucketsCount" in plan_b, plan_b
        assert plan_raw.count("Exchange") > plan_b.count("Exchange"), plan_raw

        # harmonic over the same table: identical output to the
        # DataFrame arm (sketches are deterministic given the data)
        hb = {
            r["node"]: (r["harmonic"], r["ball_size"])
            for r in harmonic_centrality("b_pr_edges", max_dist=3).collect()
        }
        hd = {
            r["node"]: (r["harmonic"], r["ball_size"])
            for r in harmonic_centrality(edges, max_dist=3).collect()
        }
        assert hb == hd
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_pr_edges")
