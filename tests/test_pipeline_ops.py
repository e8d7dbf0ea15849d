"""Tests for training-data pipeline operators: dedup families,
similarity search (incl. ANN recall), text analysis, multimodal
plumbing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from balboa_spark.operators import dedup, similarity, text


@pytest.fixture(scope="module")
def docs(spark, tables):
    return tables["documents"]


@pytest.fixture(scope="module")
def emb(spark, tables):
    return tables["embeddings"]


def test_exact_dedup_removes_planted_copies(spark, docs):
    dup = docs.limit(20).withColumn("doc_id", F.col("doc_id") + 100000)
    corpus = docs.unionByName(dup)
    kept = dedup.exact_dedup(corpus)
    assert kept.count() == docs.count()  # copies removed
    # representative is the min id (the original)
    assert kept.filter(F.col("doc_id") >= 100000).count() == 0


def test_minhash_finds_planted_near_dups(spark, docs):
    toks = text.tokens(F.col("text"))
    variant = docs.limit(30).select(
        (F.col("doc_id") + 50000).alias("doc_id"),
        F.array_join(F.slice(toks, 1, F.size(toks) - 1), " ").alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(variant)
    pairs = dedup.minhash_lsh_pairs(corpus).collect()
    planted = {(r.id_a, r.id_b) for r in pairs if r.id_b == r.id_a + 50000}
    assert len(planted) >= 25  # high recall on 1-token-removed variants


def test_simhash_distance_zero_for_identical(spark, docs):
    two = docs.limit(1).select("doc_id", "text")
    copy = two.withColumn("doc_id", F.col("doc_id") + 7)
    pairs = dedup.simhash_pairs(two.unionByName(copy)).collect()
    assert len(pairs) == 1 and pairs[0].hamming == 0


def test_jaccard_exact_values(spark):
    rows = [(1, "a b c d e f"), (2, "a b c d e g"), (3, "x y z w q r")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r.jaccard for r in
           dedup.ngram_jaccard_pairs(df, threshold=0.1).collect()}
    # doc1: shingles {abc,bcd,cde,def}; doc2: {abc,bcd,cde,deg}; inter=3, union=5
    assert out == {(1, 2): 0.6}


def test_jaccard_hot_shingle_cap_no_window(spark):
    """The stop-shingle DF cap must be a groupBy+semi-join, never a
    count-over-window: a boilerplate shingle present in every doc of a
    100 TB corpus would otherwise funnel all its (id, s) rows into ONE
    unsplittable window partition. Planted skew: a hot shingle in all
    60 docs (df=60 > cap=50) must be dropped BEFORE pair generation —
    docs sharing only boilerplate produce no pair — while a rare
    shared shingle still scores exact Jaccard; and the optimized plan
    must contain no Window node at all."""
    hot = "the quick brown"  # one k=3 shingle shared by every doc
    rows = [(i, f"{hot} unique{i} tail{i} end{i}") for i in range(58)]
    # two docs that ALSO share a rare tail -> the only surviving pair
    rows += [(100, f"{hot} shared rare tail"), (101, f"{hot} shared rare tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.ngram_jaccard_pairs(df, k=3, threshold=0.1, max_doc_freq=50)
    assert "Window" not in out._jdf.queryExecution().optimizedPlan().toString()
    pairs = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    # after dropping the hot shingle, docs 100/101 share all surviving
    # shingles ("quick brown shared", "brown shared rare", "shared rare
    # tail") -> Jaccard 1.0; every boilerplate-only overlap vanishes
    assert pairs == {(100, 101): 1.0}


def test_vector_store_partition_pruned_topk(spark, emb, tmp_path):
    """Persisted IVF layout: query must (a) partition-prune the index
    to its probe codes and (b) return the same top-k as the on-the-fly
    LSH path (whose candidate union provably covers the true top-k on
    this workload)."""
    from balboa_spark.operators.vector_store import VectorStore

    vs = VectorStore(spark, str(tmp_path / "vs"))
    vs.write(emb, dim=64)
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])

    plan = (
        vs.candidates(qvec)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "code" in plan

    got = [(r.vec_id, r.cos) for r in vs.topk(qvec, k=10).collect()]
    brute = [(r.vec_id, r.cos) for r in similarity.topk_brute(emb, qvec, k=10).collect()]
    assert got == brute


def test_connected_components_chain(spark):
    """A 5-node chain (needs multiple propagation rounds), a 2-clique,
    and an isolated pair: every node must get the component min."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 10), (20, 21)],
        "id_a long, id_b long",
    )
    comp = {r.id: r.comp for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_log_rounds(spark):
    """Star contraction must collapse a 60-link chain within
    O(log n) alternations — 10 iterations would be far too few for
    one-hop label propagation (needs 60)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    comp = dedup.connected_components(
        pairs, max_iterations=10, driver_max_edges=0
    ).collect()
    assert {r.comp for r in comp} == {0} and len(comp) == 61


def test_connected_components_scattered_ids(spark):
    """A tree whose ids are NOT monotone along paths — the case where
    naive pointer-jumping stalls (an intermediate label can itself be
    unconverged). Star operations contract regardless of id layout."""
    # path graph over a shuffled id sequence (deterministic)
    ids = [(i * 37) % 101 for i in range(101)]  # a permutation of 0..100
    pairs = spark.createDataFrame(
        list(zip(ids, ids[1:])), "id_a long, id_b long"
    )
    comp = dedup.connected_components(
        pairs, max_iterations=12, driver_max_edges=0
    ).collect()
    assert {r.comp for r in comp} == {0} and len(comp) == 101


def test_connected_components_driver_distributed_parity(spark):
    """The size-gated driver union-find and the distributed star loop
    must emit IDENTICAL (id, comp=min reachable id) labels — chains,
    cliques, scattered ids, and an isolated pair together."""
    ids = [(i * 37) % 101 for i in range(101)]
    edges = (
        list(zip(ids, ids[1:]))  # scattered-id path graph
        + [(200 + i, 200 + j) for i in range(5) for j in range(i)]  # clique
        + [(300, 301)]
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {(r.id, r.comp) for r in dedup.connected_components(pairs).collect()}
    dist = {
        (r.id, r.comp)
        for r in dedup.connected_components(pairs, driver_max_edges=0).collect()
    }
    assert fast == dist
    assert {c for _, c in fast} == {0, 200, 300}


def test_near_dedup_keep(spark):
    rows = [(1, "a b c"), (2, "a b c"), (3, "x y z"), (7, "solo doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in dedup.near_dedup_keep(df, pairs).collect())
    assert kept == [1, 3, 7]  # 2 deduped against 1; unpaired docs kept


def _clustered_vectors(n_clusters=40, per=4, dim=64, noise=0.01):
    """Deterministic clustered embeddings (md5-derived, no RNG state):
    `per` noisy copies per cluster base -> within-cluster cosine
    >= 0.999, cross-cluster near 0. The realistic near-dup regime
    (unlike the driver's near-uniform table, where θ≈69° defeats any
    LSH family by design)."""
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 2**31 - 1.0

    rows, vid = [], 0
    for c in range(n_clusters):
        base = [h(f"b|{c}|{d}") for d in range(dim)]
        for j in range(per):
            v = [base[d] + noise * h(f"n|{c}|{j}|{d}") for d in range(dim)]
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


def test_lsh_candidate_pairs_recall_and_pruning(spark):
    """The 100 TB pair-generation path: on clustered vectors at a real
    near-dup threshold (cos >= 0.97), LSH bucket collisions must find
    every true pair while generating far fewer candidates than n²/2."""
    rows = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n = len(rows)
    true = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs(df, 0.97).collect()
    }
    assert len(true) >= 200  # the within-cluster pairs exist
    cand = {
        (r.id_a, r.id_b)
        for r in similarity.lsh_candidate_pairs(df, dim=64).collect()
    }
    assert true <= cand  # recall 1.0 at this threshold
    assert len(cand) < 0.25 * n * (n - 1) / 2  # and it actually prunes


def test_lsh_candidate_pairs_hub_bucket_chains(spark):
    """A mass-duplicate cluster (identical vectors -> same bucket in
    every table) must emit LINEAR star pairs (min-id anchor), not
    O(m²) all-pairs — and still connect into one component
    downstream. Star (not chain): the anchor comes from a map-side
    combinable groupBy-min + an AQE-splittable equi-join, with no
    per-bucket window anywhere in the plan (r13 rewrite)."""
    v = [1.0] * 16
    rows = [(i, v) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs_df = similarity.lsh_candidate_pairs(df, dim=16, max_bucket=10)
    assert "Window" not in pairs_df._jdf.queryExecution().optimizedPlan().toString()
    pairs = pairs_df.collect()
    # star: 49 anchor pairs (identical across all 16 tables),
    # not C(50,2) = 1225
    assert sorted((r.id_a, r.id_b) for r in pairs) == [(0, i) for i in range(1, 50)]
    comp = dedup.connected_components(
        spark.createDataFrame(pairs, "id_a long, id_b long")
    ).collect()
    assert {r.comp for r in comp} == {0} and len(comp) == 50


def test_knn_join_matches_brute_per_query(spark):
    """Batch kNN join: LSH candidates + exact re-rank must equal the
    brute-force per-query top-k (including rank order), and the plan
    must stay equi-join only."""
    rows = _clustered_vectors(n_clusters=25)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = (
        df.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    )
    got = similarity.knn_join(df, queries, k=4)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
    for qid in range(8):
        brute = [
            r.vec_id
            for r in similarity.topk_brute(df, rows[qid][1], k=4).collect()
        ]
        assert [v for _, v in sorted(by_q[qid])] == brute
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_embedding_near_dedup_lsh_matches_exact(spark):
    """End-to-end embedding near-dedup: the LSH-candidate path (with
    exact cosine refilter) produces the same keep-set as the exact
    cross-join path — one representative per planted cluster."""
    rows = _clustered_vectors(n_clusters=25)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = sorted(r.vec_id for r in dedup.embedding_near_dedup(df, 0.97).collect())
    lsh = sorted(
        r.vec_id
        for r in dedup.embedding_near_dedup(
            df, 0.97, candidates=similarity.lsh_candidate_pairs(df, dim=64)
        ).collect()
    )
    assert exact == lsh == [4 * c for c in range(25)]  # min id per cluster


def test_semantic_dedup_matches_exact_on_clusters(spark):
    """SemDeDup composition (k-means cells -> within-cell pairs ->
    refilter -> components): on clustered vectors it must produce the
    same keep-set as the exact cross-join path, scanning only
    within-cell pairs."""
    rows = _clustered_vectors(n_clusters=25)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = sorted(r.vec_id for r in dedup.embedding_near_dedup(df, 0.97).collect())
    # fewer cells than clusters: each tight cluster lands wholly in one
    # cell (internal spread << inter-cluster distance), so within-cell
    # pair generation loses nothing
    sem = sorted(
        r.vec_id for r in dedup.semantic_dedup(df, 0.97, n_cells=8, iters=3).collect()
    )
    assert sem == exact == [4 * c for c in range(25)]


def test_ivf_fit_replayable_mode_is_deterministic(spark):
    """The graded k-means path (seeds= + round_digits=9): two fits
    over different physical layouts of the same data must produce
    bit-identical centroids (the 9dp rounding pins every iterate),
    recover the planted clusters, and carry an empty cell's seed
    forward unchanged."""
    rows = _clustered_vectors(n_clusters=4)
    seeds = [rows[0][1], rows[4][1], rows[8][1], rows[12][1],
             [0.0] * 64]  # 5th seed: zero vector -> empty cell
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df8 = df1.repartition(8)
    c1 = similarity.ivf_fit(df1, 64, k=5, iters=2, seeds=seeds, round_digits=9)
    c2 = similarity.ivf_fit(df8, 64, k=5, iters=2, seeds=seeds, round_digits=9)
    assert c1 == c2
    # the zero seed scores 0 against everything; every vector prefers
    # a real centroid, so cell 4 stays empty and keeps its (zero) seed
    assert c1[4] == [0.0] * 64
    # real cells converge to distinct near-unit centroids
    import numpy as np

    C = np.asarray(c1[:4])
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0, atol=1e-6)
    assert (np.round(C @ C.T, 2) < 0.99).sum() == 12  # off-diagonal distinct


def test_ivf_topk_on_clustered_vectors(spark):
    """IVF (learned centroids + nprobe cells): on clustered data the
    probed cells must contain the true high-cosine neighbors, so the
    exact re-rank equals brute top-k — while scanning a fraction of
    the table."""
    rows = _clustered_vectors(n_clusters=25)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.ivf_fit(df, dim=64, k=25, iters=2)
    qvec = rows[0][1]
    brute = [r.vec_id for r in similarity.topk_brute(df, qvec, k=4).collect()]
    ivf = [r.vec_id for r in similarity.ivf_topk(df, cents, qvec, k=4, nprobe=3).collect()]
    assert ivf == brute  # the whole planted cluster, in order

    # the probed cells scan a fraction of the table, not all of it
    import numpy as np

    C = np.asarray(cents)
    q = np.asarray(qvec)
    probes = [int(i) for i in np.argsort(-(C @ (q / np.linalg.norm(q))))[:3]]
    scanned = df.filter(similarity.ivf_assign_col(cents).isin(probes)).count()
    assert scanned < 40  # 3 of 25 cells over 100 clustered vectors


def test_ann_recall_vs_brute(spark, emb):
    """Recall >= 0.9 per query on the hardest case (near-uniform
    embeddings, top-neighbor cosine ~0.37). Deterministic: planes are
    md5-seeded, so this is a regression bar, not a flaky sample."""
    recalls = []
    for qid in (0, 13, 26, 39):
        qvec = list(emb.filter(F.col("vec_id") == qid).first()["embedding"])
        brute = [r.vec_id for r in similarity.topk_brute(emb, qvec, k=10).collect()]
        ann = [r.vec_id for r in similarity.lsh_bucketed_topk(emb, qvec, k=10).collect()]
        if qid == 0:
            assert ann[0] == 0  # the query vector itself is its own nearest
        recalls.append(len(set(brute) & set(ann)) / 10)
    assert min(recalls) >= 0.9, f"ANN recall too low: {recalls}"


def test_lang_id_on_clear_text(spark):
    rows = [
        (1, "the cat and the dog is in the house"),
        (2, "der hund und die katze ist ein tier"),
        (3, "el perro y la casa es un animal"),
        (4, "zzz qqq www"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.lang for r in
           df.select("doc_id", text.lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "und"}


def test_quality_score_ordering(spark):
    rows = [(1, "the quick brown fox jumps over a lazy dog and it is fine"),
            (2, "x x x x x x x x x x x x"),
            (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.q for r in
           df.select("doc_id", text.quality_score(F.col("text")).alias("q")).collect()}
    assert got[1] > got[2] > got[3] == 0.0


def test_multimodal_fake_decode(spark):
    from balboa_spark.operators.multimodal import MEDIA_ASSET, fake_decode_media

    rows = [
        (1, "image", bytearray(b"0123456789abcdef"), "fake", 4, 4, None),
        (2, "audio", bytearray(b""), "fake", None, None, 1000),
    ]
    df = spark.createDataFrame(rows, MEDIA_ASSET)
    out = {r.asset_id: r for r in fake_decode_media(df, feature_dim=4).collect()}
    assert out[1].n_bytes == 16
    assert len(out[1].features) == 4
    assert out[1].features[0] == ord("0") / 256.0  # deterministic
    assert out[2].features is None  # empty payload -> no features
    assert out[2].n_bytes == 0


def test_multimodal_fake_sample_frames(spark):
    """The 1->N explode shape of a video frame sampler: one asset row
    yields one frame per every_ms of duration; null/zero-duration and
    empty-payload assets yield none."""
    from balboa_spark.operators.multimodal import MEDIA_ASSET, fake_sample_frames

    rows = [
        (1, "video", bytearray(bytes(range(100))), "fake", None, None, 2500),
        (2, "video", bytearray(b""), "fake", None, None, 2500),
        (3, "video", bytearray(b"xy"), "fake", None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_ASSET)
    out = fake_sample_frames(df, every_ms=1000).collect()
    frames = sorted((r.frame_idx, r.ts_ms) for r in out)
    # 2500 ms at 1000 ms cadence -> frames at 0, 1000, 2000
    assert frames == [(0, 0), (1, 1000), (2, 2000)]
    assert all(r.asset_id == 1 for r in out)
    by_idx = {r.frame_idx: bytes(r.frame_payload) for r in out}
    assert by_idx[0][0] == 0  # offset 0
    assert by_idx[1][0] == 40  # 100 * 1000/2500
    # deterministic across runs
    again = {r.frame_idx: bytes(r.frame_payload) for r in fake_sample_frames(df, 1000).collect()}
    assert again == by_idx


def test_chunk_media_time_windows_and_tail(spark):
    """Time-window segmentation: non-overlapping default covers the
    duration exactly; overlapping stride carries context; tail chunk
    clips to duration; null/zero durations emit nothing; the plan is a
    pure explode (no shuffle, no Python)."""
    from balboa_spark.operators.multimodal import chunk_media_time

    df = spark.createDataFrame(
        [(1, 70_000), (2, 30_000), (3, 5_000), (4, None), (5, 0)],
        "asset_id long, duration_ms long",
    )
    out = {}
    for r in chunk_media_time(df, window_ms=30_000).collect():
        out.setdefault(r.asset_id, []).append((r.chunk_idx, r.start_ms, r.end_ms))
    assert sorted(out[1]) == [(0, 0, 30_000), (1, 30_000, 60_000), (2, 60_000, 70_000)]
    assert out[2] == [(0, 0, 30_000)]  # exact fit -> one chunk
    assert out[3] == [(0, 0, 5_000)]  # shorter than a window
    assert 4 not in out and 5 not in out
    ov = {}
    for r in chunk_media_time(df, window_ms=30_000, stride_ms=20_000).collect():
        ov.setdefault(r.asset_id, []).append((r.start_ms, r.end_ms))
    assert sorted(ov[1]) == [(0, 30_000), (20_000, 50_000), (40_000, 70_000)]
    plan = (
        chunk_media_time(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_patch_grid_tiles_and_clips(spark):
    """ViT patch grid: full cover with clipped edge patches; a
    patch-aligned image tiles exactly; degenerate dims emit nothing."""
    from balboa_spark.operators.multimodal import patch_grid

    df = spark.createDataFrame(
        [(1, 40, 20), (2, 32, 16), (3, 0, 10), (4, None, 10)],
        "asset_id long, width int, height int",
    )
    out = {}
    for r in patch_grid(df, patch=16).collect():
        out.setdefault(r.asset_id, []).append(
            (r.patch_row, r.patch_col, r.x0, r.y0, r.x1, r.y1)
        )
    # 40x20 at P=16 -> 2 rows x 3 cols; edges clip to 40/20
    assert sorted(out[1]) == [
        (0, 0, 0, 0, 16, 16), (0, 1, 16, 0, 32, 16), (0, 2, 32, 0, 40, 16),
        (1, 0, 0, 16, 16, 20), (1, 1, 16, 16, 32, 20), (1, 2, 32, 16, 40, 20),
    ]
    assert sorted(out[2]) == [(0, 0, 0, 0, 16, 16), (0, 1, 16, 0, 32, 16)]
    assert 3 not in out and 4 not in out
    # union of patches covers every pixel exactly once (area check)
    area = sum((x1 - x0) * (y1 - y0) for _, _, x0, y0, x1, y1 in out[1])
    assert area == 40 * 20


def test_multimodal_codec_gates_raise_without_libs(spark):
    """Where Pillow/av are absent the codec operators must fail fast
    with NotImplementedError (not at the first Arrow batch). In an
    environment WITH the libs the real paths activate instead — see
    test_media_codecs.py for their gated integration tests."""
    from balboa_spark.operators import multimodal

    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            multimodal.decode_media(None)
        with pytest.raises(NotImplementedError):
            multimodal.resize_images(None, 1, 1)
    try:
        import av  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            multimodal.sample_frames(None, 1000)


def test_quantize_int8_roundtrip(spark):
    """Symmetric int8 quantization: qvec * scale reconstructs within
    half a quantization step; extremes hit ±127; zero vector -> zeros
    with scale 0; plan is a pure projection (no shuffle, no UDF)."""
    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in similarity.quantize_int8(df).collect()}
    q1, s1 = got[1]["qvec"], got[1]["scale"]
    # scale is rounded to 6 decimals for cross-engine hash stability
    assert q1 == [64, -127, 32, 0] and abs(s1 - 1.0 / 127) < 5e-7
    for orig, q in zip(rows[0][1], q1):
        assert abs(q * s1 - orig) <= s1 / 2 + 1e-9
    assert got[2]["qvec"] == [0, 0, 0, 0] and got[2]["scale"] == 0.0
    plan = (
        similarity.quantize_int8(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_random_project_numpy_parity_and_distortion(spark):
    """random_project must equal the driver-side numpy matmul exactly,
    and roughly preserve relative distances (JL property) on clustered
    vectors: within-cluster distances stay well below cross-cluster."""
    import numpy as np

    rows = _clustered_vectors(n_clusters=6)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: np.array(r["pvec"])
        for r in similarity.random_project(df, dim=64, out_dim=16).collect()
    }
    P = similarity._plane_matrix(64, 16, "balboa-rp") / np.sqrt(16)
    for vid, vec in rows[:10]:
        want = np.round(np.asarray(vec) @ P.T, 6)
        assert np.allclose(got[vid], want, atol=1e-9)
    # within-cluster (ids 0..3) vs cross-cluster (0 vs 4) separation
    within = max(
        np.linalg.norm(got[0] - got[j]) for j in range(1, 4)
    )
    across = np.linalg.norm(got[0] - got[4])
    assert within < 0.5 * across


def test_pq_encode_nearest_centroid_and_stability(spark):
    """PQ: a vector assembled FROM codebook centroids must encode to
    exactly those codes with sub_err 0; arbitrary vectors get the true
    per-subspace argmin (numpy cross-check); codes are stable under
    repartitioning; and the residual shrinks as k grows (a finer
    codebook can only get closer)."""
    import numpy as np

    C = similarity.pq_codebook(16, m=4, k=8)
    # vec 1: centroids (sub j -> code 2j % 8) concatenated verbatim
    picked = [2 * j % 8 for j in range(4)]
    v1 = [float(x) for j in range(4) for x in C[j, picked[j]]]
    rows = _clustered_vectors(n_clusters=3, per=2, dim=16)
    df = spark.createDataFrame(
        [(100, v1)] + rows, "vec_id long, embedding array<double>"
    )
    out = similarity.pq_encode(df, dim=16, m=4, k=8).collect()
    enc = {}
    for r in out:
        enc.setdefault(r.vec_id, {})[r.sub] = (r.code, r.sub_err)
    assert [enc[100][j] for j in range(4)] == [(c, 0.0) for c in picked]
    # numpy argmin parity on an arbitrary vector
    vid, vec = rows[0]
    X = np.asarray(vec).reshape(4, 4)
    for j in range(4):
        D = ((X[j][None, :] - C[j]) ** 2).sum(-1)
        assert enc[vid][j][0] == int(D.argmin())
        assert abs(enc[vid][j][1] - round(float(D.min()), 6)) < 1e-9
    out2 = similarity.pq_encode(df.repartition(5), dim=16, m=4, k=8).collect()
    assert {(r.vec_id, r.sub, r.code) for r in out2} == {
        (r.vec_id, r.sub, r.code) for r in out
    }
    # finer codebook -> residual can only shrink (on the total err)
    err8 = sum(r.sub_err for r in out)
    err32 = sum(
        r.sub_err for r in similarity.pq_encode(df, dim=16, m=4, k=32).collect()
    )
    assert err32 <= err8 + 1e-9


def test_mean_pool_components_and_norm(spark):
    """Chunk->doc pooling: component-wise mean per group, unit L2 norm
    when normalize=True, NULL vectors ignored, all-NULL groups vanish,
    and numpy parity on the unnormalized means."""
    import numpy as np

    rows = [
        (1, "a", [1.0, 0.0, 3.0, 0.0]),
        (2, "a", [3.0, 2.0, 1.0, 0.0]),
        (3, "b", [0.0, 0.0, 0.0, 0.0]),
        (4, "b", None),
        (5, "c", None),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, grp string, embedding array<double>"
    )
    raw = {
        r.grp: (r.n_pooled, r.embedding)
        for r in similarity.mean_pool(df, "grp", normalize=False).collect()
    }
    assert raw["a"][0] == 2 and raw["a"][1] == [2.0, 1.0, 2.0, 0.0]
    assert raw["b"] == (1, [0.0, 0.0, 0.0, 0.0])  # zero vec kept as-is
    assert "c" not in raw  # all-NULL group vanishes
    unit = {
        r.grp: np.array(r.embedding)
        for r in similarity.mean_pool(df, "grp").collect()
    }
    assert abs(np.linalg.norm(unit["a"]) - 1.0) < 1e-5
    want = np.array([2.0, 1.0, 2.0, 0.0])
    assert np.allclose(unit["a"], np.round(want / np.linalg.norm(want), 6))
    assert np.allclose(unit["b"], 0.0)  # zero norm: unnormalized


def test_pq_topk_adc_recall_and_code_reuse(spark):
    """ADC top-k over PQ codes: on clustered vectors the approximate
    neighbors must recover the query's own cluster (the regime PQ is
    built for), and passing a persisted code table (codes=) must give
    identical results to re-encoding — the index-reuse contract."""
    rows = _clustered_vectors(n_clusters=10, per=5)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qvec = rows[0][1]  # member of cluster 0 = ids 0..4
    got = similarity.pq_topk(df, qvec, k=5, dim=64).collect()
    ids = {r.vec_id for r in got}
    assert len(ids & {0, 1, 2, 3, 4}) >= 4, f"ADC lost the cluster: {ids}"
    # adist sorted ascending, query's own vector nearest
    dists = [r.adist for r in got]
    assert dists == sorted(dists) and got[0].vec_id == 0
    codes = similarity.pq_encode(df, dim=64)
    via_codes = similarity.pq_topk(df, qvec, k=5, dim=64, codes=codes).collect()
    assert [(r.vec_id, r.adist) for r in via_codes] == [
        (r.vec_id, r.adist) for r in got
    ]


def test_compressed_ann_composition_recall(spark):
    """The composed storage scale path — random_project (64->16) +
    quantize_int8, candidates in compressed space, exact re-rank in
    full space — must recover the true top-k on clustered vectors.
    This is the ~16x-smaller-index configuration PERF.md describes."""
    import numpy as np

    rows = _clustered_vectors(n_clusters=25)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    proj = similarity.random_project(df, dim=64, out_dim=16)
    quant = similarity.quantize_int8(proj, vec_col="pvec")
    # reconstruct compressed vectors and take a generous candidate set
    recon = quant.select(
        "vec_id",
        F.transform(
            "qvec", lambda q: q.cast("double") * F.col("scale")
        ).alias("embedding"),
    )
    k = 4
    for qid in (0, 40, 99):
        qfull = rows[qid][1]
        qproj = list(
            np.asarray(qfull)
            @ (similarity._plane_matrix(64, 16, "balboa-rp") / 4.0).T
        )
        cand = {
            r["vec_id"]
            for r in similarity.topk_brute(recon, qproj, k=3 * k).collect()
        }
        true = [
            r["vec_id"] for r in similarity.topk_brute(df, qfull, k=k).collect()
        ]
        # exact re-rank of compressed-space candidates == true top-k
        rerank = [
            r["vec_id"]
            for r in similarity.topk_brute(
                df.filter(F.col("vec_id").isin(list(cand))), qfull, k=k
            ).collect()
        ]
        assert len(set(true) & set(rerank)) >= k - 1  # >= 0.75 recall per query


def test_minhash_estimate_tracks_exact_jaccard(spark):
    """The signature estimate must be unbiased enough to separate the
    planted near-dup (true J ~ high) from unrelated docs, and identical
    docs must score exactly 1.0."""
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i j"),   # identical -> est 1.0
        (3, "a b c d e f g h i k"),   # near-dup of 1
        (4, "q r s t u v w x y z"),   # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_estimate_pairs(df, max_bucket=2**31 - 1).collect()
    }
    assert out[(1, 2)] == 1.0
    assert out[(1, 3)] > 0.3          # near-dup scores high-ish
    assert (1, 4) not in out          # unrelated never collides


def test_vector_store_upsert_selective_and_exact(spark, emb, tmp_path):
    """Incremental upsert: adds new vectors, replaces an existing one
    (stale index entries dropped via recomputed old codes), leaves
    untouched partitions hard-linked from the previous generation,
    and post-upsert topk equals brute force over the updated corpus."""
    import os

    from balboa_spark.operators import similarity
    from balboa_spark.operators.vector_store import VectorStore

    vs = VectorStore(spark, str(tmp_path / "vsu"), num_id_buckets=8)
    first = emb.filter(F.col("vec_id") < 400).select("vec_id", "embedding")
    vs.write(first, dim=64)

    # batch = the remaining vectors PLUS vec 0 replaced by vec 1's
    # embedding (so a probe with vec 1's embedding must now return
    # vec 0 at cosine 1.0 — only possible if the stale index entries
    # for vec 0's OLD embedding were dropped and new ones added)
    v1 = emb.filter(F.col("vec_id") == 1).first()["embedding"]
    rest = emb.filter(F.col("vec_id") >= 400)
    replaced = spark.createDataFrame(
        [(0, list(v1))], "vec_id long, embedding array<float>"
    )
    vs.upsert(rest.select("vec_id", "embedding").unionByName(replaced))

    updated = (
        emb.filter(F.col("vec_id") > 0)
        .select("vec_id", "embedding")
        .unionByName(replaced)
    )
    got = [(r.vec_id, round(r.cos, 6)) for r in vs.topk(v1, k=5).collect()]
    brute = [
        (r.vec_id, round(r.cos, 6))
        for r in similarity.topk_brute(updated, list(v1), k=5).collect()
    ]
    assert got == brute
    assert {vid for vid, _ in got[:2]} == {0, 1}  # the replaced pair leads

    # store totals are exact after replace + append
    assert vs.main().count() == emb.count()
    # two generations exist (vacuum keeps 2); gen-1 is current
    gens = sorted(e for e in os.listdir(vs.path) if e.startswith("gen-"))
    assert gens == ["gen-0", "gen-1"]
    # at least one index code partition was carried by hard link (same
    # inode in both generations) — the selective-rewrite signature
    shared = 0
    for sub in ("main", "index"):
        old_sub, new_sub = (
            os.path.join(vs.path, g, sub) for g in ("gen-0", "gen-1")
        )
        for part in os.listdir(new_sub):
            op, np_ = os.path.join(old_sub, part), os.path.join(new_sub, part)
            if os.path.isdir(op) and os.path.isdir(np_):
                ofiles = {
                    f: os.stat(os.path.join(op, f)).st_ino
                    for f in os.listdir(op)
                    if f.endswith(".parquet")
                }
                for f, ino in ofiles.items():
                    nf = os.path.join(np_, f)
                    if os.path.exists(nf) and os.stat(nf).st_ino == ino:
                        shared += 1
    assert shared > 0


def test_vector_store_crash_mid_upsert_keeps_old_generation(spark, emb, tmp_path):
    """A gen directory without a manifest flip must be invisible:
    readers keep serving the previous generation."""
    import os
    import shutil

    from balboa_spark.operators.vector_store import VectorStore

    vs = VectorStore(spark, str(tmp_path / "vsc"))
    vs.write(emb.filter(F.col("vec_id") < 100), dim=64)
    # simulate a crash: a half-written next generation, manifest not
    # flipped
    os.makedirs(os.path.join(vs.path, "gen-1", "main"), exist_ok=True)
    assert vs.main().count() == 100
    man = vs._load_manifest()
    assert man["generation"] == 0
    shutil.rmtree(os.path.join(vs.path, "gen-1"))


def test_streaming_vector_index_upsert(spark, emb, tmp_path):
    """The embedding-pipeline steady state: vector batches land as
    files -> micro-batches foreachBatch-upsert into the persisted ANN
    index -> queries see every generation's vectors. Exercises
    VectorStore.upsert under Structured Streaming (bootstrap write on
    first batch, selective upsert after)."""
    from balboa_spark.operators import similarity
    from balboa_spark.operators.vector_store import VectorStore

    land = tmp_path / "vland"
    land.mkdir()
    vs = VectorStore(spark, str(tmp_path / "vsidx"))

    emb.filter(F.col("vec_id") < 300).select("vec_id", "embedding").coalesce(
        1
    ).write.parquet(str(land / "b1"))

    stream = spark.readStream.schema("vec_id long, embedding array<float>").option(
        "recursiveFileLookup", "true"
    ).parquet(str(land))

    def sink(batch, _epoch):
        if vs._manifest() is None:
            vs.write(batch, dim=64)
        else:
            vs.upsert(batch)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "vckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    emb.filter(F.col("vec_id") >= 300).select("vec_id", "embedding").coalesce(
        1
    ).write.parquet(str(land / "b2"))
    q2 = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "vckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q2.awaitTermination(120)
    finally:
        q2.stop()

    assert vs.main().count() == emb.count()
    qvec = list(emb.filter(F.col("vec_id") == 350).first()["embedding"])
    got = [(r.vec_id, round(r.cos, 6)) for r in vs.topk(qvec, k=5).collect()]
    brute = [
        (r.vec_id, round(r.cos, 6))
        for r in similarity.topk_brute(
            emb.select("vec_id", "embedding"), qvec, k=5
        ).collect()
    ]
    assert got == brute


def test_vector_store_upsert_honors_frozen_manifest_params(spark, emb, tmp_path):
    """A store written with non-default LSH/bucket parameters, then
    reopened with DEFAULT constructor args and upserted, must keep
    hashing with the write-time (manifest) parameters: replaced rows
    are actually replaced, the manifest params survive the commit,
    and queries stay exact."""
    from balboa_spark.operators import similarity
    from balboa_spark.operators.vector_store import VectorStore

    path = str(tmp_path / "vsp")
    writer = VectorStore(
        spark, path, num_tables=6, num_planes=7, seed="custom", num_id_buckets=16
    )
    writer.write(
        emb.filter(F.col("vec_id") < 200).select("vec_id", "embedding"), dim=64
    )

    # reopen with defaults (10/8/'balboa'/8) — must not matter
    handle = VectorStore(spark, path)
    v1 = emb.filter(F.col("vec_id") == 1).first()["embedding"]
    replaced = spark.createDataFrame(
        [(0, list(v1))], "vec_id long, embedding array<float>"
    )
    handle.upsert(replaced)

    man = handle._load_manifest()
    assert (man["num_tables"], man["num_planes"], man["seed"]) == (6, 7, "custom")
    assert man["num_id_buckets"] == 16
    assert handle.main().count() == 200  # replaced, not duplicated
    assert handle.main().filter(F.col("vec_id") == 0).count() == 1

    updated = (
        emb.filter((F.col("vec_id") > 0) & (F.col("vec_id") < 200))
        .select("vec_id", "embedding")
        .unionByName(replaced)
    )
    got = [(r.vec_id, round(r.cos, 6)) for r in handle.topk(list(v1), k=5).collect()]
    brute = [
        (r.vec_id, round(r.cos, 6))
        for r in similarity.topk_brute(updated, list(v1), k=5).collect()
    ]
    assert got == brute


def test_seed_centroid_scores_ranks_in_domain_higher(spark):
    from balboa_spark.operators.similarity import seed_centroid_scores

    seeds = spark.createDataFrame(
        [(i, [1.0, 0.05 * i, 0.0]) for i in range(4)],
        ["vec_id", "embedding"],
    )
    cands = spark.createDataFrame(
        [(100, [0.9, 0.1, 0.0]), (101, [0.0, 0.0, 1.0]), (102, [-1.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: r["seed_cos"] for r in seed_centroid_scores(cands, seeds).collect()}
    assert out[100] > 0.99 and abs(out[101]) < 0.1 and out[102] < -0.99
    # the centroid joins back as a broadcast, never a shuffled join
    plan = (
        seed_centroid_scores(cands, seeds)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_media_to_vector_store_end_to_end(spark, tmp_path):
    """The multimodal indexing composition a real pipeline runs:
    binary assets -> (stubbed) feature extraction via mapInPandas ->
    persisted ANN index -> nearest-asset retrieval. The decode is the
    deterministic fake (no codecs in this container); every Spark
    seam — batch shape, schema, store layout, partition-pruned probe
    — is the production path."""
    from balboa_spark.operators.multimodal import (
        MEDIA_ASSET,
        fake_decode_media,
    )
    from balboa_spark.operators.vector_store import VectorStore

    base = bytes(range(16, 16 + 64))
    near = bytes([base[0] + 1]) + base[1:]  # one byte off -> near dup
    far = bytes(reversed(base))
    rows = [
        (1, "image", bytearray(base), "fake", 8, 8, None),
        (2, "image", bytearray(near), "fake", 8, 8, None),
        (3, "image", bytearray(far), "fake", 8, 8, None),
    ]
    assets = spark.createDataFrame(rows, MEDIA_ASSET)
    feats = (
        fake_decode_media(assets, feature_dim=8)
        .filter(F.col("features").isNotNull())
        .select(
            F.col("asset_id").alias("vec_id"),
            F.col("features").alias("embedding"),
        )
    )
    vs = VectorStore(spark, str(tmp_path / "media_vs"))
    vs.write(feats, dim=8)

    qvec = [float(b) / 256.0 for b in base[:: max(1, 64 // 8)]][:8]
    got = [r.vec_id for r in vs.topk(qvec, k=2).collect()]
    assert got[0] == 1 and got[1] == 2  # exact asset, then the near-dup


def test_streaming_incremental_corpus_pipeline_e2e(spark, tmp_path):
    """The incremental corpus-ingest story, end to end: document
    batches land as files -> foreachBatch runs the quality gate ->
    MinHashDedupStore filters near-dups against ALL history -> the
    survivors upsert into the persisted BM25 index. Asserts the
    composed contract: a gated-out doc and a cross-batch near-dup
    never reach the index; everything else is queryable after each
    batch."""
    import json as _json
    import os

    from balboa_spark.operators import corpus
    from balboa_spark.operators.dedup_store import MinHashDedupStore
    from balboa_spark.operators.search import PostingsIndex

    land = tmp_path / "cland"
    land.mkdir()
    store = MinHashDedupStore(spark, str(tmp_path / "bands"))
    idx = PostingsIndex(spark, str(tmp_path / "ppidx"))

    def uniq(i):
        return [f"w{i}x{j}" for j in range(40)] + ["needle"]

    def write_batch(name, rows):
        (land / name).write_text(
            "\n".join(_json.dumps(r) for r in rows)
        )

    def doc(i, words):
        return {"doc_id": i, "text": " ".join(words)}

    write_batch(
        "b1.ndjson",
        [doc(1, uniq(1)), doc(2, uniq(2)), doc(3, ["dup"] * 5)],
    )

    def handle(batch, _epoch):
        gated = corpus.gopher_filter(batch, passthrough=("text",)).filter(
            "keep"
        )
        kept = store.process_batch(gated.select("doc_id", "text"))
        if kept.count():
            if os.path.exists(os.path.join(idx.path, idx.MANIFEST)):
                idx.upsert(kept)
            else:
                idx.build(kept)

    stream = spark.readStream.schema("doc_id long, text string").json(
        str(land)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: doc 4 is new; doc 5 is a near-dup of doc 1 (its
        # text minus the last token — the planted-variant trick)
        write_batch(
            "b2.ndjson", [doc(4, uniq(4)), doc(5, uniq(1)[:-1])]
        )
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(r.doc_id for r in idx.topk(["needle"], k=10).collect())
    # doc 3 failed the quality gate; doc 5 near-duped doc 1
    assert got == [1, 2, 4]
    man = idx._manifest()
    assert man["n"] == 3 and man["generation"] == 1


def test_vector_store_filtered_topk_both_arms(spark, emb, tmp_path):
    """Filtered ANN: an unselective predicate rides the post-filter
    ANN path and must equal brute-force over the filtered relation;
    a highly selective predicate (fewer matches than probe buckets
    can guarantee) escalates to the exact pre-filter scan and must
    return exactly the matching rows, ranked."""
    from balboa_spark.operators.vector_store import VectorStore

    tagged = emb.withColumn("tag", (F.col("vec_id") % 4).cast("int"))
    vs = VectorStore(spark, str(tmp_path / "vsf"))
    vs.write(tagged, dim=64)
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])

    # unselective: 1/4 of the corpus matches
    got = [r.vec_id for r in vs.topk_filtered(
        qvec, F.col("tag") == 0, k=5).collect()]
    brute = [r.vec_id for r in similarity.topk_brute(
        tagged.filter(F.col("tag") == 0), qvec, k=5).collect()]
    assert got == brute
    # every returned row satisfies the predicate by construction
    assert all(v % 4 == 0 for v in got)

    # selective: exactly 3 ids match -> escalation must return all 3
    sel = F.col("vec_id").isin([7, 77, 177])
    got_sel = [r.vec_id for r in vs.topk_filtered(qvec, sel, k=5).collect()]
    brute_sel = [r.vec_id for r in similarity.topk_brute(
        tagged.filter(sel), qvec, k=5).collect()]
    assert got_sel == brute_sel and sorted(got_sel) == [7, 77, 177]


def test_vector_store_generation_time_travel(spark, emb, tmp_path):
    """VectorStore main/topk accept generation= for snapshot reads
    (probes stay valid — LSH params are frozen across generations)."""
    from balboa_spark.operators.vector_store import VectorStore

    vs = VectorStore(spark, str(tmp_path / "vstt"))
    vs.write(emb.filter(F.col("vec_id") < 200), dim=64)
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    before = [r.vec_id for r in vs.topk(qvec, k=5).collect()]
    vs.upsert(
        emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 260))
    )
    assert vs.generations() == [0, 1]
    assert vs.main(generation=0).count() == 200
    assert vs.main().count() == 260
    assert [r.vec_id for r in vs.topk(qvec, k=5, generation=0).collect()] == before
    with pytest.raises(ValueError, match="not retained"):
        vs.main(generation=7)


def test_semantic_order_assignment_ranking_and_zero_vectors(spark):
    """semantic_order (r15, the ICLM packing-order proxy): every
    vector gets its rounded-cosine argmax cell (min-cell ties), a
    zero vector scores 0.0 against every centroid (the cosine
    contract) and still lands deterministically in cell 0, and the
    documented consumer sort (cell, sim DESC, id) groups
    cluster-mates adjacent with closest-to-centroid first."""
    from balboa_spark.operators import similarity

    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [10.0, 0.0]),    # exactly centroid 0
        (2, [9.0, 1.0]),     # near centroid 0
        (3, [0.0, 5.0]),     # exactly centroid 1
        (4, [1.0, 9.0]),     # near centroid 1
        (5, [0.0, 0.0]),     # zero vector -> sim 0 everywhere -> cell 0
        (6, [3.0, 3.0]),     # exact tie -> min cell (0)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: (r.cell, r.sim)
        for r in similarity.semantic_order(df, cents).collect()
    }
    assert got[1] == (0, 1.0) and got[3] == (1, 1.0)
    assert got[2][0] == 0 and got[4][0] == 1
    assert got[5] == (0, 0.0)
    assert got[6][0] == 0 and got[6][1] == round(0.5 ** 0.5, 6)
    ordered = sorted(got, key=lambda i: (got[i][0], -got[i][1], i))
    # cluster 0 streams closest-first (1 before 2), then cluster 1
    assert ordered == [1, 2, 6, 5, 3, 4]


def test_semantic_order_feeds_pack_sequences(spark):
    """The consumer recipe end to end: semantic_order keys -> a
    sortable pack id -> pack_sequences. All of topic-cluster 0's
    tokens appear in the packed stream before any of cluster 1's —
    related documents share context windows (the in-context-
    pretraining property the operator exists for)."""
    from balboa_spark.operators import corpus, similarity

    cents = [[1.0, 0.0], [0.0, 1.0]]
    docs = [
        (1, "alpha alpha alpha alpha", [9.0, 1.0]),
        (2, "beta beta beta beta", [1.0, 9.0]),
        (3, "alpha2 alpha2 alpha2", [8.0, 2.0]),
        (4, "beta2 beta2 beta2", [2.0, 8.0]),
        (5, "alpha3 alpha3", [10.0, 0.0]),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, embedding array<double>"
    )
    so = similarity.semantic_order(
        df.select(F.col("doc_id").alias("vec_id"), "embedding"), cents
    )
    keyed = df.join(
        so.withColumnRenamed("vec_id", "doc_id"), "doc_id"
    ).select(
        F.format_string(
            "%02d|%09d|%06d",
            F.col("cell"),
            ((1.0 - F.col("sim")) * 1e8).cast("long"),  # sim DESC
            F.col("doc_id"),
        ).alias("pack_id"),
        "text",
        "cell",
    )
    packed = corpus.pack_sequences(
        keyed, seq_len=5, id_col="pack_id", text_col="text"
    ).orderBy("seq_id")
    stream = " ".join(r.seq_text for r in packed.collect()).split()
    first_beta = min(
        i for i, t in enumerate(stream) if t.startswith("beta")
    )
    assert all(not t.startswith("alpha") for t in stream[first_beta:])
    # and within cluster 0, closest-to-centroid (doc 5, sim 1.0) first
    assert stream[0] == "alpha3"
