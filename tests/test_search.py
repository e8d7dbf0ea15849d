"""Retrieval fusion (operators/search.py rrf_fuse): hand-computed
reciprocal-rank arithmetic, id tie-breaks, absent-list terms, topk."""
def test_rrf_fuse_hand_computed(spark):
    """Two 3-item lists with one shared id: shared doc sums both
    reciprocal ranks; singles keep one term; ties in score rank by id
    ascending."""
    from balboa_spark.operators.search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 5.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(2, 0.9), (7, 0.8)], "doc_id long, score double"
    )
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse([a, b], k=60).collect()
    }
    # list a ranks: 1->1, 2->2 (id tiebreak before 3), 3->3
    # list b ranks: 2->1, 7->2
    assert got == {
        1: round(1 / 61, 9),
        2: round(1 / 62 + 1 / 61, 9),
        3: round(1 / 63, 9),
        7: round(1 / 62, 9),
    }
    # fused order: best first; topk clips
    top = rrf_fuse([a, b], k=60, topk=2).collect()
    assert [r["doc_id"] for r in top] == [2, 1]
    import pytest as _pt

    with _pt.raises(ValueError, match=">= 1"):
        rrf_fuse([])
