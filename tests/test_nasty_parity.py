"""Regression pins for the adversarial-fixture audit (r13).

scripts/nasty_fixtures.py + driver_sim found eight cross-engine /
robustness bug classes that the clean driver fixtures could never
show. Each fix gets a fast unit pin here so the classes cannot
silently regress between audit runs (the full audit is
`python scripts/nasty_fixtures.py /tmp/nasty_sf &&
SPARK_GRAFT_SF_DIR=/tmp/nasty_sf python scripts/driver_sim.py`).
"""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from balboa_spark.operators import corpus, similarity, temporal


def test_cosine_zero_vector_is_zero_not_crash(spark):
    """A single all-zeros embedding must not kill the job (ANSI
    DIVIDE_BY_ZERO took down 9 graded entries); defined semantic:
    cosine with a zero vector is 0.0."""
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [0.0, 0.0]), (2, [2.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: r.cos
        for r in similarity.topk_brute(df, [1.0, 2.0], k=3).collect()
    }
    assert got[1] == 0.0 and got[0] == 1.0 and got[2] == 1.0


def test_mean_pool_canonicalizes_negative_zero(spark):
    """Component means of exactly 0 must serialize as '0', not '-0'
    (engines legitimately differ in summation order sign)."""
    df = spark.createDataFrame(
        [(7, [-3.0, 0.5]), (7, [3.0, 0.5])],
        "label int, embedding array<float>",
    )
    vec = similarity.mean_pool(df, "label", normalize=False).first()["embedding"]
    assert str(vec[0]) == "0.0"  # not -0.0


def test_resample_pre1970_floor_bucket_matches_duckdb(spark):
    """Truncate-vs-floor: a 1969-12-31T23:59:30 event belongs to
    bucket -1 (=-86400s) on BOTH engines; bare integer division puts
    it in bucket 0 on either side (Spark div AND DuckDB // truncate)."""
    df = spark.createDataFrame(
        [(1, 10, dt.datetime(1969, 12, 31, 23, 59, 30), 2.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    row = temporal.resample_events(df, step=86400).first()
    assert row.bucket_start == -86400 and row.n_events == 1
    # the oracle identity used in EVENTS_RESAMPLE_ORACLE
    s = 86400 * 1_000_000
    assert duckdb.sql(
        f"SELECT (x - ((x % {s}) + {s}) % {s}) // {s} FROM (SELECT -30000000 AS x)"
    ).fetchone()[0] == -1
    # DuckDB's bare // truncates — the reason the identity is needed
    assert duckdb.sql("SELECT -30000000 // 86400000000").fetchone()[0] == 0


def test_anomaly_survives_huge_value(spark):
    """One absurd reading (1e15) must not overflow the squared-cents
    accumulator and kill the job (decimal(38,0) path)."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            (1, 5, base, 1.0),
            (2, 5, base + dt.timedelta(minutes=1), 1e15),
            (3, 5, base + dt.timedelta(minutes=2), 2.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = temporal.anomaly_scores(df).orderBy("event_id").collect()
    assert len(out) == 3  # no ARITHMETIC_OVERFLOW
    assert out[2].is_anomaly is not None  # window with variance scores


def test_finite_cents_maps_nonfinite_to_null(spark):
    """NaN/±Inf readings must not kill cents-typed kernels with an
    ANSI CAST_OVERFLOW; they map to NULL and aggregates skip them."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            (1, 5, base, 1.5),
            (2, 5, base + dt.timedelta(minutes=1), float("nan")),
            (3, 5, base + dt.timedelta(minutes=2), float("inf")),
            (4, 5, base + dt.timedelta(minutes=3), float("-inf")),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: (r.n_trailing, r.sum_value_cents_trailing)
        for r in temporal.rolling_features(df).collect()
    }
    # every row counts; only the finite reading contributes cents
    assert out == {1: (1, 150), 2: (2, 150), 3: (3, 150), 4: (4, 150)}


def test_conversation_turns_excludes_null_timestamps(spark):
    """An unstamped event cannot be ordered into a conversation;
    NULL-ts rows are excluded by contract (Spark windows sort NULLs
    FIRST, DuckDB LAST — letting one through diverges the engines)."""
    from balboa_spark.operators import sft

    df = spark.createDataFrame(
        [
            (1, "u", dt.datetime(2024, 1, 1, 0, 0), "a", None),
            (2, "u", None, "b", None),
            (3, "u", dt.datetime(2024, 1, 1, 0, 5), "c", None),
        ],
        "event_id long, user_id string, ts timestamp, event_type string, props string",
    )
    t = sft.conversation_turns(df).collect()
    assert sorted(r.content for r in t) == ["a ", "c "]


def test_mixture_zero_weight_and_zero_token_groups_do_not_divide(spark):
    """A zero-weight target group and an all-empty-text group must not
    reach an ANSI /0 — both keep nothing, job survives."""
    docs = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "b", "p q"), (3, "c", "")],
        "doc_id long, source string, text string",
    )
    kept = corpus.mixture_resample(docs, {"a": 1.0, "b": 0.0}, group_col="source")
    assert {r.source for r in kept.collect()} <= {"a"}
    kept2 = corpus.mixture_token_budget(
        docs, {"a": 100, "c": 100}, group_col="source"
    )
    assert {r.source for r in kept2.collect()} == {"a"}


def test_bm25_null_text_is_zero_length_doc(spark):
    """NULL text = dl 0, still counted in N (the PostingsIndex
    manifest contract): scores must equal those of an explicit
    empty-string doc, and never crash."""
    from balboa_spark.operators.search import bm25_topk

    a = spark.createDataFrame(
        [(1, "spark shuffles data"), (2, "spark broadcasts"), (3, None)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(1, "spark shuffles data"), (2, "spark broadcasts"), (3, "")],
        "doc_id long, text string",
    )
    sa = {r.doc_id: r.score for r in bm25_topk(a, ["spark"], k=10).collect()}
    sb = {r.doc_id: r.score for r in bm25_topk(b, ["spark"], k=10).collect()}
    assert sa == sb and 1 in sa and 2 in sa


def test_exact_dedup_store_null_text_dedups_across_batches(spark, tmp_path):
    """NULL fingerprints must dedup like any group across batches
    (sentinel fp): previously the anti-join never matched NULL and
    every NULL doc in every batch survived."""
    from balboa_spark.operators.dedup_store import ExactDedupStore

    store = ExactDedupStore(spark, str(tmp_path / "s"))
    b0 = spark.createDataFrame([(1, None), (2, "x")], "doc_id long, text string")
    b1 = spark.createDataFrame([(3, None), (4, "y")], "doc_id long, text string")
    kept0 = {r.doc_id for r in store.process_batch(b0, epoch_id=0).collect()}
    kept1 = {r.doc_id for r in store.process_batch(b1, epoch_id=1).collect()}
    assert kept0 == {1, 2}
    assert kept1 == {4}  # doc 3's NULL text deduped against doc 1's


def test_wet_bytes_null_text_roundtrips_as_empty(spark):
    """A NULL text row must export as an empty payload, not crash the
    export task."""
    from balboa_spark.sources.wet import _parse_warc_bytes, wet_bytes

    blob = wet_bytes([("urn:1", "https://a", None), ("urn:2", "https://b", "hi")])
    recs = {r[1]: r[6] for r in _parse_warc_bytes("p", blob)}
    assert recs["urn:1"] == "" and recs["urn:2"] == "hi"


def test_sft_render_all_null_content_conversation(spark):
    """A conversation whose every content is NULL (NULL event_type
    upstream) renders as the BARE system prefix on both engines:
    Spark array_join skips NULL pieces; the DuckDB oracle needs
    coalesce(string_agg(...), '') because string_agg over zero
    non-NULL pieces is NULL (ADVICE r14 fix)."""
    from balboa_spark.operators import sft

    turns = spark.createDataFrame(
        [(1, 1, 1, "user", None, dt.datetime(2024, 1, 1, 10, 0))],
        "user_id long, conv_id long, turn_idx int, role string, "
        "content string, ts timestamp",
    )
    got = sft.render_conversations(turns, system_prompt="sys").first()
    assert got.rendered == "<|system|>sys<|end|>"
    assert got.n_turns == 1
    assert got.total_chars == len("<|system|>sys<|end|>")

    oracle = duckdb.sql(
        """
        SELECT '<|system|>sys<|end|>'
               || coalesce(string_agg('<|' || role || '|>' || content
                                      || '<|end|>', '' ORDER BY 1), '')
        FROM (SELECT 'user' AS role, CAST(NULL AS VARCHAR) AS content)
        """
    ).fetchone()[0]
    assert oracle == got.rendered
