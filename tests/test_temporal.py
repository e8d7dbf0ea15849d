"""Temporal operators: as-of join, trailing range windows
(balboa_spark.operators.temporal) and sequence packing
(corpus.pack_sequences)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from balboa_spark.operators import corpus, temporal


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts(10)),  # matches click at :05
            (2, "u", _ts(20)),  # matches click at :20 (inclusive equal ts)
            (3, "u", _ts(3)),   # before any click -> nulls
            (4, "v", _ts(30)),  # other key, own stream
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", 100, _ts(5)),
            ("u", 101, _ts(20)),
            ("u", 102, _ts(25)),  # after every left row -> never matched
            ("v", 200, _ts(29)),
        ],
        "user_id string, c_event_id long, c_ts timestamp",
    )
    out = {
        r["event_id"]: r
        for r in temporal.asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="c_ts", prefix=""
        ).collect()
    }
    assert out[1]["c_event_id"] == 100
    assert out[2]["c_event_id"] == 101  # equal timestamps match (<=)
    assert out[3]["c_event_id"] is None and out[3]["c_ts"] is None
    assert out[4]["c_event_id"] == 200
    # every left column is preserved
    assert set(out[1].asDict()) == {"event_id", "user_id", "ts", "c_event_id", "c_ts"}


def test_asof_join_tiebreak_is_deterministic(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", 7, _ts(5)), ("u", 9, _ts(5)), ("u", 8, _ts(5))],
        "user_id string, c_event_id long, c_ts timestamp",
    )
    got = temporal.asof_join(
        left, right, on=["user_id"], right_ts="c_ts", prefix="", tiebreak="c_event_id"
    ).collect()[0]
    assert got["c_event_id"] == 9  # highest tiebreak wins among equal ts


def test_asof_join_is_joinless_window_plan(spark):
    """The sort-based as-of must compile to union + exchange + window —
    no join operator of any kind (the point: no range explosion)."""
    left = spark.createDataFrame(
        [(1, "u", _ts(1))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", 1, _ts(1))], "user_id string, c_event_id long, c_ts timestamp"
    )
    plan = (
        temporal.asof_join(left, right, on=["user_id"], right_ts="c_ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan


def test_rolling_features_trailing_hour(spark):
    rows = [
        (1, "u", _ts(0), 1.0),
        (2, "u", _ts(30), 2.0),
        (3, "u", _ts(59), 4.0),   # within 1h of event 1 (inclusive)
        (4, "v", _ts(30), 8.0),   # separate key
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double"
    )
    out = {
        r["event_id"]: r
        for r in temporal.rolling_features(
            df, keys=("user_id",), duration_sec=3600
        ).collect()
    }
    assert out[1]["n_trailing"] == 1 and out[1]["sum_value_cents_trailing"] == 100
    assert out[2]["n_trailing"] == 2 and out[2]["sum_value_cents_trailing"] == 300
    assert out[3]["n_trailing"] == 3 and out[3]["sum_value_cents_trailing"] == 700
    assert out[4]["n_trailing"] == 1 and out[4]["sum_value_cents_trailing"] == 800


def test_rolling_features_equal_ts_are_peers(spark):
    # RANGE frames treat identical timestamps as peers: both rows see
    # both values, independent of shuffle order -> deterministic
    df = spark.createDataFrame(
        [(1, "u", _ts(5), 1.0), (2, "u", _ts(5), 2.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    out = {r["event_id"]: r for r in temporal.rolling_features(df).collect()}
    assert out[1]["n_trailing"] == out[2]["n_trailing"] == 2
    assert out[1]["sum_value_cents_trailing"] == 300


def test_funnel_ordered_completion(spark):
    rows = [
        # u completes all three in order
        (1, "u", _ts(1), "signup"),
        (2, "u", _ts(2), "click"),
        (3, "u", _ts(3), "purchase"),
        # v clicks BEFORE signing up -> that click cannot complete
        # stage 2; a later click does
        (4, "v", _ts(1), "click"),
        (5, "v", _ts(2), "signup"),
        (6, "v", _ts(4), "click"),
        # w purchases without ever signing up -> only stage gates at t1
        (7, "w", _ts(1), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, event_type string"
    )
    out = {
        r["user_id"]: r
        for r in temporal.funnel(df, ("signup", "click", "purchase")).collect()
    }
    assert (out["u"]["t1"], out["u"]["t2"], out["u"]["t3"]) == (_ts(1), _ts(2), _ts(3))
    assert out["v"]["t1"] == _ts(2) and out["v"]["t2"] == _ts(4)
    assert out["v"]["t3"] is None
    assert out["w"]["t1"] is None and out["w"]["t2"] is None and out["w"]["t3"] is None


def test_percentile_approx_tracks_exact(spark, tables):
    """The 100 TB percentile path (t-digest sketch) must land near the
    exact sort-based percentile the oracle checks."""
    got = (
        tables["events"]
        .groupBy("event_type")
        .agg(
            F.percentile(F.col("value"), F.lit(0.5)).alias("exact"),
            F.percentile_approx(F.col("value"), F.lit(0.5), F.lit(1000)).alias("approx"),
        )
        .collect()
    )
    for r in got:
        assert abs(r["approx"] - r["exact"]) <= 0.05 * max(r["exact"], 1.0)


def test_pack_sequences_straddles_and_tail(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"a{i}" for i in range(5))),
            (2, " ".join(f"b{i}" for i in range(4))),
            (3, ""),  # zero tokens: contributes nothing
            (4, "c0 c1"),
        ],
        "doc_id long, text string",
    )
    out = {r["seq_id"]: r for r in corpus.pack_sequences(docs, seq_len=4).collect()}
    # stream = a0..a4 b0..b3 c0 c1 (11 tokens) -> seqs of 4/4/3
    assert out[0]["seq_text"] == "a0 a1 a2 a3"
    assert out[1]["seq_text"] == "a4 b0 b1 b2"  # doc boundary straddled
    assert out[2]["seq_text"] == "b3 c0 c1" and out[2]["n_seq_tokens"] == 3
    # deterministic under repartitioning
    again = {
        r["seq_id"]: r["seq_text"]
        for r in corpus.pack_sequences(docs.repartition(5), seq_len=4).collect()
    }
    assert again == {k: v["seq_text"] for k, v in out.items()}


def test_pack_sequences_boundaries(spark):
    """with_boundaries=True adds doc_starts: in-sequence offsets where
    a NEW document begins (attention-mask reset points). Offset 0
    appears only when the sequence opens on a document head, not when
    it continues the previous sequence's document."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"a{i}" for i in range(5))),
            (2, " ".join(f"b{i}" for i in range(4))),
            (3, ""),  # zero tokens: no boundary anywhere
            (4, "c0 c1"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["seq_id"]: r
        for r in corpus.pack_sequences(
            docs, seq_len=4, with_boundaries=True
        ).collect()
    }
    # stream = a0..a4 b0..b3 c0 c1; heads at gpos 0 (a0), 5 (b0), 9 (c0)
    assert out[0]["doc_starts"] == [0]  # opens ON a head
    assert out[1]["doc_starts"] == [1]  # opens mid-doc (a4), b0 at offset 1
    assert out[2]["doc_starts"] == [1]  # b3 continues, c0 at offset 1
    # two docs starting inside one sequence -> both offsets, sorted
    docs2 = spark.createDataFrame(
        [(1, "x0 x1"), (2, "y0"), (3, "z0 z1 z2")],
        "doc_id long, text string",
    )
    rows = {
        r["seq_id"]: r["doc_starts"]
        for r in corpus.pack_sequences(
            docs2, seq_len=4, with_boundaries=True
        ).collect()
    }
    assert rows[0] == [0, 2, 3]  # x0@0, y0@2, z0@3
    assert rows[1] == []  # z1 z2: pure continuation


def test_pack_sequences_sharded(spark):
    docs = spark.createDataFrame(
        [(1, "a0 a1 a2", "x"), (2, "b0 b1", "y"), (3, "a3 a4", "x")],
        "doc_id long, text string, shard string",
    )
    rows = corpus.pack_sequences(docs, seq_len=4, shard_col="shard").collect()
    by_key = {(r["shard"], r["seq_id"]): r["seq_text"] for r in rows}
    # shard x stream: a0 a1 a2 a3 a4 -> two sequences; shard y: b0 b1
    assert by_key[("x", 0)] == "a0 a1 a2 a3"
    assert by_key[("x", 1)] == "a4"
    assert by_key[("y", 0)] == "b0 b1"


def test_ntz_us_parquet_is_normalized_and_ops_run(spark, tmp_path):
    """Driver-type-drift regression (round 4): the testdata generator
    switched events.ts from timestamp[ns] to pandas-written timestamp[us]
    WITHOUT the UTC-adjusted flag, which Spark reads as TIMESTAMP_NTZ —
    and unix_micros/window() reject NTZ, zeroing the round.

    Contract under test: (a) load_tables normalizes any NTZ column to
    TimestampType with identical values (session tz is UTC), and
    (b) trailing_window/rolling_features work even on a raw NTZ frame.
    """
    import pandas as pd
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampNTZType, TimestampType

    from balboa_spark.session import load_tables

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:30:00",
                 "2024-01-01 00:59:00", "2024-01-01 02:00:00"]
            ).astype("datetime64[us]"),
            "user_id": [7, 7, 7, 7],
            "value": [1.0, 2.0, 4.0, 8.0],
        }
    )
    d = tmp_path / "ntzdata"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet", index=False)  # timestamp[us], not UTC-adjusted
    assert str(pq.read_schema(str(d / "events.parquet")).field("ts").type) == "timestamp[us]"

    # (a) load_tables hands back TimestampType, values preserved
    tables = load_tables(spark, str(d), names=("events",))
    ev = tables["events"]
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    got = {r["event_id"]: r["ts"] for r in ev.collect()}
    assert got[1] == dt.datetime(2024, 1, 1, 0, 0)

    out = {
        r["event_id"]: r
        for r in temporal.rolling_features(ev, duration_sec=3600).collect()
    }
    assert out[3]["n_trailing"] == 3 and out[3]["sum_value_cents_trailing"] == 700
    assert out[4]["n_trailing"] == 1

    # tumbling window() and sessionize-style lag both run on the
    # normalized frame
    assert ev.groupBy(F.window("ts", "1 hour")).count().count() == 2

    # (b) even an un-normalized NTZ frame must not crash trailing_window
    raw = spark.read.parquet(str(d / "events.parquet"))
    assert isinstance(raw.schema["ts"].dataType, TimestampNTZType)
    out_raw = {
        r["event_id"]: r["n_trailing"]
        for r in temporal.rolling_features(raw, duration_sec=3600).collect()
    }
    assert out_raw[3] == 3


def test_retention_cohort_matrix(spark):
    """Integer-epoch cohorting: users cohorted by first-event period,
    cells count distinct users per offset."""
    day = 86400
    rows = [
        # u1: first in period 0, active periods 0 and 1
        (1, dt.datetime.utcfromtimestamp(1 * day), "u1"),
        (2, dt.datetime.utcfromtimestamp(8 * day), "u1"),
        # u2: cohort 0, never returns
        (3, dt.datetime.utcfromtimestamp(2 * day), "u2"),
        # u3: cohort 1, active 1 and 3 (two events in p3 count once)
        (4, dt.datetime.utcfromtimestamp(9 * day), "u3"),
        (5, dt.datetime.utcfromtimestamp(22 * day), "u3"),
        (6, dt.datetime.utcfromtimestamp(23 * day), "u3"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id string")
    out = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in temporal.retention(df, period_days=7).collect()
    }
    assert out == {(0, 0): 2, (0, 1): 1, (1, 0): 1, (1, 2): 1}


def test_anomaly_scores_trailing_zscore(spark):
    """Flat history then a spike: the spike's z must flag, equal-value
    windows yield null z (zero variance), and n==1 windows yield null."""
    rows = [
        (1, "u", _ts(0), 10.0),
        (2, "u", _ts(10), 10.0),   # window {10,10}: std 0 -> null z
        (3, "u", _ts(20), 10.0),
        (4, "u", _ts(30), 100.0),  # spike vs {10,10,10,100}
        (5, "v", _ts(0), 42.0),    # first event: n==1 -> null
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double"
    )
    out = {r["event_id"]: r for r in temporal.anomaly_scores(df).collect()}
    assert out[1]["z"] is None and out[1]["n_window"] == 1
    assert out[2]["z"] is None      # zero variance
    assert out[4]["n_window"] == 4 and out[4]["z"] is not None
    # z of 100 vs mean 32.5, population std ~38.97 -> ~1.732
    assert abs(out[4]["z"] - 1.7321) < 1e-3 and out[4]["is_anomaly"] is False
    assert out[5]["z"] is None and out[5]["is_anomaly"] is None


def test_interval_join_inclusive_bounds_and_multibucket(spark):
    """Points on EITHER boundary match (inclusive); intervals longer
    than one bucket still match points in every covered bucket exactly
    once; non-overlapping keys/times do not pair."""
    points = spark.createDataFrame(
        [
            (1, "u", _ts(0)),       # == w_start of iv 10 -> match
            (2, "u", _ts(30)),      # mid-window (bucket 2 of a 3-bucket iv)
            (3, "u", _ts(45)),      # == w_end -> match
            (4, "u", _ts(46)),      # 1 min past end -> no match
            (5, "v", _ts(30)),      # other key, no interval -> no match
        ],
        "c_id long, user_id string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, "u", _ts(0), _ts(45))],
        "p_id long, user_id string, w_start timestamp, w_end timestamp",
    )
    out = temporal.interval_join(
        points, intervals, on=["user_id"], bucket_seconds=1200  # 20 min buckets
    )
    got = sorted((r.p_id, r.c_id) for r in out.collect())
    assert got == [(10, 1), (10, 2), (10, 3)]


def test_interval_join_equi_plan_and_naive_parity(spark):
    """The bucketed rewrite must plan as an EQUI-join (no
    BroadcastNestedLoopJoin / CartesianProduct — the thing it exists
    to avoid) and agree exactly with the naive BETWEEN join on a
    pseudo-random fixture."""
    import hashlib

    def h(s, m):
        return int(hashlib.md5(s.encode()).hexdigest()[:6], 16) % m

    points = spark.createDataFrame(
        [(i, f"u{h(f'p{i}', 5)}", _ts(h(f'pt{i}', 50))) for i in range(80)],
        "c_id long, user_id string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (j, f"u{h(f'i{j}', 5)}", _ts(h(f'is{j}', 40)), _ts(h(f'is{j}', 40) + h(f'il{j}', 15)))
            for j in range(30)
        ],
        "p_id long, user_id string, w_start timestamp, w_end timestamp",
    )
    out = temporal.interval_join(points, intervals, on=["user_id"], bucket_seconds=600)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    naive = points.join(intervals, "user_id").filter(
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") <= F.col("w_end"))
    )
    assert sorted((r.p_id, r.c_id) for r in out.collect()) == sorted(
        (r.p_id, r.c_id) for r in naive.collect()
    )


def test_pack_bestfit_invariants_and_ffd(spark):
    """FFD bin packing: every piece lands exactly once, no bin over
    capacity, and the classic FFD pairing (6+4 twice, not 6|6|4+4)."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"a{i}" for i in range(6))),
            (2, " ".join(f"b{i}" for i in range(6))),
            (3, " ".join(f"c{i}" for i in range(4))),
            (4, " ".join(f"d{i}" for i in range(4))),
        ],
        "doc_id long, text string",
    )
    rows = corpus.pack_bestfit(docs, seq_len=10, num_groups=1).collect()
    assert all(r["fill_tokens"] <= 10 for r in rows)
    # all four docs placed exactly once
    placed = [p for r in rows for p in r["piece_ids"].split(",")]
    assert sorted(placed) == ["1:0", "2:0", "3:0", "4:0"]
    # FFD packs 6+4 twice -> 2 full bins, zero waste
    assert len(rows) == 2 and all(r["fill_tokens"] == 10 for r in rows)
    # seq_text is the pieces in (id, chunk) order, space-joined
    by_bin = {r["bin_id"]: r for r in rows}
    assert by_bin[0]["seq_text"].startswith("a0") or by_bin[0]["seq_text"].startswith("b0")


def test_pack_bestfit_long_docs_split_first(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"x{i}" for i in range(25)))], "doc_id long, text string"
    )
    rows = corpus.pack_bestfit(docs, seq_len=10, num_groups=1).collect()
    placed = sorted(
        p for r in rows for p in r["piece_ids"].split(",")
    )
    assert placed == ["1:0", "1:1", "1:2"]  # 10+10+5
    fills = sorted(r["fill_tokens"] for r in rows for _ in [0])
    # 10,10 pack into full bins; the 5-tail in its own or shared
    assert sum(r["fill_tokens"] for r in rows) == 25


def test_pack_bestfit_deterministic_and_matches_python(spark):
    """Distributed output == pure-Python replay (group hash + FFD),
    stable under reshuffle."""
    import hashlib

    texts = {
        i: " ".join(f"w{i}_{j}" for j in range(3 + (i * 7) % 11))
        for i in range(20)
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    seq_len, groups = 12, 3

    def py_pack():
        pieces = []
        for i, t in texts.items():
            tk = t.split()
            for c in range(0, (len(tk) + seq_len - 1) // seq_len):
                pc = tk[c * seq_len : (c + 1) * seq_len]
                g = (
                    int(
                        hashlib.md5(f"{i}\x1f{c}".encode()).hexdigest()[:6], 16
                    )
                    % groups
                )
                pieces.append((g, i, c, len(pc), " ".join(pc)))
        out = {}
        for g in range(groups):
            mine = sorted(
                [p for p in pieces if p[0] == g],
                key=lambda p: (-p[3], p[1], p[2]),
            )
            bins, space = [], []
            for p in mine:
                for bi in range(len(bins)):
                    if space[bi] >= p[3]:
                        bins[bi].append(p)
                        space[bi] -= p[3]
                        break
                else:
                    bins.append([p])
                    space.append(seq_len - p[3])
            for bi, members in enumerate(bins):
                members = sorted(members, key=lambda p: (p[1], p[2]))
                out[(g, bi)] = (
                    ",".join(f"{p[1]}:{p[2]}" for p in members),
                    sum(p[3] for p in members),
                )
        return out

    want = py_pack()
    for frame in (docs, docs.repartition(7)):
        got = {
            (r["group"], r["bin_id"]): (r["piece_ids"], r["fill_tokens"])
            for r in corpus.pack_bestfit(
                frame, seq_len=seq_len, num_groups=groups
            ).collect()
        }
        assert got == want


def test_pack_sequences_matches_python_oracle(spark):
    """pack_sequences (fragment-sliced materialization, r12) vs an
    independent pure-Python packer on deterministic pseudo-random
    corpora: exact (seq_id -> n_seq_tokens, seq_text, doc_starts)
    parity. Corpora vary doc count, doc length (incl. empty docs, a
    boundary-exact doc, and one giant doc spanning many sequences)
    and seq_len (incl. 1). One Spark round-trip per corpus (the
    passage_dedup fuzz pattern)."""
    import random

    from balboa_spark.operators import corpus as C

    def py_pack(texts_by_id, L):
        toks = []
        starts_at = {}
        for i in sorted(texts_by_id):
            tk = [t for t in texts_by_id[i].lower().split() if t]
            if tk:
                starts_at[i] = len(toks)
                toks.extend(tk)
        seqs = {}
        for s in range(0, (len(toks) + L - 1) // L):
            chunk = toks[s * L:(s + 1) * L]
            heads = sorted(
                st % L for st in starts_at.values()
                if s * L <= st < s * L + len(chunk)
            )
            seqs[s] = (len(chunk), " ".join(chunk), heads)
        return seqs

    rng = random.Random(42)
    for case, L in [(0, 1), (1, 5), (2, 7), (3, 128), (4, 16)]:
        n_docs = rng.randint(3, 25)
        texts = {}
        for i in range(n_docs):
            n = rng.choice([0, 1, rng.randint(2, 40), L, 3 * L])
            texts[i] = " ".join(
                f"w{rng.randint(0, 30)}" for _ in range(n)
            )
        df = spark.createDataFrame(
            [(i, t) for i, t in texts.items()], "doc_id long, text string"
        ).repartition(7)
        got = {
            int(r["seq_id"]): (
                r["n_seq_tokens"], r["seq_text"], list(r["doc_starts"])
            )
            for r in C.pack_sequences(
                df, seq_len=L, with_boundaries=True
            ).collect()
        }
        want = py_pack(texts, L)
        assert got == want, f"case={case} L={L}"


# ---------------------------------------------------------------------------
# resample_events: fixed-grid downsampling with gap generation
# ---------------------------------------------------------------------------


def test_resample_events_gaps_and_ffill(spark):
    from datetime import datetime

    from balboa_spark.operators.temporal import resample_events

    rows = [
        # user 1: events in buckets 0 and 3 (step=60s); 1,2 are gaps
        (1, datetime(2024, 1, 1, 0, 0, 10), 1.25),
        (1, datetime(2024, 1, 1, 0, 0, 50), 2.00),
        (1, datetime(2024, 1, 1, 0, 3, 5), 4.00),
        # user 2: single event -> single bucket, no gaps
        (2, datetime(2024, 1, 1, 0, 7, 1), 0.10),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    base = 1704067200  # 2024-01-01T00:00Z epoch seconds
    got = {
        (r["user_id"], r["bucket_start"]): (r["n_events"], r["sum_cents"])
        for r in resample_events(df, step=60).collect()
    }
    assert got == {
        (1, base + 0): (2, 325),
        (1, base + 60): (0, 0),
        (1, base + 120): (0, 0),
        (1, base + 180): (1, 400),
        (2, base + 420): (1, 10),
    }
    ff = {
        (r["user_id"], r["bucket_start"]): r["sum_cents"]
        for r in resample_events(df, step=60, fill="ffill").collect()
    }
    assert ff[(1, base + 60)] == 325 and ff[(1, base + 120)] == 325
    assert ff[(1, base + 180)] == 400
    import pytest as _pt

    with _pt.raises(ValueError, match="step"):
        resample_events(df, step=0)
    with _pt.raises(ValueError, match="fill"):
        resample_events(df, fill="nope")


def test_resample_events_pre_1970_floor_division(spark):
    """Negative epochs must bucket by FLOOR division (DuckDB `//`
    semantics), not Spark `div` truncation-toward-zero: an event 10 s
    before midnight 1970 belongs to bucket -1 ([-60, 0)), and the
    grid spans floor-consistent endpoints across the epoch boundary —
    cross-engine parity for any historical/backfilled series (r13
    ADVICE fix). Matches DuckDB: epoch_us // 60e6 of -10 s = -1."""
    from datetime import datetime

    from balboa_spark.operators.temporal import resample_events

    rows = [
        (1, datetime(1969, 12, 31, 23, 59, 50), 1.00),   # -10 s  -> bucket -1
        (1, datetime(1970, 1, 1, 0, 1, 10), 2.00),       # +70 s  -> bucket 1
        (2, datetime(1969, 12, 31, 23, 58, 0), 3.00),    # -120 s -> bucket -2
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    got = {
        (r["user_id"], r["bucket_start"]): (r["n_events"], r["sum_cents"])
        for r in resample_events(df, step=60).collect()
    }
    assert got == {
        (1, -60): (1, 100),   # truncation would put -10 s in bucket 0
        (1, 0): (0, 0),       # gap bucket generated across the epoch
        (1, 60): (1, 200),
        (2, -120): (1, 300),
    }


# ----------------------------------------------------- gap_sessions (r14)
def _classic_sessionize(spark, df, gap_minutes=30):
    """The single-window reference formulation (what the DuckDB
    oracles replay)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag = F.lag("ts").over(w)
    return (
        df.filter(F.col("ts").isNotNull())
        .withColumn(
            "_n",
            F.when(
                lag.isNull()
                | (F.col("ts") > lag + F.expr(f"INTERVAL {gap_minutes} MINUTE")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "conv_id",
            F.sum("_n").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "turn_idx",
            F.row_number().over(
                Window.partitionBy("user_id", "conv_id").orderBy(
                    "ts", "event_id"
                )
            ),
        )
    )


def test_gap_sessions_matches_classic_window_across_buckets(spark):
    """The two-phase gaps-and-islands numbering must equal the classic
    per-user lag+cumsum window EXACTLY — including exact-30min
    boundaries (not a new session), 31-min gaps (new session),
    sessions straddling bucket edges, chains through several buckets,
    exact-timestamp ties, and pre-1970 users."""
    import random

    from balboa_spark.operators.temporal import gap_sessions

    random.seed(7)
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    for u in range(12):
        t = base + dt.timedelta(minutes=random.randint(0, 50000))
        for _ in range(random.randint(1, 200)):
            t += dt.timedelta(
                minutes=random.choice([0, 1, 29, 30, 31, 60, 1441, 3000])
            )
            rows.append((eid, u, t))
            eid += 1
    t = dt.datetime(1969, 12, 30)
    for _ in range(40):
        t += dt.timedelta(minutes=random.choice([5, 30, 31, 2000]))
        rows.append((eid, 999, t))
        eid += 1
    rows += [
        (eid, 7, base),
        (eid + 1, 7, base),
        (eid + 2, 7, base + dt.timedelta(minutes=30)),
        (eid + 3, 7, base + dt.timedelta(minutes=61)),
        (eid + 4, 7, None),  # NULL ts excluded by contract
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    ref = {
        r.event_id: (r.conv_id, r.turn_idx)
        for r in _classic_sessionize(spark, df).collect()
    }
    for bm in (24 * 60, 60, 45):
        got = {
            r.event_id: (r.conv_id, r.turn_idx)
            for r in gap_sessions(
                df, 30, bucket_minutes=bm, with_turn_idx=True,
                mode="two_phase",
            ).collect()
        }
        assert got == ref, f"bucket_minutes={bm} diverged from classic window"
    # the classic arm (what adaptive picks on flat data) matches too
    got_c = {
        r.event_id: (r.conv_id, r.turn_idx)
        for r in gap_sessions(
            df, 30, with_turn_idx=True, mode="classic"
        ).collect()
    }
    assert got_c == ref, "classic arm diverged from the reference window"


def test_gap_sessions_adaptive_picks_arm_by_skew(spark):
    """The adaptive probe (r15: reclaiming the de-skew's 2x flat-data
    cost) takes the classic single-window plan when no user exceeds
    heavy_user_rows, the two-phase otherwise — and both arms number
    identically on the same input."""
    import re

    from balboa_spark.operators.temporal import gap_sessions

    df = spark.createDataFrame(
        [(i, i % 5, dt.datetime(2024, 1, 1 + i % 20)) for i in range(100)],
        "event_id long, user_id long, ts timestamp",
    )

    def plan_of(out):
        return out._jdf.queryExecution().optimizedPlan().toString()

    # flat data, generous threshold -> classic: an event-ordered
    # window partitioned by user alone, and NO bucket column anywhere
    flat = gap_sessions(df, 30, with_turn_idx=True, heavy_user_rows=1000)
    p = plan_of(flat)
    assert "_bkt#" not in p
    # low threshold -> every user is "heavy" -> two-phase: every
    # event-ordered window partitioned by (user, bucket)
    heavy = gap_sessions(df, 30, with_turn_idx=True, heavy_user_rows=5)
    p2 = plan_of(heavy)
    windows = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\], \[([^\]]*)\]", p2)
    assert any("_bkt#" in part for part, _ in windows)
    assert {
        r.event_id: (r.conv_id, r.turn_idx) for r in flat.collect()
    } == {
        r.event_id: (r.conv_id, r.turn_idx) for r in heavy.collect()
    }
    # NULL ts rows don't count toward the probe and are excluded
    with_null = df.union(
        spark.createDataFrame(
            [(999, 1, None)], "event_id long, user_id long, ts timestamp"
        )
    )
    assert gap_sessions(with_null, 30).filter("event_id = 999").count() == 0


def test_gap_sessions_no_unbounded_per_user_window(spark):
    """The r13 verdict's scale-killer assertion: every event-level
    Window in the plan (one ordering by ts) must be partitioned by
    (user, bucket), never by user alone — a mega-user must never
    become a single window partition. Per-user windows may appear
    ONLY over the bucket-summary relation (ordered by the bucket
    index, one row per (user, day))."""
    import re

    from balboa_spark.operators.temporal import gap_sessions

    df = spark.createDataFrame(
        [(i, i % 3, dt.datetime(2024, 1, 1 + i % 20)) for i in range(60)],
        "event_id long, user_id long, ts timestamp",
    )
    plan = (
        gap_sessions(df, 30, with_turn_idx=True, mode="two_phase")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    windows = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\], \[([^\]]*)\]", plan)
    assert windows, "no Window nodes found — plan parse drifted"
    for part, order in windows:
        if "ts#" in order:  # event-level window
            assert "_bkt#" in part, (
                f"event-ordered window partitioned by [{part}] — "
                "unbounded per-user partition leaked back in"
            )
        else:  # summary-level stitch windows
            assert "_bkt#" in order or "conv_id#" in part or "_bkt#" in part, (
                f"unexpected window shape: [{part}] / [{order}]"
            )


def test_gap_sessions_rejects_bucket_smaller_than_gap(spark):
    from balboa_spark.operators.temporal import gap_sessions

    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1))],
        "event_id long, user_id long, ts timestamp",
    )
    with pytest.raises(ValueError, match="bucket_minutes"):
        gap_sessions(df, gap_minutes=120, bucket_minutes=60)
