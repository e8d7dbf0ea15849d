"""Corpus-preparation operators: repetition signals, hash split,
vocabulary top-k, contamination scan (balboa_spark.operators.corpus).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from balboa_spark.operators import corpus


@pytest.fixture()
def mini(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "spam spam spam spam spam spam spam spam spam spam spam spam"),
        (3, "one two three four five six seven eight nine ten eleven twelve"),
        (4, "a b"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_repetition_signals_flags_repetitive_doc(spark, mini):
    sig = {r["doc_id"]: r for r in corpus.repetition_signals(mini).collect()}
    # doc 2 is one token repeated: dup frac ~ 11/12, mode 2-gram is 100 %
    assert sig[2]["dup_token_frac"] > 0.9
    assert sig[2]["top_2gram_frac"] == 1.0
    # doc 3 is all-distinct: zero duplication, every 2-gram unique
    assert sig[3]["dup_token_frac"] == 0.0
    assert sig[3]["top_2gram_frac"] == pytest.approx(1 / 11, abs=1e-4)
    # doc 4 has one 2-gram and no 3-gram (guarded, not NaN/error)
    assert sig[4]["top_3gram_frac"] == 0.0


def test_gopher_filter_keeps_and_drops(spark, mini):
    kept = {
        r["doc_id"]: r["keep"] for r in corpus.gopher_filter(mini).collect()
    }
    # all minis are under MIN_TOKENS=30 -> dropped, including clean ones
    assert kept == {1: False, 2: False, 3: False, 4: False}
    long_clean = spark.createDataFrame(
        [(9, " ".join(f"tok{i}" for i in range(60)))], ["doc_id", "text"]
    )
    assert corpus.gopher_filter(long_clean).collect()[0]["keep"] is True


def test_hash_split_deterministic_and_proportional(spark, tables):
    docs = tables["documents"]
    split = corpus.hash_split(docs).select("doc_id", "split")
    again = corpus.hash_split(docs.repartition(7)).select("doc_id", "split")
    # reshuffle-stable: identical assignment regardless of partitioning
    assert set(map(tuple, split.collect())) == set(map(tuple, again.collect()))
    frac = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = sum(frac.values())
    assert frac["train"] / n == pytest.approx(0.80, abs=0.06)
    assert frac["val"] / n == pytest.approx(0.10, abs=0.05)
    assert frac["test"] / n == pytest.approx(0.10, abs=0.05)


def test_hash_split_is_projection_only(spark, tables):
    plan = (
        corpus.hash_split(tables["documents"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # no shuffle for a split assignment


def test_vocab_topk_counts(spark, mini):
    top = corpus.vocab_topk(mini, k=3).collect()
    assert [r["token"] for r in top][:2] == ["spam", "the"]
    spam = top[0]
    assert spam["n_occurrences"] == 12 and spam["n_docs"] == 1
    the = top[1]
    assert the["n_occurrences"] == 3 and the["n_docs"] == 1


def test_contamination_finds_planted_overlap(spark):
    base = " ".join(f"w{i}" for i in range(20))
    rows = [
        (1, base),  # full overlap with the benchmark doc
        (2, base.replace("w3", "x3")),  # partial: shares suffix 8-grams
        (3, " ".join(f"z{i}" for i in range(20))),  # disjoint
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = spark.createDataFrame([(base,)], ["text"])
    hits = {r["doc_id"]: r["n_shared_ngrams"] for r in
            corpus.contamination_ngrams(docs, bench, n=8).collect()}
    assert hits[1] == 13  # all 20-8+1 grams shared
    assert 0 < hits[2] < 13  # only grams not covering w3
    assert 3 not in hits  # disjoint doc never appears


def test_redact_pii_masks_and_counts(spark):
    rows = [
        (1, "mail bob.smith+x@corp.example.org from 192.168.216.34 now"),
        (2, "call +1 555 123 4567 or 555-867-5309 x"),
        (3, "clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in corpus.redact_pii(df).collect()}
    assert out[1]["text_redacted"] == "mail <EMAIL> from <IP> now"
    assert out[1]["n_emails"] == 1 and out[1]["n_ips"] == 1
    assert out[2]["n_phones"] == 2
    assert "<PHONE>" in out[2]["text_redacted"]
    assert out[3]["text_redacted"] == rows[2][1]
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_phones"]) == (0, 0, 0)


def test_redact_pii_is_projection_only(spark, tables):
    plan = (
        corpus.redact_pii(tables["documents"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_hash_sample_deterministic_and_stratified(spark, tables):
    docs = tables["documents"]
    fracs = {"en": 0.5, "zh": 0.2}
    got = corpus.hash_sample(docs, fracs, 0.1).select("doc_id", "lang")
    again = corpus.hash_sample(docs.repartition(9), fracs, 0.1).select(
        "doc_id", "lang"
    )
    # reshuffle-stable: identical keep-set regardless of partitioning
    assert set(map(tuple, got.collect())) == set(map(tuple, again.collect()))
    n_by_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    kept = {
        r["lang"]: r["n"]
        for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert kept["en"] / n_by_lang["en"] == pytest.approx(0.5, abs=0.15)
    # the default rate applies to strata absent from fracs
    for lang in ("de", "fr", "es"):
        assert kept.get(lang, 0) / n_by_lang[lang] == pytest.approx(0.1, abs=0.1)


def test_hash_sample_boundary_fracs(spark, mini):
    # frac=1.0 must keep EVERY row (regression: the 9-hex-digit
    # threshold '100000000' compared below every 8-digit md5 prefix,
    # silently keeping zero rows)
    assert corpus.sample_threshold_hex(1.0) == "g"
    df = mini.withColumn("lang", F.lit("en"))
    assert corpus.hash_sample(df, {"en": 1.0}).count() == df.count()
    # default_frac=1.0 exercises the same path for unlisted strata
    assert corpus.hash_sample(df, {}, default_frac=1.0).count() == df.count()
    # frac=0.0 keeps nothing
    assert corpus.hash_sample(df, {"en": 0.0}).count() == 0


def test_trigram_familiarity_ranks_gibberish_low(spark):
    common = "the cat sat on the mat and the rat sat on the hat "
    rows = [(1, common * 3), (2, common * 3), (3, "qzxjv wkqpf zzzgh mmvtx")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in corpus.trigram_familiarity(df).collect()}
    # docs 1/2 share every trigram; doc 3's trigrams are mostly unique
    assert out[3]["familiarity"] < out[1]["familiarity"]
    assert out[1]["familiarity"] == out[2]["familiarity"]
    assert out[1]["n_trigrams"] == len(rows[0][1].lower()) - 2
    short = spark.createDataFrame([(9, "ab")], ["doc_id", "text"])
    assert corpus.trigram_familiarity(short).count() == 0


def test_trigram_familiarity_no_forced_corpus_broadcast(spark, tables):
    # the frequency table is corpus-derived (unbounded for CJK corpora),
    # so the join must carry NO broadcast hint — AQE decides at runtime
    analyzed = (
        corpus.trigram_familiarity(tables["documents"])
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "ResolvedHint" not in analyzed


def test_chunk_tokens_windows_and_tail(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")],
        ["doc_id", "text"],
    )
    out = corpus.chunk_tokens(df, window=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 10 tokens, offsets 0,3,6(+tail covers 9) -> ceil(6/3)+1 = 3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["n_chunk_tokens"] for r in c1] == [4, 4, 4]
    assert c1[0]["chunk_text"] == "t0 t1 t2 t3"
    assert c1[2]["chunk_text"] == "t6 t7 t8 t9"
    # every token covered: union of chunks == the document
    covered = set(" ".join(r["chunk_text"] for r in c1).split())
    assert covered == {f"t{i}" for i in range(10)}
    # doc 2 shorter than the window -> one partial chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 2
    # empty doc -> no chunks
    assert 3 not in by_doc


def test_chunk_tokens_is_projection_only(spark, tables):
    plan = (
        corpus.chunk_tokens(tables["documents"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_tfidf_keywords_integer_ranking(spark):
    rows = [
        (1, "apple apple apple common common"),
        (2, "banana banana common common common"),
        (3, "common cherry"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = corpus.tfidf_keywords(df, k=2, max_doc_frac=0.5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 'common' is in all 3 docs (df=3 > 0.5*3) -> excluded everywhere
    assert all(r["token"] != "common" for r in out)
    assert by_doc[1][0]["token"] == "apple" and by_doc[1][0]["tf"] == 3
    assert by_doc[2][0]["token"] == "banana"
    assert by_doc[3][0]["token"] == "cherry" and by_doc[3][0]["df"] == 1


def test_near_dedup_keep_best_prefers_score(spark):
    from balboa_spark.operators import dedup

    # component {1,2,3}: doc 2 is the longest -> kept; 4 unpaired -> kept
    docs = spark.createDataFrame(
        [(1, "aa"), (2, "aaaa"), (3, "aaa"), (4, "zz")], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    out = dedup.near_dedup_keep_best(
        docs.withColumn("n_chars", F.length("text")), pairs, "n_chars"
    )
    # r13: the representative comes from a map-side-combinable
    # groupBy min(struct(-score, id)), never a per-component window —
    # a mass-dup component is the hottest key by definition
    assert "Window" not in out._jdf.queryExecution().optimizedPlan().toString()
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [2, 4]
    # score tie inside a component breaks to the LOWEST id (the exact
    # order the retired window used)
    tie = dedup.near_dedup_keep_best(
        spark.createDataFrame(
            [(5, 7), (6, 7), (9, 1)], ["doc_id", "n_chars"]
        ).withColumn("text", F.lit("x")),
        spark.createDataFrame([(5, 6)], ["id_a", "id_b"]),
        "n_chars",
    )
    assert sorted(r["doc_id"] for r in tie.collect()) == [5, 9]


def test_contamination_broadcasts_only_benchmark(spark, tables):
    docs = tables["documents"]
    bench = docs.limit(5).select("text")
    plan = (
        corpus.contamination_ngrams(docs, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # benchmark side broadcast, corpus side streamed: exactly one
    # BroadcastExchange and it feeds a BroadcastHashJoin
    assert plan.count("BroadcastExchange") == 1
    assert "BroadcastHashJoin" in plan


def test_boilerplate_ratio_cross_doc(spark):
    """Docs sharing a templated 5-gram score high; unique prose scores
    zero; docs with < k tokens emit no row."""
    boiler = "all rights reserved by acme"
    docs = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta"),
            (2, boiler + " epsilon zeta eta theta"),
            (3, "completely original text with no shared grams at all"),
            (4, "tiny doc"),  # < 5 tokens -> no grams -> no row
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus.boilerplate_ratio(docs, k=5, min_df=2).collect()}
    assert set(out) == {1, 2, 3}
    # the shared 5-gram 'all rights reserved by acme' is the only
    # gram with df >= 2
    assert out[1]["n_common"] == 1 and out[2]["n_common"] == 1
    assert out[1]["common_ratio"] == round(1 / out[1]["n_grams"], 6)
    assert out[3]["n_common"] == 0 and out[3]["common_ratio"] == 0.0


def test_clean_text_normalizes(spark):
    """Control chars and U+FFFD stripped, curly quotes/dashes/NBSP
    folded to ASCII, whitespace collapsed and trimmed; n_removed is
    the char-count delta."""
    docs = spark.createDataFrame(
        [
            (1, "\x01hello\x7f “world”"),
            (2, "a b  \t c – d�"),
            (3, "already clean"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus.clean_text(docs).collect()}
    assert out[1]["clean_text"] == 'hello "world"'
    assert out[1]["n_removed"] == len("\x01hello\x7f “world”") - len('hello "world"')
    assert out[2]["clean_text"] == "a b c - d"
    assert out[3]["clean_text"] == "already clean" and out[3]["n_removed"] == 0


def test_passage_dedup_drops_shared_passages(spark):
    """A 4-token passage shared across docs is dropped from BOTH and
    the survivors reassemble in original order; a fully-duplicated doc
    disappears; within-doc repetition alone (df=1) is kept."""
    shared = "all rights reserved corp"  # one 4-token passage
    docs = spark.createDataFrame(
        [
            (1, shared + " alpha beta gamma delta"),
            (2, shared + " epsilon zeta eta theta"),
            (3, shared),  # nothing but the duplicated passage
            (4, "solo solo solo solo solo solo solo solo"),  # df=1, kept
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in corpus.passage_dedup(docs, passage_tokens=4, max_df=1).collect()
    }
    # doc 3 was entirely boilerplate -> no row
    assert set(out) == {1, 2, 4}
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[2]["clean_text"] == "epsilon zeta eta theta"
    assert out[1]["n_passages"] == 2 and out[1]["n_kept"] == 1
    # doc 4's repeated passage occurs in ONE document -> untouched
    assert out[4]["n_kept"] == 2 and out[4]["clean_text"] == docs.collect()[3]["text"]


def test_passage_dedup_reassembles_order_and_tail(spark):
    """Surviving passages keep token order across a dropped middle
    passage, and the short tail passage is its own unit."""
    mid = "x1 x2 x3"  # the shared middle passage (P=3)
    docs = spark.createDataFrame(
        [
            (1, f"a1 a2 a3 {mid} b1 b2 b3 tail"),
            (2, f"c1 c2 c3 {mid} d1 d2 d3"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in corpus.passage_dedup(docs, passage_tokens=3, max_df=1).collect()
    }
    assert out[1]["clean_text"] == "a1 a2 a3 b1 b2 b3 tail"
    assert out[1]["n_passages"] == 4 and out[1]["n_kept"] == 3
    assert out[2]["clean_text"] == "c1 c2 c3 d1 d2 d3"


def _span_dedup_py(rows, n):
    """Pure-Python reference for span_dedup: sliding-window hashes,
    keep global first occurrence by (id, pos), drop covered tokens."""
    toks = {i: t.lower().split() for i, t in rows}
    toks = {i: [w for w in tk if w] for i, tk in toks.items() if any(tk)}
    seen = {}
    removed = {i: set() for i in toks}
    for i in sorted(toks):
        tk = toks[i]
        for pos in range(len(tk) - n + 1):
            key = tuple(tk[pos : pos + n])
            if key in seen:
                removed[i].update(range(pos, pos + n))
            else:
                seen[key] = (i, pos)
    out = {}
    for i, tk in toks.items():
        kept = [w for j, w in enumerate(tk) if j not in removed[i]]
        if kept:
            out[i] = (len(tk), len(tk) - len(kept), " ".join(kept))
    return out


def test_span_dedup_keeps_first_removes_later(spark):
    """First occurrence (lowest (id, pos)) survives; later copies —
    cross-doc AND within-doc — lose exactly the covered tokens."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "x y a b c d z"),  # 'a b c d' again -> removed here
            (3, "p q r s p q r s"),  # intra-doc repeat: second copy removed
            (4, "short"),  # shorter than the span: no windows, untouched
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in corpus.span_dedup(docs, span_tokens=4).collect()
    }
    assert out[1]["clean_text"] == "a b c d e f" and out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "x y z" and out[2]["n_removed"] == 4
    assert out[3]["clean_text"] == "p q r s" and out[3]["n_removed"] == 4
    assert out[4]["clean_text"] == "short"


def test_span_dedup_catches_passage_straddle(spark):
    """The gap span_dedup exists to close: a duplicated region placed
    to STRADDLE a passage boundary. passage_dedup(P=4) sees different
    4-token blocks in each doc and keeps both copies; the sliding
    window sees the shared span regardless of alignment."""
    dup = "w1 w2 w3 w4"
    docs = spark.createDataFrame(
        [
            (1, f"{dup} t1 t2 t3 t4"),  # dup aligned at block 0
            (2, f"s1 s2 {dup} t5 t6"),  # dup straddles blocks 0/1
        ],
        "doc_id long, text string",
    )
    blocks = {
        r["doc_id"]: r["clean_text"]
        for r in corpus.passage_dedup(docs, passage_tokens=4, max_df=1).collect()
    }
    # passage_dedup misses it: doc 2's copy survives inside its blocks
    assert "w1 w2 w3 w4" in blocks.get(2, "")
    spans = {
        r["doc_id"]: r["clean_text"]
        for r in corpus.span_dedup(docs, span_tokens=4).collect()
    }
    assert spans[1] == "w1 w2 w3 w4 t1 t2 t3 t4"  # first copy kept
    assert spans[2] == "s1 s2 t5 t6"  # straddling copy removed


def test_span_dedup_fully_duplicated_doc_disappears(spark):
    docs = spark.createDataFrame(
        [(1, "c1 c2 c3 c4 c5"), (2, "c1 c2 c3 c4 c5")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus.span_dedup(docs, span_tokens=4).collect()}
    assert set(out) == {1}


def test_span_dedup_matches_python_reference(spark):
    """Random tight-vocab corpora (maximizes window collisions):
    distributed result == pure-Python reference."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["aa", "bb", "cc", "dd"])
    line = st.lists(word, min_size=0, max_size=12).map(" ".join)

    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(texts=st.lists(line, min_size=1, max_size=6))
    def check(texts):
        rows = list(enumerate(texts))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
            for r in corpus.span_dedup(df, span_tokens=3).collect()
        }
        assert got == _span_dedup_py(rows, 3)
        # deterministic under reshuffling
        again = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
            for r in corpus.span_dedup(
                df.repartition(5), span_tokens=3
            ).collect()
        }
        assert again == got

    check()


def _cdc_py(corpus_rows, P=16, g=4, max_df=1):
    """Independent pure-Python CDC reference: hex-threshold boundary
    rule, chunk DF, interval drop, reassembly."""
    import hashlib

    thresh = format(16**8 // P, "08x")

    def toks(t):
        return [w for w in t.lower().split() if w]

    def wins(tk):
        n = len(tk)
        bpos = [
            i
            for i in range(g - 1, n)
            if i + 1 < n
            and hashlib.md5(
                " ".join(tk[i - g + 1 : i + 1]).encode()
            ).hexdigest()[:8]
            < thresh
        ] if n >= g else []
        starts = [0] + [i + 1 for i in bpos]
        return [
            (s, (starts[j + 1] if j + 1 < len(starts) else n) - s)
            for j, s in enumerate(starts)
        ]

    tks = {d: toks(t) for d, t in corpus_rows}
    df_count = {}
    chunks = {}
    for d, tk in tks.items():
        chunks[d] = [(s, l, " ".join(tk[s : s + l])) for s, l in wins(tk)]
        for c in {c for _s, _l, c in chunks[d]}:
            df_count[c] = df_count.get(c, 0) + 1
    out = {}
    for d, tk in tks.items():
        dropped = set()
        for s, l, c in chunks[d]:
            if df_count[c] > max_df:
                dropped.update(range(s, s + l))
        kept = [tk[i] for i in range(len(tk)) if i not in dropped]
        if kept:
            out[d] = (len(tk), len(kept), " ".join(kept))
    return out


def test_encode_corpus_oov_pieces_keep_length(spark, tmp_path):
    """Fit-on-A, encode-on-B: pieces whose characters were unseen at
    fit time must become the UNK sentinel, NOT silently vanish — a
    dropped piece would shorten the training sequence invisibly."""
    from balboa_spark.operators import bpe

    fit_df = spark.createDataFrame(
        [(0, "ab ab ab ab")], "doc_id long, text string"
    )
    ts = bpe.TokenizerStore(spark, str(tmp_path / "oov"))
    ts.fit(fit_df, num_merges=4)
    out = ts.encode(
        spark.createDataFrame([(1, "ab xyz")], "doc_id long, text string")
    ).collect()
    ids = out[0]["piece_ids"]
    # 'ab' -> 1 known piece; 'xyz' -> 3 OOV chars -> 3 UNK sentinels
    assert len(ids) == 4
    assert ids.count(bpe.UNK_PIECE_ID) == 3
    assert all(i >= 0 for i in ids if i != bpe.UNK_PIECE_ID)


def test_snapshot_diff_null_text_rows(spark):
    """Presence must come from the join side, not fingerprint
    nullness: a NULL-text doc present only in old is 'removed' (the
    fp-null heuristic reported it 'added'), and NULL->real text on the
    same id is 'changed'."""
    old = spark.createDataFrame(
        [(9, None), (10, None), (11, "same")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "real now"), (11, "same")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["change"]
           for r in corpus.snapshot_diff(old, new).collect()}
    assert out == {9: "removed", 10: "changed"}


def test_blocklist_literal_and_join_arms_agree(spark):
    """The literal-array arm (small curated lists, zero shuffle) and
    the relation-join arm (huge lists) must produce identical verdicts
    — counts at token granularity, case-insensitive, keep = no hits."""
    docs = spark.createDataFrame(
        [
            (1, "clean words only here"),
            (2, "the BAD word appears bad twice"),
            (3, "worse and bad together"),
        ],
        "doc_id long, text string",
    )
    terms = ["bad", "worse"]
    lit = {r["doc_id"]: r for r in corpus.blocklist_signals(docs, terms).collect()}
    assert lit[1]["keep"] and lit[1]["n_blocked_tokens"] == 0
    assert not lit[2]["keep"]
    assert lit[2]["n_blocked_tokens"] == 2 and lit[2]["n_blocked_terms"] == 1
    assert lit[3]["n_blocked_tokens"] == 2 and lit[3]["n_blocked_terms"] == 2
    terms_df = spark.createDataFrame([(t,) for t in terms], "term string")
    jn = {
        r["doc_id"]: r
        for r in corpus.blocklist_signals_join(docs, terms_df).collect()
    }
    for d in (1, 2, 3):
        assert (
            jn[d]["n_blocked_tokens"],
            jn[d]["n_blocked_terms"],
            jn[d]["keep"],
        ) == (
            lit[d]["n_blocked_tokens"],
            lit[d]["n_blocked_terms"],
            lit[d]["keep"],
        )


def test_snapshot_diff_classifies_changes(spark):
    """added/removed/changed by id + normalized fingerprint; cosmetic
    whitespace/case edits are NOT changes (fingerprint-normalized);
    unchanged rows excluded by default, included on request."""
    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "keep me"),
         (4, "Spaced   Out")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(2, "gamma delta EDITED"), (3, "keep me"), (5, "brand new"),
         (4, "spaced out")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["change"]
           for r in corpus.snapshot_diff(old, new).collect()}
    assert out == {1: "removed", 2: "changed", 5: "added"}
    full = {r["doc_id"]: r["change"]
            for r in corpus.snapshot_diff(
                old, new, include_unchanged=True).collect()}
    assert full[3] == "unchanged" and full[4] == "unchanged"


def test_passage_dedup_cdc_position_independent(spark):
    """The content-defined grid must drop a long shared span from both
    documents even when it sits at DIFFERENT token offsets — the case
    the fixed grid structurally misses — and both docs must lose the
    exact same interior chunks."""
    shared = " ".join(f"s{i}" for i in range(150))
    docs = spark.createDataFrame(
        [
            (0, " ".join(f"a{i}" for i in range(13)) + " " + shared
             + " " + " ".join(f"b{i}" for i in range(9))),
            (1, shared),
            (2, "unique filler " + " ".join(f"u{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    # the fixed grid finds nothing (offset 13 is not a multiple of 16)
    fixed = {r["doc_id"]: r for r in corpus.passage_dedup(
        docs, passage_tokens=16).collect()}
    assert all(fixed[d]["n_kept"] == fixed[d]["n_passages"] for d in fixed)
    out = {r["doc_id"]: r for r in corpus.passage_dedup_cdc(
        docs, passage_tokens=16).collect()}
    d0, d1 = out[0], out[1]
    assert d0["n_kept_tokens"] < d0["n_tokens"]
    assert d1["n_kept_tokens"] < d1["n_tokens"]
    # identical interior chunks removed from both sides
    assert d0["n_tokens"] - d0["n_kept_tokens"] == (
        d1["n_tokens"] - d1["n_kept_tokens"]
    )
    removed0 = set(docs.collect()[0]["text"].split()) - set(
        d0["clean_text"].split()
    )
    removed1 = set(shared.split()) - set(d1["clean_text"].split())
    assert removed0 == removed1 and removed0
    # the unique doc is untouched
    assert out[2]["n_kept_tokens"] == out[2]["n_tokens"]


def test_passage_dedup_cdc_exact_copies_disappear(spark):
    docs = spark.createDataFrame(
        [(1, "copy " * 40), (2, "copy " * 40), (3, "other words here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus.passage_dedup_cdc(
        docs, passage_tokens=8).collect()}
    assert set(out) == {3}


def test_passage_dedup_cdc_matches_python_reference(spark):
    """Exact parity with an independent pure-Python CDC
    implementation on a pseudo-random corpus with planted copies at
    random offsets, plus reshuffle stability."""
    import random

    rnd = random.Random(11)
    span = " ".join(f"p{i}" for i in range(60))
    rows = []
    for d in range(20):
        words = [f"w{rnd.randrange(50)}" for _ in range(rnd.randrange(5, 60))]
        if d % 3 == 0:  # plant the span at a random offset
            at = rnd.randrange(0, len(words))
            words[at:at] = span.split()
        rows.append((d, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = _cdc_py(rows, P=16, g=4)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept_tokens"], r["clean_text"])
        for r in corpus.passage_dedup_cdc(docs, passage_tokens=16).collect()
    }
    assert got == want
    got2 = {
        r["doc_id"]: (r["n_tokens"], r["n_kept_tokens"], r["clean_text"])
        for r in corpus.passage_dedup_cdc(
            docs.repartition(13), passage_tokens=16
        ).collect()
    }
    assert got2 == want


def test_passage_dedup_matches_python_oracle(spark):
    """passage_dedup vs an independent pure-Python reimplementation on
    a deterministic pseudo-random corpus: exact (doc -> clean_text,
    n_passages, n_kept) parity, including dropped-entirely docs. One
    Spark round-trip over many corpora beats a hypothesis per-example
    session (Spark job latency); the corpus family still varies vocab
    size, doc length, P, and max_df."""
    import hashlib
    from collections import defaultdict

    def py_oracle(texts, P, max_df):
        chunks = {}
        dfreq = defaultdict(set)
        for did, text in texts:
            tk = text.split()
            ps = [" ".join(tk[i : i + P]) for i in range(0, len(tk), P)]
            chunks[did] = ps
            for p in ps:
                dfreq[p].add(did)
        out = {}
        for did, ps in chunks.items():
            kept = [p for p in ps if len(dfreq[p]) <= max_df]
            if kept:
                out[did] = (len(ps), len(kept), " ".join(kept))
        return out

    def tok(seed, i):
        return f"w{int(hashlib.md5(f'{seed}|{i}'.encode()).hexdigest()[:4], 16) % 7}"

    for seed, n_docs, max_len, P, max_df in [
        ("a", 30, 12, 3, 1),
        ("b", 40, 25, 4, 2),
        ("c", 12, 6, 2, 1),
    ]:
        texts = [
            (
                d,
                " ".join(
                    tok(seed, d * 100 + j)
                    for j in range(1 + (d * 7919) % max_len)
                ),
            )
            for d in range(n_docs)
        ]
        expect = py_oracle(texts, P, max_df)
        docs = spark.createDataFrame(texts, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_passages"], r["n_kept"], r["clean_text"])
            for r in corpus.passage_dedup(
                docs, passage_tokens=P, max_df=max_df
            ).collect()
        }
        assert got == expect, f"mismatch for corpus family {seed}"


def test_quality_bins_quartiles(spark):
    """Quartile binning: bin = #boundaries <= score, 4 buckets, and the
    plan stays declarative (no driver action for the boundaries)."""
    docs = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 9)], "doc_id long, n_chars long"
    )
    out = {r["doc_id"]: r["bin"] for r in corpus.quality_bins(docs).collect()}
    # scores 10..80; quartile boundaries (linear interp over n-1):
    # q25=27.5 q50=45 q75=62.5 -> bins: 10,20 -> 0; 30,40 -> 1;
    # 50,60 -> 2; 70,80 -> 3
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 3, 8: 3}


def test_quality_bins_approx_agrees_within_rank_tolerance(spark):
    """The percentile_approx scale path must agree with the exact path
    for all but a boundary band of rows: GK rank error <= n/accuracy,
    and a misbinned row can be off by at most one bin. On 500 distinct
    scores with accuracy 10k the error budget is < 1 row per boundary,
    but interpolation differences (exact interpolates, approx returns a
    data value) still shift rows exactly AT a boundary — so assert
    per-row bins differ by <= 1 and total disagreements <= #boundaries."""
    docs = spark.createDataFrame(
        [(i, (i * 37) % 500) for i in range(500)], "doc_id long, n_chars long"
    )
    exact = {r["doc_id"]: r["bin"] for r in corpus.quality_bins(docs).collect()}
    approx = {
        r["doc_id"]: r["bin"]
        for r in corpus.quality_bins(docs, approx=True).collect()
    }
    diffs = [d for d in exact if exact[d] != approx[d]]
    assert all(abs(exact[d] - approx[d]) == 1 for d in diffs)
    assert len(diffs) <= 3, f"approx binning drifted: {len(diffs)} rows"


def test_stratified_k_exact_counts_and_stability(spark):
    """Exactly k rows per group (all rows of smaller groups); the keep
    set is identical under repartitioning (md5 order, not RNG)."""
    rows = [(i, f"g{i % 3}") for i in range(40)] + [(100, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus.stratified_k(df, 4, group_col="source")
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    assert counts == {"g0": 4, "g1": 4, "g2": 4, "tiny": 1}
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id
        for r in corpus.stratified_k(df.repartition(7), 4, group_col="source").collect()
    )
    assert ids1 == ids2
    assert all(r.strat_rank <= 4 for r in out.collect())


def test_interleave_round_robins_and_avoids_global_window(spark):
    """Positions are the stride formula rk*G+g: sorting by ord visits
    every group once per round; and the only Window in the plan
    partitions by the group key — no corpus-wide single-partition
    exchange (the plan hazard a global row_number would create).
    The G-row group directory's windows are bounded by group count."""
    rows = [(i, f"s{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus.interleave_sources(df)
    ordered = [r.source for r in out.orderBy("ord").collect()]
    # each consecutive block of 4 is a permutation of the 4 sources
    for b in range(10):
        assert sorted(ordered[4 * b : 4 * b + 4]) == ["s0", "s1", "s2", "s3"]
    # ords are distinct (a total order)
    assert out.select("ord").distinct().count() == 40
    plan = out._jdf.queryExecution().executedPlan().toString()
    # corpus-side window partitions by source; assert no window runs
    # over a SinglePartition exchange of the corpus relation (the
    # directory side is exchanged once but holds G rows)
    assert plan.count("SinglePartition") <= 2  # G-row directory only


def test_interleave_null_group_is_a_real_stratum(spark):
    """Docs with a NULL group column must appear in the interleaved
    order as their own stratum (null-safe directory join), not vanish."""
    rows = [(1, "a"), (2, "a"), (3, None), (4, None), (5, "b")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus.interleave_sources(df).collect()
    assert {r.doc_id for r in out} == {1, 2, 3, 4, 5}
    assert len({r.ord for r in out}) == 5


def test_media_chunk_and_patch_param_guards(spark):
    from balboa_spark.operators.multimodal import chunk_media_time, patch_grid

    df = spark.createDataFrame([(1, 1000)], "asset_id long, duration_ms long")
    with pytest.raises(ValueError, match="stride_ms"):
        chunk_media_time(df, window_ms=30_000, stride_ms=40_000)
    with pytest.raises(ValueError, match=">= 1"):
        chunk_media_time(df, window_ms=0)
    with pytest.raises(ValueError, match="patch"):
        patch_grid(df, patch=0)


def test_split_sentences_segments_and_indices(spark):
    """Extract-based segmentation: terminator runs stay attached,
    whitespace-only segments drop but surviving sentences keep their
    ORIGINAL position index, and terminator-free text is one segment."""
    from balboa_spark.operators.text import split_sentences

    rows = [
        (1, "Hello there. How are you?! Fine... really."),
        (2, "no terminators at all"),
        (3, "Trailing spaces.   "),
        (4, "!!!"),  # terminators only -> no non-terminator run
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in split_sentences(df).collect():
        out.setdefault(r.doc_id, []).append((r.sent_idx, r.sentence))
    # rule-based: an ellipsis is a terminator run, so it ENDS a segment
    assert out[1] == [
        (0, "Hello there."),
        (1, "How are you?!"),
        (2, "Fine..."),
        (3, "really."),
    ]
    assert out[2] == [(0, "no terminators at all")]
    assert out[3] == [(0, "Trailing spaces.")]
    assert 4 not in out
    assert all(
        r.n_chars == len(r.sentence) for r in split_sentences(df).collect()
    )


def test_span_corruption_islands_and_determinism(spark):
    """The mask plan: spans are fixed-length clipped to the doc,
    strictly-overlapping candidates merge into islands (verified
    against a direct Python reimplementation), masked fraction tracks
    the rate, and the plan is repartition-stable."""
    import hashlib

    texts = [
        (d, " ".join(f"t{d}_{j}" for j in range(5 + (d * 13) % 120)))
        for d in range(60)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rate, L = 0.3, 4
    thr = corpus.sample_threshold_hex(rate / L)

    def py_spans(did, n):
        starts = [
            i
            for i in range(n)
            if hashlib.md5(f"{did}:{i}:spans".encode()).hexdigest()[:8] < thr
        ]
        spans, cur = [], None
        for s in starts:
            e = min(s + L, n)
            if cur and s < cur[1]:
                cur[1] = max(cur[1], e)
            else:
                cur = [s, e]
                spans.append(cur)
        return [(k, s, e) for k, (s, e) in enumerate(spans)]

    expect = {
        (d, k, s, e)
        for d, t in texts
        for (k, s, e) in py_spans(d, len(t.split()))
    }
    out = corpus.span_corruption(df, rate=rate, span_len=L).collect()
    got = {(r.doc_id, r.span_id, r.span_start, r.span_end) for r in out}
    assert got == expect
    assert all(r.n_masked == r.span_end - r.span_start for r in out)
    # masked fraction in the right ballpark (merging eats some)
    total_tokens = sum(len(t.split()) for _, t in texts)
    masked = sum(r.n_masked for r in out)
    assert 0.1 < masked / total_tokens < 0.5
    got2 = {
        (r.doc_id, r.span_id, r.span_start, r.span_end)
        for r in corpus.span_corruption(
            df.repartition(7), rate=rate, span_len=L
        ).collect()
    }
    assert got2 == got
    with pytest.raises(ValueError):
        corpus.span_corruption(df, rate=0.0)
    with pytest.raises(ValueError):
        corpus.span_corruption(df, span_len=0)


def test_validate_expectations_counts_violations(spark):
    """One-pass expectation suite: per-rule violation counts, NULL
    predicate counts as a violation (unknown is not a pass),
    uniqueness rules, rate math, and suite-shape guards."""
    from balboa_spark.operators.expectations import validate_expectations

    rows = [
        (1, "hello", 5),
        (2, "", 0),         # violates text_nonempty
        (3, None, 4),       # NULL text: predicate NULL -> violation (x2)
        (1, "dup id", 6),   # violates unique:doc_id
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = {
        r.rule: (r.n_rows, r.n_violations, r.violation_rate)
        for r in validate_expectations(
            df,
            {"text_nonempty": "length(text) > 0",
             "chars_consistent": "length(text) = n_chars"},
            unique=["doc_id"],
        ).collect()
    }
    assert out["text_nonempty"] == (4, 2, 0.5)  # empty + NULL text
    assert out["chars_consistent"] == (4, 1, 0.25)  # NULL text only
    assert out["unique:doc_id"] == (4, 1, 0.25)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        validate_expectations(df, {})
    with _pytest.raises(ValueError, match="duplicate"):
        validate_expectations(df, {"unique:doc_id": "1=1"}, unique=["doc_id"])
    """Upsampling with replacement: a rare group's rows repeat to hit
    its target share (copy_idx dense per row), an over-represented
    group thins (r < 1 -> Bernoulli), untargeted groups drop, totals
    land within rounding of the target, and the copy set is
    repartition-stable."""
    rows = [(i, "big" if i < 400 else "rare") for i in range(440)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus.mixture_upsample(
        df, {"big": 0.5, "rare": 0.5}, total=400
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # rare: 40 rows -> r = 5.0 -> exactly 5 copies each = 200
    assert len(by_src["rare"]) == 200
    copies = {}
    for r in by_src["rare"]:
        copies.setdefault(r.doc_id, set()).add(r.copy_idx)
    assert all(c == {0, 1, 2, 3, 4} for c in copies.values())
    # big: 400 rows -> r = 0.5 -> Bernoulli thin, ~200
    n_big = len(by_src["big"])
    assert 150 < n_big < 250 and all(r.copy_idx == 0 for r in by_src["big"])
    assert abs(len(out) - 400) < 60
    again = {
        (r.doc_id, r.copy_idx)
        for r in corpus.mixture_upsample(
            df.repartition(7), {"big": 0.5, "rare": 0.5}, total=400
        ).collect()
    }
    assert again == {(r.doc_id, r.copy_idx) for r in out}


def test_winnow_shared_substring_guarantee(spark):
    """The winnowing theorem: documents sharing a substring of length
    >= w + k - 1 (= 8 at k=5, w=4) must share at least one fingerprint
    hash; fingerprint density stays near 2/(w+1); and selection is
    stable under repartitioning."""
    from balboa_spark.operators.text import winnow_fingerprints

    shared = "the quick brown fox jumps"
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"omega {shared} psi chi phi"),
        (3, "completely unrelated content here"),
        (4, "tiny"),  # 4 chars < k -> 1 gram? no: len 4 < k=5 -> none
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(df).collect()
    fps = {}
    for r in out:
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], "shared 25-char substring yielded no shared fp"
    assert not (fps[1] & fps.get(3, set()))
    assert 4 not in fps  # below k chars -> no grams -> no fingerprints
    # density ~ 2/(w+1) = 0.4 of gram count (loose band)
    n_grams1 = len(rows[0][1]) - 4
    assert 0.15 * n_grams1 <= len({(r.pos) for r in out if r.doc_id == 1}) <= 0.6 * n_grams1
    out2 = winnow_fingerprints(df.repartition(5)).collect()
    assert {(r.doc_id, r.pos, r.fp) for r in out2} == {
        (r.doc_id, r.pos, r.fp) for r in out
    }


def test_winnow_matches_python_oracle(spark):
    """winnow_fingerprints vs an independent pure-Python winnowing
    (direct per-window scan, no SQL-style reformulation) on
    deterministic pseudo-random corpora varying alphabet size (hash
    collisions in small alphabets exercise the tie rule), doc length,
    k, and w: exact (doc, pos, fp) set parity."""
    import hashlib

    from balboa_spark.operators.text import winnow_fingerprints

    def py_winnow(text, k, w):
        t = " ".join(text.strip().lower().split())
        grams = [t[i : i + k] for i in range(len(t) - k + 1)]
        hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        n = len(hs)
        if n == 0:
            return set()
        sel = set()
        for q in range(max(n - w, 0) + 1):
            win = hs[q : q + w]
            m = min(win)
            # rightmost occurrence of the min in this window
            p = q + max(i for i, h in enumerate(win) if h == m)
            sel.add((p, hs[p]))
        return sel

    def ch(seed, i, alpha):
        v = int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:4], 16)
        return "ab cd"[v % alpha]

    for seed, n_docs, max_len, alpha, k, w in [
        ("a", 20, 40, 5, 5, 4),
        ("b", 15, 25, 3, 3, 5),  # tiny alphabet -> heavy hash repeats
        ("c", 10, 9, 5, 4, 4),  # docs near/below one window
    ]:
        texts = [
            (d, "".join(ch(seed, d * 997 + j, alpha) for j in range(1 + (d * 31) % max_len)))
            for d in range(n_docs)
        ]
        expect = {
            (d, p, fp) for d, t in texts for (p, fp) in py_winnow(t, k, w)
        }
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = {
            (r.doc_id, r.pos, r.fp)
            for r in winnow_fingerprints(df, k=k, w=w).collect()
        }
        assert got == expect, f"mismatch for corpus family {seed}"
        # the mega-document explode path must agree exactly
        got_ex = {
            (r.doc_id, r.pos, r.fp)
            for r in winnow_fingerprints(df, k=k, w=w, via="explode").collect()
        }
        assert got_ex == expect, f"explode-path mismatch for family {seed}"


def test_winnow_rightmost_min_on_repeats(spark):
    """Self-repeating text (identical k-gram hashes inside one window)
    must pick the RIGHTMOST minimal hash per window — the published
    algorithm's tie rule — and still cover every window (each window
    start selects exactly one position)."""
    from balboa_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame([(1, "ababababababab")], "doc_id long, text string")
    out = sorted(
        (r.pos, r.fp) for r in winnow_fingerprints(df, k=5, w=4).collect()
    )
    # grams alternate between md5('ababa') and md5('babab'); the min of
    # the two appears at every other position. With rightmost-tie
    # selection each window picks the LAST occurrence of the min gram
    # in the window, so selected positions advance in stride 2.
    n_grams = 14 - 4
    assert all(0 <= p < n_grams for p, _ in out)
    sel_hashes = {fp for _, fp in out}
    assert len(sel_hashes) == 1  # only the smaller of the two gram hashes
    poss = [p for p, _ in out]
    assert poss == sorted(poss) and len(poss) >= (n_grams - 4) // 2


def test_mixture_resample_hits_target_proportions(spark):
    """The binding group is kept whole; others thin to the target
    ratio; untargeted groups drop; and the selection is reshuffle-
    stable (same keep-set under repartitioning)."""
    rows = [(i, "a" if i < 300 else ("b" if i < 400 else "x")) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # capacities: a=300 docs @ w=.5 -> ratio 600; b=100 @ w=.5 -> 200
    # binding is b: kept whole; a thins to 200*.5=100 expected
    out = corpus.mixture_resample(df, {"a": 0.5, "b": 0.5}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert "x" not in by_src                      # untargeted drops
    assert len(by_src["b"]) == 100                # binding group whole
    # md5 thinning is Bernoulli at 1/3: expect ~100 of 300, allow slack
    assert 70 <= len(by_src["a"]) <= 130
    again = {
        r["doc_id"]
        for r in corpus.mixture_resample(df.repartition(7), {"a": 0.5, "b": 0.5}).collect()
    }
    assert again == by_src["a"] | by_src["b"]     # deterministic


def test_global_prefix_sum_matches_window(spark):
    """Property: the distributed two-phase prefix sum equals the
    single-window exclusive cumsum on adversarial inputs — uneven
    sizes, id gaps, arbitrary input partitioning."""
    import random

    from pyspark.sql import Window

    rnd = random.Random(7)
    ids = rnd.sample(range(10_000), 137)
    rows = [(i, rnd.randrange(0, 50)) for i in ids]
    counts = spark.createDataFrame(rows, "doc_id long, _n long").repartition(11)
    got = {
        r["doc_id"]: r["_start"]
        for r in corpus._global_prefix_sum(counts, "doc_id").collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["doc_id"]: r["_start"]
        for r in counts.select(
            "doc_id", F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_start")
        ).collect()
    }
    assert got == want


def test_dedup_repeated_units_keeps_first_occurrence(spark):
    rows = [
        (1, "a|b|a|c|b|a"),
        (2, "x|x|x"),
        (3, "solo"),
        (4, "||a||"),  # empty units dropped before dedup
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in corpus.dedup_repeated_units(df, sep="|").collect()
    }
    assert (out[1]["n_units"], out[1]["n_unique"]) == (6, 3)
    assert out[1]["clean_text"] == "a|b|c"
    assert out[2]["clean_text"] == "x" and out[2]["n_unique"] == 1
    assert out[3]["clean_text"] == "solo"
    assert (out[4]["n_units"], out[4]["clean_text"]) == (1, "a")


def test_dedup_repeated_units_is_zero_shuffle(spark, mini):
    plan = (
        corpus.dedup_repeated_units(mini, sep=" ")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_dsir_ranks_target_like_docs_first(spark):
    # target speaks "alpha beta"; half the raw corpus does too, the
    # other half is "gamma delta" prose — DSIR must rank the
    # alpha-beta half strictly above the gamma-delta half
    target = spark.createDataFrame(
        [(100 + i, "alpha beta alpha beta alpha") for i in range(3)],
        ["doc_id", "text"],
    )
    raw_rows = [(i, "alpha beta alpha beta gamma") for i in range(5)] + [
        (10 + i, "gamma delta epsilon zeta eta") for i in range(5)
    ]
    raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    top5 = corpus.dsir_topk(raw, target, k=5).collect()
    assert sorted(r["doc_id"] for r in top5) == [0, 1, 2, 3, 4]
    # weights of the target-like half are strictly positive-leaning
    w = {r["doc_id"]: r["weight"] for r in corpus.dsir_weights(raw, target).collect()}
    assert min(w[i] for i in range(5)) > max(w[10 + i] for i in range(5))


def test_dsir_target_subset_arm_matches_retokenize(spark):
    # r16 optimization parity: when target is a row subset of df, the
    # semi-join arm (target_subset=True, no second tokenize pass) must
    # produce byte-identical weights to the re-tokenizing default
    rows = [(i, f"src{i % 3}", "alpha beta gamma delta " * (1 + i % 4))
            for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    target = df.filter(F.col("source") == "src0")
    a = sorted(
        map(tuple, corpus.dsir_weights(df, target).collect())
    )
    b = sorted(
        map(tuple,
            corpus.dsir_weights(df, target, target_subset=True).collect())
    )
    assert a == b
    ta = sorted(
        map(tuple, corpus.dsir_topk(df, target, k=7).collect())
    )
    tb = sorted(
        map(tuple,
            corpus.dsir_topk(df, target, k=7, target_subset=True).collect())
    )
    assert ta == tb


def test_tokens_col_seams_match_inline_tokenize(spark):
    # r17 optimization parity: the pre-tokenized tokens_col arms of
    # dsir_weights / pack_sequences / minhash_bands must be
    # byte-identical to the inline-tokenize defaults — the pretrain
    # pipeline stages ONE token array for all three consumers.
    from balboa_spark.operators import dedup, text

    rows = [(i, f"src{i % 3}", "alpha beta gamma delta epsilon " * (1 + i % 4))
            for i in range(30)] + [(97, "src0", ""), (98, "src1", "  one")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    staged = df.withColumn("_tk", text.tokens(F.col("text")))
    target = df.filter(F.col("source") == "src0")
    staged_target = staged.filter(F.col("source") == "src0")
    a = sorted(map(tuple, corpus.dsir_weights(df, target).collect()))
    b = sorted(map(tuple, corpus.dsir_weights(
        staged, staged_target, tokens_col="_tk").collect()))
    assert a == b
    pa = sorted(map(tuple, corpus.pack_sequences(df, seq_len=16).collect()))
    pb = sorted(map(tuple, corpus.pack_sequences(
        staged, seq_len=16, tokens_col="_tk").collect()))
    assert pa == pb
    ba = sorted(map(tuple, dedup.minhash_bands(df).collect()))
    bb = sorted(map(tuple, dedup.minhash_bands(
        staged, tokens_col="_tk").collect()))
    assert ba == bb


def test_epoch_shuffle_is_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    a = corpus.epoch_shuffle(df, epoch=0).collect()
    b = corpus.epoch_shuffle(df, epoch=0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every row appears exactly once, positions are 1..n per shard
    assert sorted(r["doc_id"] for r in a) == list(range(200))
    by_shard: dict[str, list[int]] = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # a different epoch is a different permutation
    c = corpus.epoch_shuffle(df, epoch=1).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_write_epoch_shards_orders_within_shard(spark, tmp_path):
    """The written layout must BE the permutation: every shard file's
    physical row order follows the md5 order key (a dynamic-partition
    write inserts its own Sort[shard] — a bare sort on the order key
    alone is silently destroyed; regression for that), every row lands
    in the shard its key prefix names, and the file order agrees with
    epoch_shuffle's queryable (shard, pos) relation."""
    import glob
    import hashlib

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(500)], ["doc_id", "text"]
    )
    path = str(tmp_path / "epoch0")
    corpus.write_epoch_shards(df, path, epoch=0, shard_hex_chars=1)
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == list(
        range(500)
    )
    assert back.select("shard").distinct().count() <= 16

    import pyarrow.parquet as pq

    pos_by_doc = {}
    for shard_dir in glob.glob(path + "/shard=*"):
        shard = shard_dir.rsplit("=", 1)[1]
        rows = []
        for f in sorted(glob.glob(shard_dir + "/*.parquet")):
            t = pq.read_table(f)
            rows.extend(
                zip(t.column("doc_id").to_pylist(), t.column("_ord").to_pylist())
            )
        ords = [o for _, o in rows]
        # physical order inside the shard == ascending order key
        assert ords == sorted(ords), f"shard {shard} not in epoch order"
        for p, (doc, o) in enumerate(rows, start=1):
            expect = hashlib.md5(f"{doc}:0:shuffle".encode()).hexdigest()
            assert o == expect and o[0] == shard
            pos_by_doc[doc] = (shard, p)
    # the queryable relation describes this exact layout
    queried = {
        r.doc_id: (r.shard, r.pos)
        for r in corpus.epoch_shuffle(df, epoch=0).collect()
    }
    assert queried == pos_by_doc


def test_bm25_exact_scores_and_ranking(spark):
    import math

    from balboa_spark.operators.search import bm25_topk

    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "durian elderberry fig grape"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in bm25_topk(df, ["apple", "banana"], k=3).collect()}

    def score(f, dfreq, dl, n=3, avgdl=3.0, k1=1.2, b=0.75):
        idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1)
        return idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl))

    exp1 = round(score(2, 1, 3) + score(1, 2, 3), 4)  # apple x2 + banana
    exp2 = round(score(1, 2, 2), 4)  # banana only, shorter doc
    assert got[1].score == pytest.approx(exp1, abs=1e-4)
    assert got[2].score == pytest.approx(exp2, abs=1e-4)
    assert 3 not in got  # no query terms -> no row
    assert got[1].n_terms == 2 and got[2].n_terms == 1
    assert got[1].score > got[2].score  # two-term match outranks


def test_bm25_plan_broadcasts_and_takeordered(spark, mini):
    from balboa_spark.operators.search import bm25_topk

    plan = (
        bm25_topk(mini, ["quick", "spam"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_dsir_empty_target_stays_defined(spark):
    """An empty target corpus must not null the weights — they fall
    back to the uniform-target prior (finite, same for equal-length
    docs)."""
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        ["doc_id", "text"],
    )
    empty = raw.filter("doc_id < 0")
    w = {r.doc_id: r.weight for r in corpus.dsir_weights(raw, empty).collect()}
    assert len(w) == 2 and all(v is not None for v in w.values())


def test_mixture_temperature_flattens_shares(spark):
    """tau=1 reproduces every row exactly once (r=1 per group); a high
    tau pulls the rare group's share toward uniform."""
    rows = [(i, "big") for i in range(90)] + [(100 + i, "rare") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])

    same = corpus.mixture_temperature(df, tau=1.0)
    assert same.count() == 100
    assert same.filter(F.col("copy_idx") > 0).count() == 0

    flat = corpus.mixture_temperature(df, tau=100.0)
    by = {
        r.source: r.cnt
        for r in flat.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    # near-uniform target: each group ~50 of 100 (within rounding noise)
    assert abs(by["rare"] - 50) <= 5 and abs(by["big"] - 50) <= 5


def test_postings_index_matches_adhoc_bm25(spark, tables, tmp_path):
    """The persisted postings index must return exactly the ad-hoc
    BM25 ranking, and its query plan must partition-prune to the
    query terms' buckets."""
    from balboa_spark.operators.search import PostingsIndex, bm25_topk

    docs = tables["documents"]
    idx = PostingsIndex(spark, str(tmp_path / "bm25idx"))
    idx.build(docs)

    terms = ["merge", "broadcast", "shuffle"]
    from_index = [tuple(r) for r in idx.topk(terms, k=20).collect()]
    adhoc = [tuple(r) for r in bm25_topk(docs, terms, k=20).collect()]
    assert from_index == adhoc

    plan = (
        idx.topk(terms, k=20)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "tb" in plan


def test_mixture_temperature_keeps_null_group(spark):
    """A NULL group key is a group like any other: tau=1 must
    reproduce the corpus INCLUDING null-source rows (regression: the
    plain equi-join silently dropped them)."""
    rows = [(1, "a"), (2, "a"), (3, None), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus.mixture_temperature(df, tau=1.0)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 3, 4]


def test_postings_index_rebuild_is_atomic_generation(spark, tables, tmp_path):
    """Rebuilding flips to a new generation; empty queries error like
    the ad-hoc path."""
    from balboa_spark.operators.search import PostingsIndex

    docs = tables["documents"]
    idx = PostingsIndex(spark, str(tmp_path / "bmgen"))
    idx.build(docs.limit(100))
    assert idx._manifest()["generation"] == 0
    n0 = idx._manifest()["n"]
    idx.build(docs)  # rebuild on the grown corpus
    man = idx._manifest()
    assert man["generation"] == 1 and man["n"] > n0
    with pytest.raises(ValueError):
        idx.topk([])


def test_postings_index_incremental_upsert(spark, tables, tmp_path):
    """Appending a document batch must yield rankings identical to a
    full rebuild over the whole corpus, with untouched term buckets
    hard-linked across generations."""
    import os

    from balboa_spark.operators.search import PostingsIndex, bm25_topk

    # wide-vocabulary base (each doc's words spread over many term
    # buckets) + a NARROW-vocabulary batch, so untouched buckets exist
    base = spark.createDataFrame(
        [
            (i, " ".join(f"w{i}x{j}" for j in range(10)) + " alpha")
            for i in range(40)
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(100 + i, "alpha beta beta gamma") for i in range(5)],
        ["doc_id", "text"],
    )
    docs = base.unionByName(batch)

    inc = PostingsIndex(spark, str(tmp_path / "bminc"))
    inc.build(base)
    inc.upsert(batch)

    terms = ["alpha", "beta"]
    got = [tuple(r) for r in inc.topk(terms, k=20).collect()]
    adhoc = [tuple(r) for r in bm25_topk(docs, terms, k=20).collect()]
    assert got == adhoc
    man = inc._manifest()
    assert man["generation"] == 1 and man["n"] == docs.count()

    # hard-link evidence: at least one untouched tb partition shares
    # inodes between gen-0 and gen-1 (the synthetic vocab is small, so
    # allow the degenerate all-touched case only by failing loudly)
    shared = 0
    for sub in ("postings", "terms"):
        old_sub = os.path.join(inc.path, "gen-0", sub)
        new_sub = os.path.join(inc.path, "gen-1", sub)
        for part in os.listdir(new_sub):
            op, np_ = os.path.join(old_sub, part), os.path.join(new_sub, part)
            if os.path.isdir(op) and os.path.isdir(np_):
                for f in os.listdir(op):
                    if f.endswith(".parquet") and os.path.exists(
                        os.path.join(np_, f)
                    ):
                        if (
                            os.stat(os.path.join(op, f)).st_ino
                            == os.stat(os.path.join(np_, f)).st_ino
                        ):
                            shared += 1
    assert shared > 0


def test_postings_upsert_rejects_existing_ids(spark, tmp_path):
    """upsert is append-only BY CONTRACT and must enforce it: the
    index stores no text, so re-upserting an id would leave the old
    postings in place and double-count df/n/sum_dl, permanently
    skewing every future score with no error."""
    from balboa_spark.operators.search import PostingsIndex

    base = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], ["doc_id", "text"]
    )
    idx = PostingsIndex(spark, str(tmp_path / "bmdup"))
    idx.build(base)
    with pytest.raises(ValueError, match="append-only"):
        idx.upsert(
            spark.createDataFrame([(2, "beta delta")], ["doc_id", "text"])
        )
    # the refused upsert committed nothing
    assert idx._manifest()["generation"] == 0
    # disjoint ids still append fine
    idx.upsert(spark.createDataFrame([(3, "beta")], ["doc_id", "text"]))
    assert idx._manifest()["n"] == 3


def test_postings_index_empty_corpus_build_is_queryable(spark, tmp_path):
    """A zero-row partitioned write leaves no parquet footers, so a
    generation built from an empty corpus used to crash topk/upsert
    with AnalysisException at schema inference; the manifest-recorded
    id type backs an explicit empty relation instead."""
    from balboa_spark.operators.search import PostingsIndex

    idx = PostingsIndex(spark, str(tmp_path / "bmempty"))
    idx.build(
        spark.createDataFrame([], "doc_id bigint, text string")
    )
    assert idx.topk(["alpha"], k=5).collect() == []
    # growing the empty index works and becomes queryable
    idx.upsert(spark.createDataFrame([(7, "alpha alpha")], ["doc_id", "text"]))
    got = idx.topk(["alpha"], k=5).collect()
    assert [r.doc_id for r in got] == [7]


def test_postings_upsert_digit_only_buckets_stay_canonical(
    spark, tables, tmp_path
):
    """Partition-type-inference regression: a generation whose tb
    values are ALL digit-only hex ('06', '63', '11') is inferred as
    an int partition column on read; an upsert that unioned that with
    the batch's string tb and rewrote would emit 'tb=6' directories
    that the string pruning path silently misses. The canonical
    re-cast in _read_buckets must keep every bucket 2-hex-char."""
    import os

    from balboa_spark.operators.search import PostingsIndex, bm25_topk

    # md5 2-char buckets: aak->06 (leading zero), delta->63, india->11
    # (all digit-only -> int inference on the base generation);
    # alpha->2c (lettered) arrives only with the upsert batch
    base = spark.createDataFrame(
        [(0, "aak delta"), (1, "aak india")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame([(2, "alpha aak")], ["doc_id", "text"])

    idx = PostingsIndex(spark, str(tmp_path / "bmdigits"))
    idx.build(base)
    idx.upsert(batch)

    gen1 = os.path.join(idx.path, "gen-1", "postings")
    parts = sorted(e for e in os.listdir(gen1) if e.startswith("tb="))
    assert parts == ["tb=06", "tb=11", "tb=2c", "tb=63"]

    docs = base.unionByName(batch)
    got = [tuple(r) for r in idx.topk(["aak"], k=10).collect()]
    adhoc = [tuple(r) for r in bm25_topk(docs, ["aak"], k=10).collect()]
    assert got == adhoc and len(got) == 3


def test_dataset_profile_one_pass_rollups(spark):
    rows = [
        (1, "a b c", "src1", "en", 5),
        (2, "d e", "src1", "de", 3),
        (3, "f", "src2", "en", 1),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "source", "lang", "n_chars"]
    )
    out = {
        (r.grouping, r.source, r.lang): r
        for r in corpus.dataset_profile(df).collect()
    }
    assert out[(1, "src1", None)].n_docs == 2
    assert out[(1, "src1", None)].total_tokens == 5
    assert out[(2, None, "en")].total_chars == 6
    assert out[(3, None, None)].n_docs == 3
    assert out[(3, None, None)].avg_chars == 3.0
    # one aggregate node (GROUPING SETS expand), not three scans
    plan = (
        corpus.dataset_profile(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Expand") == 1


# -- BPE tokenizer training ------------------------------------------------


def _bpe_fit_py(corpus: list[str], num_merges: int, min_count: int = 2):
    """Clear-room reference: greedy word-level BPE on a word histogram."""
    from collections import Counter

    hist = Counter(
        w for line in corpus for w in line.lower().split() if w.isalnum()
    )
    vocab = {w: [c for c in w] for w in hist}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, pieces in vocab.items():
            for i in range(len(pieces) - 1):
                pairs[(pieces[i], pieces[i + 1])] += hist[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_count:
            break
        merges.append(best)
        a, b = best
        for w, pieces in vocab.items():
            out, i = [], 0
            while i < len(pieces):
                if i + 1 < len(pieces) and pieces[i] == a and pieces[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_bpe_fit_matches_reference_impl(spark):
    """Distributed fit replays classic greedy BPE exactly (merge list
    AND resulting segmentations), including deterministic tie-breaks."""
    from balboa_spark.operators import bpe

    corpus = (
        ["low low low low low", "lower lower widest widest widest"]
        + ["newest newest newest newest newest newest"]
        + ["the cat sat on the mat", "the bat and the cat"]
    )
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"])
    want_merges, want_vocab = _bpe_fit_py(corpus, num_merges=8)
    got = bpe.bpe_fit(df, num_merges=8)
    assert got == want_merges

    seg = {
        r["word"]: r["pieces"].split(" ")
        for r in bpe.bpe_segment_words(df, got).collect()
    }
    assert seg == want_vocab
    # greedy-overlap edge: merge (a, a) on "aaa" -> [aa, a]
    row = (
        spark.range(1)
        .select(bpe.segment(F.lit("aaa"), [("a", "a")]).alias("p"))
        .collect()[0]
    )
    assert row["p"] == ["aa", "a"]


def test_bpe_fit_min_count_stops_early(spark):
    from balboa_spark.operators import bpe

    df = spark.createDataFrame([(0, "ab ab cd")], ["doc_id", "text"])
    # (a,b) count 2 passes the floor; nothing else repeats
    assert bpe.bpe_fit(df, num_merges=5, min_pair_count=2) == [("a", "b")]


def test_bpe_fit_partitioning_independent(spark):
    """The (count desc, a asc, b asc) tie-break makes fit reproducible
    regardless of physical partitioning."""
    from balboa_spark.operators import bpe

    corpus = ["aa bb aa cc", "bb aa dd dd", "cc dd bb aa"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    m1 = bpe.bpe_fit(df, num_merges=4)
    m2 = bpe.bpe_fit(df.repartition(7), num_merges=4)
    assert m1 == m2 and len(m1) > 0


def test_bpe_property_random_corpora_match_reference(spark):
    """Property check (bounded examples — each runs Spark jobs): on
    random small corpora the distributed fit reproduces the pure-
    Python reference exactly, merges AND segmentations."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from balboa_spark.operators import bpe

    word = st.text(alphabet="abcde", min_size=1, max_size=6)
    line = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(corpus=st.lists(line, min_size=1, max_size=5))
    def check(corpus):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
        )
        want_merges, want_vocab = _bpe_fit_py(corpus, num_merges=5)
        got = bpe.bpe_fit(df, num_merges=5)
        assert got == want_merges
        seg = {
            r["word"]: r["pieces"].split(" ")
            for r in bpe.bpe_segment_words(df, got).collect()
        }
        assert seg == want_vocab

    check()


def test_postings_upsert_disjoint_vocabulary(spark, tables, tmp_path):
    """A batch whose vocabulary shares NO term bucket with the stored
    generation: the old-side bucket read falls back to an empty
    relation (with the real schema) and the new buckets still land —
    queries over old, new, and absent terms all stay correct."""
    from balboa_spark.operators.search import PostingsIndex, bm25_topk

    base = spark.createDataFrame([(0, "aak aak delta")], ["doc_id", "text"])
    batch = spark.createDataFrame([(1, "zulu zulu echo")], ["doc_id", "text"])
    idx = PostingsIndex(spark, str(tmp_path / "bmdisj"))
    idx.build(base)
    idx.upsert(batch)

    docs = base.unionByName(batch)
    for terms in (["aak"], ["zulu"], ["aak", "zulu"]):
        got = [tuple(r) for r in idx.topk(terms, k=5).collect()]
        adhoc = [tuple(r) for r in bm25_topk(docs, terms, k=5).collect()]
        assert got == adhoc, terms
    assert idx.topk(["absentterm"], k=5).count() == 0


def test_source_overlap_matrix(spark):
    """a/b identical text -> all 3 grams shared; c differs in the last
    token -> shares the 2 grams that avoid it; d disjoint -> absent."""
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    rows = [
        (1, base, "a"),
        (2, base, "b"),
        (3, base.replace("w9", "x9"), "c"),
        (4, "z0 z1 z2 z3 z4 z5 z6 z7 z8", "d"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = sorted(tuple(r) for r in corpus.source_overlap(df, n=8).collect())
    assert out == [("a", "b", 3), ("a", "c", 2), ("b", "c", 2)]


def test_source_overlap_no_join_no_broadcast(spark, tables):
    """The matrix comes from ONE grouped pass with #source-bounded
    aggregation state — no join of corpus-sized relations, no forced
    broadcast."""
    analyzed = (
        corpus.source_overlap(tables["documents"])
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "ResolvedHint" not in analyzed and "Join" not in analyzed


def test_bpe_segment_arrow_parity_with_column_fold(spark):
    """The Arrow batch segmenter must reproduce the Column fold
    byte-for-byte on a real fit (the fold is the oracle-replayable
    reference; the Arrow path is the production-vocab scale path)."""
    from balboa_spark.operators import bpe

    corpus = (
        ["low low low low low", "lower lower widest widest widest"]
        + ["newest newest newest newest newest newest"]
        + ["the cat sat on the mat", "the bat and the cat"]
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    merges = bpe.bpe_fit(df, num_merges=12)
    assert merges
    words = bpe.word_histogram(df).select("word")
    both = words.select(
        "word",
        bpe.segment(F.col("word"), merges).alias("col_fold"),
        bpe.segment_arrow(F.col("word"), merges).alias("arrow"),
    ).collect()
    assert both and all(r["col_fold"] == r["arrow"] for r in both)


def _byte_bpe_fit_py(corpus: list[str], num_merges: int, min_count: int = 2):
    """Clear-room reference for the BYTE arm: greedy BPE over hex-pair
    byte units of GPT-2-style pre-tokens."""
    import re
    from collections import Counter

    pretok = re.compile(r" ?[^\W\d_]+| ?\d+| ?[^\s\w]+|_+|\s+")
    # NOTE: python re has no \p{L}; approximate with the same classes
    # the engines use by testing on ASCII+latin corpora where the
    # splits provably coincide (asserted below via lossless concat).
    hist = Counter(w for line in corpus for w in pretok.findall(line))
    vocab = {
        w: [f"{b:02X}" for b in w.encode("utf-8")] for w in hist
    }
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, pieces in vocab.items():
            for i in range(len(pieces) - 1):
                pairs[(pieces[i], pieces[i + 1])] += hist[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_count:
            break
        merges.append(best)
        a, b = best
        for w, pieces in vocab.items():
            out, i = [], 0
            while i < len(pieces):
                if i + 1 < len(pieces) and pieces[i] == a and pieces[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_byte_pretokenize_lossless(spark):
    """Concatenating the pre-tokens must restore the raw text exactly
    (every char falls in exactly one regex alternative) — on ASCII,
    accents, CJK, emoji, digits, punctuation runs, and whitespace."""
    from balboa_spark.operators import bpe

    texts = [
        "Hello, wörld 42!",
        "  leading and   internal spaces\tand tabs\n",
        "日本語のテキスト and English mixed 2024",
        "emoji 🙂🚀 and symbols +++ --- ***",
        "don't — unicode dash…",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.select(
        "text",
        F.concat_ws("", bpe.byte_pretokenize(F.col("text"))).alias("back"),
    ).collect()
    assert all(r["back"] == r["text"] for r in rows)


def test_byte_bpe_fit_matches_reference_impl(spark):
    """Distributed byte-level fit replays the clear-room greedy
    reference exactly (merge list over hex-pair units, pre-token
    histogram weighting, deterministic tie-breaks)."""
    from balboa_spark.operators import bpe

    corpus = [
        "low low low low low",
        "lower lower widest widest widest",
        "the cat sat on the mat",
        "the bat and the cat",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    want_merges, want_vocab = _byte_bpe_fit_py(corpus, num_merges=10)
    got = bpe.byte_bpe_fit(df, num_merges=10)
    assert got == want_merges
    seg = {
        r["word"]: list(r["p"])
        for r in bpe.byte_word_histogram(df)
        .select("word", bpe.byte_segment(F.col("word"), got).alias("p"))
        .collect()
    }
    assert seg == want_vocab


def test_byte_bpe_roundtrip_no_oov_on_arbitrary_utf8(spark):
    """THE byte-level guarantee: merges fit on plain ASCII must encode
    ANY UTF-8 text — emoji, CJK, accents, never-seen punctuation —
    with zero OOV (structural vocab covers every producible piece)
    and decode back byte-exactly."""
    from balboa_spark.operators import bpe

    fit_df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog the the")],
        ["doc_id", "text"],
    )
    merges = bpe.byte_bpe_fit(fit_df, num_merges=8)
    assert merges
    wild = [
        (1, "完全に見たことのない日本語テキスト"),
        (2, "emoji soup 🙂🚀🔥 and naïve café"),
        (3, "механизм работает"),
        (4, "the quick brown fox"),  # in-distribution control
    ]
    df = spark.createDataFrame(wild, ["doc_id", "text"])
    enc = bpe.byte_encode_corpus(df, merges)
    back = enc.select(
        "doc_id", bpe.byte_decode(F.col("piece_ids"), merges).alias("text")
    )
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == dict(wild)
    # structural vocab: base ids are the byte values, merges appended
    vocab = bpe.byte_vocab(merges)
    assert vocab[0x41] == ("41", 0x41) and len(vocab) == 256 + len(merges)
    # and every emitted id is within the structural range (no UNK slot)
    ids = [i for r in enc.collect() for i in r["piece_ids"]]
    assert ids and all(0 <= i < 256 + len(merges) for i in ids)


def test_byte_segment_arrow_parity_with_column_fold(spark):
    """The Arrow byte segmenter must reproduce the Column fold exactly
    on multi-byte text (hex-pair initial units in both paths)."""
    from balboa_spark.operators import bpe

    corpus = ["héllo héllo wörld wörld wörld 日本 日本 🙂 🙂 🙂"]
    df = spark.createDataFrame([(0, corpus[0])], ["doc_id", "text"])
    merges = bpe.byte_bpe_fit(df, num_merges=10)
    assert merges
    words = bpe.byte_word_histogram(df).select("word")
    both = words.select(
        "word",
        bpe.byte_segment(F.col("word"), merges).alias("col_fold"),
        bpe.byte_segment_arrow(F.col("word"), merges).alias("arrow"),
    ).collect()
    assert both and all(r["col_fold"] == r["arrow"] for r in both)


def test_bpe_segment_word_py_matches_sequential_passes():
    """The rank-skip algorithm inside the Arrow segmenter must equal
    naive sequential-pass replay on adversarial merge lists —
    including same-string pieces minted by two different merge paths
    (e.g. 'abc' from (a,bc) and (ab,c)), the corner where a plain
    lowest-rank-first loop diverges from pass semantics."""
    import random

    from balboa_spark.operators.bpe import _segment_word_py

    def seg_passes(word, merges):
        cur = list(word)
        for a, b in merges:
            if len(cur) < 2:
                break
            out = [cur[0]]
            for x in cur[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            cur = out
        return cur

    # hand-built same-string corner: 'abc' mintable via rank1 (a,bc)
    # and rank3 (ab,c); rank2 (x,abc) must NOT re-fire for the second
    # minting under pass semantics
    merges = [("b", "c"), ("a", "bc"), ("x", "abc"), ("a", "b"), ("ab", "c")]
    ranks = {m: i for i, m in enumerate(merges)}
    for w in ("xabc", "xabcabc", "abcxabc", "xxabc"):
        assert _segment_word_py(list(w), merges, ranks) == seg_passes(w, merges)

    rnd = random.Random(7)
    alphabet = "ab"
    for _ in range(300):
        pieces = ["a", "b", "aa", "ab", "ba", "bb", "aab", "abb"]
        merges = []
        seen = set()
        for _ in range(rnd.randrange(1, 10)):
            m = (rnd.choice(pieces), rnd.choice(pieces))
            if m not in seen:
                seen.add(m)
                merges.append(m)
        ranks = {m: i for i, m in enumerate(merges)}
        word = "".join(rnd.choice(alphabet) for _ in range(rnd.randrange(1, 12)))
        assert _segment_word_py(list(word), merges, ranks) == seg_passes(
            word, merges
        ), (word, merges)


def test_bpe_segment_any_switches_paths(spark):
    """<= threshold stays the pure-codegen fold (no Python in the
    plan); above it the plan carries exactly the Arrow batch eval."""
    from balboa_spark.operators import bpe

    df = spark.createDataFrame([(0, "aba abab")], ["doc_id", "text"])
    small = [("a", "b")]
    big = small + [(f"q{i}", f"q{i+1}") for i in range(bpe.ARROW_MERGE_THRESHOLD)]

    words = bpe.word_histogram(df).select("word")
    plan_small = (
        words.select(bpe.segment_any(F.col("word"), small))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan_small and "Python" not in plan_small
    plan_big = (
        words.select(bpe.segment_any(F.col("word"), big))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan_big
    # and the big path still returns the small path's answer (inert
    # tail merges change nothing)
    a = {r["word"]: r["p"] for r in words.select(
        "word", bpe.segment(F.col("word"), small).alias("p")).collect()}
    b = {r["word"]: r["p"] for r in words.select(
        "word", bpe.segment_any(F.col("word"), big).alias("p")).collect()}
    assert a == b


def test_tokenizer_store_roundtrip(spark, tmp_path):
    """fit → load → segment must reproduce the in-memory tokenizer
    exactly: merges in learned order, vocab ids dense, and the stored
    segmentation expression equal to segmenting with the returned
    merge list."""
    from balboa_spark.operators import bpe

    corpus = ["low low low lower lower", "newest newest newest widest"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    ts = bpe.TokenizerStore(spark, str(tmp_path / "tok"))
    merges = ts.fit(df, num_merges=8)
    assert ts.merges() == merges and len(merges) > 0
    assert ts._manifest()["generation"] == 0

    vocab = {r["piece"]: r["piece_id"] for r in ts.vocab().collect()}
    direct = {
        r["piece"]: r["piece_id"]
        for r in bpe.vocab_table(df, merges).collect()
    }
    assert vocab == direct
    got = (
        bpe.word_histogram(df)
        .select("word", ts.segment_col(F.col("word")).alias("p"))
        .collect()
    )
    want = {
        r["word"]: r["p"]
        for r in bpe.word_histogram(df)
        .select("word", bpe.segment(F.col("word"), merges).alias("p"))
        .collect()
    }
    assert {r["word"]: r["p"] for r in got} == want

    # refit flips the generation atomically
    ts.fit(df, num_merges=4)
    assert ts._manifest()["generation"] == 1 and len(ts.merges()) <= 4


def test_tokenizer_store_crash_mid_fit_keeps_old_generation(spark, tmp_path):
    """A gen directory without a manifest flip is invisible — readers
    keep the previous tokenizer (merge list AND vocab stay the old
    pair; they can never disagree)."""
    import os
    import shutil

    from balboa_spark.operators import bpe

    df = spark.createDataFrame([(0, "ab ab ab cd")], ["doc_id", "text"])
    ts = bpe.TokenizerStore(spark, str(tmp_path / "tokc"))
    merges = ts.fit(df, num_merges=4)
    # simulate a crash: half-written next generation, no flip
    os.makedirs(os.path.join(ts.path, "gen-1"), exist_ok=True)
    with open(os.path.join(ts.path, "gen-1", "merges.json"), "w") as fh:
        fh.write("[]")
    assert ts._manifest()["generation"] == 0
    assert ts.merges() == merges
    assert ts.vocab().count() > 0
    shutil.rmtree(os.path.join(ts.path, "gen-1"))


def test_tokenizer_store_encode_ids(spark, tmp_path):
    """encode() maps the corpus to dense piece-id sequences in token
    order under the stored vocabulary."""
    from balboa_spark.operators import bpe

    df = spark.createDataFrame(
        [(0, "abab abab cd"), (1, "cd abab")], ["doc_id", "text"]
    )
    ts = bpe.TokenizerStore(spark, str(tmp_path / "toke"))
    ts.fit(df, num_merges=8)
    ids = {r["piece"]: r["piece_id"] for r in ts.vocab().collect()}
    seg = {
        r["word"]: r["pieces"].split(" ")
        for r in bpe.bpe_segment_words(df, ts.merges()).collect()
    }
    enc = {r["doc_id"]: r["piece_ids"] for r in ts.encode(df).collect()}
    want0 = [ids[p] for w in ("abab", "abab", "cd") for p in seg[w]]
    want1 = [ids[p] for w in ("cd", "abab") for p in seg[w]]
    assert enc == {0: want0, 1: want1}


def test_bpe_vocab_table_ids_dense_and_bounded(spark):
    from balboa_spark.operators import bpe

    corpus = ["low low lower lowest", "low lower"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    merges = bpe.bpe_fit(df, num_merges=4)
    vt = bpe.vocab_table(df, merges).collect()
    ids = sorted(r["piece_id"] for r in vt)
    assert ids == list(range(len(vt)))  # dense, 0-based
    # structural bound: |charset| + |merges| distinct pieces at most
    charset = {c for t in corpus for c in t if c != " "}
    assert len(vt) <= len(charset) + len(merges)
    # heaviest piece gets id 0
    top = min(vt, key=lambda r: r["piece_id"])
    assert top["weight"] == max(r["weight"] for r in vt)


def test_cli_corpus_pretrain_e2e(spark, tmp_path):
    """The corpus-pretrain subcommand end to end: parquet docs in,
    packed-sequence parquet out, and the output equals calling the
    library operator directly."""
    from balboa_spark.cli import build_parser, run

    rows = [
        (i, f"src{i % 2}",
         " ".join(f"w{i}x{j}" for j in range(40)))
        for i in range(30)
    ] + [(100, "src0", " ".join(f"w1x{j}" for j in range(39)))]  # near-dup of doc 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    inp = str(tmp_path / "docs_in")
    docs.write.parquet(inp)
    out = str(tmp_path / "packed")
    argv = [
        "corpus-pretrain", inp, out,
        "--target-source", "src0", "--dsir-k", "10", "--seq-len", "32",
    ]
    assert run(build_parser().parse_args(argv), spark=spark) == 0
    got = {
        r["seq_id"]: (r["n_seq_tokens"], r["seq_text"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["seq_id"]: (r["n_seq_tokens"], r["seq_text"])
        for r in corpus.pretrain_pipeline(
            spark.read.parquet(inp), target_source="src0",
            dsir_k=10, seq_len=32,
        ).collect()
    }
    assert got == want and len(got) > 0


def test_postings_index_generation_time_travel(spark, tmp_path):
    """topk(generation=n) scores an older retained snapshot with THAT
    generation's own frozen n/avgdl, so pre-upsert rankings reproduce
    exactly; unknown generations error clearly."""
    from balboa_spark.operators.search import PostingsIndex

    base = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma delta")], ["doc_id", "text"]
    )
    idx = PostingsIndex(spark, str(tmp_path / "bmtt"))
    idx.build(base)
    before = [tuple(r) for r in idx.topk(["alpha"], k=5).collect()]
    idx.upsert(spark.createDataFrame([(3, "alpha alpha")], ["doc_id", "text"]))
    assert idx.generations() == [0, 1]
    # current generation sees the new doc; gen 0 reproduces the old
    now = [tuple(r) for r in idx.topk(["alpha"], k=5).collect()]
    assert len(now) == 3
    replay = [tuple(r) for r in idx.topk(["alpha"], k=5, generation=0).collect()]
    assert replay == before
    with pytest.raises(ValueError, match="not retained"):
        idx.topk(["alpha"], generation=99)


def test_length_batches_bounds_and_determinism(spark):
    """Every batch holds same-bucket docs (padding waste < bucket
    width), batches fill to batch_size before a new index opens, and
    assignment is reshuffle-stable."""
    rows = [(i, " ".join("w" for _ in range(5 + 3 * i))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus.length_batches(df, bucket_width=16, batch_size=3).collect()
    assert len(out) == 20
    for r in out:
        assert r["len_bucket"] == r["n_tokens"] // 16
    from collections import Counter

    sizes = Counter((r["len_bucket"], r["batch_idx"]) for r in out)
    per_bucket = Counter(r["len_bucket"] for r in out)
    for (b, i), n in sizes.items():
        # only the LAST batch of a bucket may be short
        if i < (per_bucket[b] - 1) // 3:
            assert n == 3
    again = corpus.length_batches(
        df.repartition(7), bucket_width=16, batch_size=3
    ).collect()
    assert {(r["doc_id"], r["batch_idx"]) for r in again} == {
        (r["doc_id"], r["batch_idx"]) for r in out
    }


def test_tokenizer_store_time_travel(spark, tmp_path):
    from balboa_spark.operators import bpe

    df = spark.createDataFrame([(0, "ab ab ab cd cd")], ["doc_id", "text"])
    ts = bpe.TokenizerStore(spark, str(tmp_path / "tokg"))
    m0 = ts.fit(df, num_merges=4)
    ts.fit(df, num_merges=1)
    assert ts.generations() == [0, 1]
    assert ts.merges(generation=0) == m0
    assert len(ts.merges()) <= 1
    # gen-0's vocab is exactly the piece table of gen-0's merges
    want0 = {r["piece"] for r in bpe.vocab_table(df, m0).collect()}
    assert {r["piece"] for r in ts.vocab(generation=0).collect()} == want0
    with pytest.raises(ValueError, match="not retained"):
        ts.merges(generation=9)


def test_normalize_unicode_forms(spark):
    """NFC composes decomposed accents; NFKC additionally folds
    compatibility forms (ligature fi, full-width digits); parity with
    unicodedata on every row, NULLs pass through."""
    import unicodedata

    from balboa_spark.operators.text import normalize_unicode

    rows = [
        (1, "école"),          # decomposed -> composed under NFC
        (2, "ﬁne １２"),  # ligature fi + full-width digits
        (3, "plain ascii"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for form in ("NFC", "NFKC"):
        out = {r["doc_id"]: (r["norm_text"], r["changed"])
               for r in normalize_unicode(df, form=form).collect()}
        for i, t in rows:
            want = unicodedata.normalize(form, t) if t is not None else None
            assert out[i][0] == want
            assert out[i][1] == (want != t if t is not None else False)
    # NFC leaves the ligature; NFKC folds it
    nfc = {r["doc_id"]: r["norm_text"]
           for r in normalize_unicode(df, form="NFC").collect()}
    nfkc = {r["doc_id"]: r["norm_text"]
            for r in normalize_unicode(df, form="NFKC").collect()}
    assert "ﬁ" in nfc[2] and nfkc[2] == "fine 12"
    with pytest.raises(ValueError):
        normalize_unicode(df, form="XYZ")


def test_weighted_sample_k_deterministic_and_proportional(spark):
    """A-ES weighted sampling: reshuffle-stable, zero/negative weights
    excluded, and inclusion tracks weight (P(pick) = w/sum_w for k=1 —
    checked statistically over many salts)."""
    from pyspark.sql import functions as F

    rows = [(i, 1.0 if i else 5.0) for i in range(6)]  # doc 0 weighs 5x
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sorted(
        r["doc_id"]
        for r in corpus.weighted_sample_k(df, 3, F.col("w")).collect()
    )
    again = sorted(
        r["doc_id"]
        for r in corpus.weighted_sample_k(
            df.repartition(5), 3, F.col("w")
        ).collect()
    )
    assert got == again and len(got) == 3
    # zero/negative weights can never be drawn
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, 2.0)], "doc_id long, w double"
    )
    assert [
        r["doc_id"]
        for r in corpus.weighted_sample_k(df2, 3, F.col("w")).collect()
    ] == [3]
    # proportionality: k=1 over {w=5, five w=1}: doc 0 should win about
    # half of independent draws (different salts); binomial(40, .5)
    # stays within [8, 32] with overwhelming probability
    wins = sum(
        corpus.weighted_sample_k(df, 1, F.col("w"), salt=f"s{t}").collect()[0][
            "doc_id"
        ]
        == 0
        for t in range(40)
    )
    assert 8 <= wins <= 32


def test_weighted_sample_k_stratified(spark):
    from pyspark.sql import functions as F

    rows = [(i, "a" if i < 10 else "b", float(1 + i % 3)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w double")
    out = corpus.weighted_sample_k(
        df, 4, F.col("w"), strata=("src",)
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["src"], []).append(r["doc_id"])
    assert sorted(by) == ["a", "b"] and all(len(v) == 4 for v in by.values())


def test_weighted_sample_k_scale_invariant_rounding(spark):
    """Significant-digit key rounding: scaling every weight by 1e6
    must not change the drawn set (an absolute rounding would mass-tie
    the collapsed keys and bias the draw to low ids)."""
    from pyspark.sql import functions as F

    rows = [(i, float(1 + (i * 13) % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    small = sorted(
        r["doc_id"] for r in corpus.weighted_sample_k(df, 10, F.col("w")).collect()
    )
    big = sorted(
        r["doc_id"]
        for r in corpus.weighted_sample_k(df, 10, F.col("w") * 1.0e6).collect()
    )
    assert small == big


def test_cli_corpus_datasheet_e2e(spark, tmp_path):
    """corpus-datasheet writes the markdown card with consistent
    numbers: overall == sum over sources, gate rate and dup rate
    match the operators computed directly."""
    from balboa_spark.cli import build_parser, run

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en", "s0", 43),
            (2, "the quick brown fox jumps over the lazy dog", "en", "s1", 43),
            (3, "short", "de", "s0", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    out = str(tmp_path / "CARD.md")
    args = build_parser().parse_args(["corpus-datasheet", inp, out])
    assert run(args, spark=spark) == 0
    md = open(out).read()
    assert "documents: **3**" in md
    assert "| s0 | 2 |" in md and "| s1 | 1 |" in md
    assert "| en | 2 |" in md and "| de | 1 |" in md
    # docs 1 and 2 share a normalized text -> 1 duplicate of 3
    assert "exact-duplicate documents: **33.3%** (1 of 3" in md


def test_domain_cap_deterministic_uniform_keep(spark):
    """At most cap docs per registrable domain; the keep set is a
    pure function of (id, salt) — identical under reshuffle — and
    domains under the cap pass through whole."""
    from pyspark.sql import functions as F

    rows = [(i, f"https://site{'a' if i < 20 else 'b'}.com/p{i}") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = corpus.domain_cap(df, cap=8)
    kept = sorted(r["doc_id"] for r in out.collect())
    again = sorted(
        r["doc_id"] for r in corpus.domain_cap(df.repartition(7), cap=8).collect()
    )
    assert kept == again
    a = [i for i in kept if i < 20]
    b = [i for i in kept if i >= 20]
    assert len(a) == 8  # sitea capped
    assert len(b) == 5  # siteb under cap: all kept
    assert a != list(range(8))  # md5 order, not first-N by id


def test_tokenizer_store_byte_and_unigram_kinds(spark, tmp_path):
    """One store API, three persisted tokenizer families (r13): the
    byte arm round-trips merges + the structural vocab and encodes
    never-seen UTF-8 with zero OOV straight off the stored artifact;
    the unigram arm round-trips its piece distribution and encodes
    via the stored ids; the kind is pinned by the first fit — a
    different-kind fit on the same path raises; artifact accessors
    cross-guard (merges() on a unigram store, pieces() on a BPE one)."""
    from balboa_spark.operators import bpe, unigram

    corpus = spark.createDataFrame(
        [(0, "the quick brown fox the quick brown dog the the")],
        ["doc_id", "text"],
    )

    bts = bpe.TokenizerStore(spark, str(tmp_path / "btok"))
    bmerges = bts.fit_byte(corpus, num_merges=6)
    assert bts.kind() == "byte" and bts.merges() == bmerges
    vocab_rows = bts.vocab().count()
    assert vocab_rows == 256 + len(bmerges)
    wild = spark.createDataFrame([(1, "naïve café 🙂")], ["doc_id", "text"])
    enc = bts.encode(wild).collect()[0]["piece_ids"]
    assert enc and all(0 <= i < 256 + len(bmerges) for i in enc)
    back = spark.createDataFrame([(1, list(enc))], "doc_id long, piece_ids array<int>")
    got = back.select(
        bpe.byte_decode(F.col("piece_ids"), bmerges).alias("t")
    ).collect()[0]["t"]
    assert got == "naïve café 🙂"
    with pytest.raises(ValueError, match="kind"):
        bts.fit(corpus)  # word fit on a byte store
    with pytest.raises(ValueError, match="pieces"):
        bts.pieces()

    uts = bpe.TokenizerStore(spark, str(tmp_path / "utok"))
    pieces = uts.fit_unigram(corpus, vocab_size=24, em_iters=1)
    assert uts.kind() == "unigram" and uts.pieces() == pieces
    with pytest.raises(ValueError, match="merges"):
        uts.merges()
    with pytest.raises(ValueError, match="unigram segmentation"):
        uts.segment_col(F.lit("quick"))
    enc_u = {r["doc_id"]: list(r["piece_ids"]) for r in uts.encode(corpus).collect()}
    ids = {p: i + 1 for i, (p, _) in enumerate(sorted(pieces))}
    rev = {v: k for k, v in ids.items()}
    joined = "".join(rev.get(i, "?") for i in enc_u[0])
    assert joined == "thequickbrownfoxthequickbrowndogthethe"
    # and the stored distribution drives the same staged segmentation
    seg = {
        r["word"]: r["pieces"]
        for r in unigram.unigram_segment_words(corpus, uts.pieces()).collect()
    }
    assert "".join(seg["quick"].split(" ")) == "quick"


def test_cli_tokenizer_fit_encode_e2e(spark, tmp_path):
    """tokenizer-fit + tokenizer-encode subcommands end to end for all
    three kinds: fit commits a generation, encode writes (doc_id,
    piece_ids) equal to calling the library path directly, and a
    second fit of a DIFFERENT kind on the same store fails loudly."""
    from balboa_spark.cli import build_parser, run
    from balboa_spark.operators import bpe

    docs = spark.createDataFrame(
        [(0, "the quick brown fox the quick brown dog the the"),
         (1, "quick brown quick brown")],
        ["doc_id", "text"],
    )
    inp = str(tmp_path / "docs_in")
    docs.write.parquet(inp)

    for kind in ("word", "byte", "unigram"):
        store = str(tmp_path / f"tok_{kind}")
        out = str(tmp_path / f"enc_{kind}")
        argv = ["tokenizer-fit", store, inp, "--kind", kind,
                "--num-merges", "6", "--vocab-size", "24"]
        assert run(build_parser().parse_args(argv), spark=spark) == 0
        argv = ["tokenizer-encode", store, inp, out]
        assert run(build_parser().parse_args(argv), spark=spark) == 0
        got = {
            r["doc_id"]: list(r["piece_ids"])
            for r in spark.read.parquet(out).collect()
        }
        ts = bpe.TokenizerStore(spark, store)
        want = {
            r["doc_id"]: list(r["piece_ids"])
            for r in ts.encode(spark.read.parquet(inp)).collect()
        }
        assert got == want and set(got) == {0, 1} and all(got.values())

    # kind pinning through the CLI path too
    import pytest as _pt
    with _pt.raises(ValueError, match="kind"):
        run(build_parser().parse_args(
            ["tokenizer-fit", str(tmp_path / "tok_word"), inp, "--kind", "byte"]
        ), spark=spark)


def test_byte_bpe_roundtrip_property_arbitrary_unicode(spark):
    """Property: for ANY unicode text (emoji, CJK, control chars,
    surrogate-free arbitrary codepoints), byte pre-tokenization is
    lossless and encode -> decode is byte-exact under merges the text
    never influenced — the structural no-OOV guarantee, not a
    fixture coincidence. Batched: one Spark round-trip over many
    hypothesis examples beats a per-example session hit."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from balboa_spark.operators import bpe

    merges = bpe.byte_bpe_fit(
        spark.createDataFrame(
            [(0, "the quick brown fox the quick the")], ["doc_id", "text"]
        ),
        num_merges=6,
    )
    collected: list[str] = []

    @settings(
        max_examples=60, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(t=st.text(min_size=1, max_size=40))
    def gather(t):
        collected.append(t)

    gather()
    rows = list(enumerate(dict.fromkeys(collected)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # lossless pre-tokenization
    pre = df.select(
        "doc_id",
        F.concat_ws("", bpe.byte_pretokenize(F.col("text"))).alias("back"),
        "text",
    ).collect()
    assert all(r["back"] == r["text"] for r in pre)
    # byte-exact encode -> decode
    enc = bpe.byte_encode_corpus(df, merges)
    back = {
        r["doc_id"]: r["t"]
        for r in enc.select(
            "doc_id", bpe.byte_decode(F.col("piece_ids"), merges).alias("t")
        ).collect()
    }
    want = dict(rows)
    # docs whose pre-tokenization is empty (impossible: every char
    # matches an alternative) would drop; assert none did
    assert back == want


def test_mixture_token_budget_hits_budgets(spark):
    """Achieved per-group token counts concentrate around the budget
    (binomial jitter), an under-budget group is kept WHOLE, groups
    absent from the budgets drop, and selection is
    partitioning-independent."""
    from balboa_spark.operators.text import token_count

    rows = [
        (i, ["web", "code", "forum"][i % 3],
         " ".join(f"w{i}x{j}" for j in range(20)))
        for i in range(600)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # web total = 200 docs * 20 tok = 4000; code same; forum dropped
    budgets = {"web": 1000, "code": 999999}
    kept = corpus.mixture_token_budget(docs, budgets)
    got = {
        r["source"]: r["tok"]
        for r in kept.groupBy("source")
        .agg(F.sum(token_count(F.col("text"))).alias("tok"))
        .collect()
    }
    assert set(got) == {"web", "code"}
    assert got["code"] == 4000                      # under budget: whole
    assert 600 <= got["web"] <= 1400                # ~budget +- jitter
    # deterministic under repartitioning
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in corpus.mixture_token_budget(docs.repartition(13), budgets).collect()
    )
    assert a == b


def test_curriculum_order_stages_and_mix_back(spark):
    """Stage assignment by fixed edges (NULL -> last stage), md5 sort
    key deterministic under any partitioning, mix_back moves ~f of
    non-first-stage docs one stage earlier (never below 0)."""
    rows = [(i, float(i)) for i in range(300)] + [(999, None)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars double")
    out = {
        r.doc_id: (r.stage, r.sort_key)
        for r in corpus.curriculum_order(df, "n_chars", (99.5, 199.5)).collect()
    }
    assert out[0][0] == 0 and out[150][0] == 1 and out[299][0] == 2
    assert out[999][0] == 2  # unscorable trains last
    # repartitioned input -> identical schedule
    out8 = {
        r.doc_id: (r.stage, r.sort_key)
        for r in corpus.curriculum_order(
            df.repartition(8), "n_chars", (99.5, 199.5)
        ).collect()
    }
    assert out == out8
    # mix_back: a ~25% md5 fraction of stages 1-2 moves one earlier
    mixed = {
        r.doc_id: r.stage
        for r in corpus.curriculum_order(
            df, "n_chars", (99.5, 199.5), mix_back=0.25
        ).collect()
    }
    assert all(mixed[i] == 0 for i in range(100))  # stage 0 never moves
    moved = sum(1 for i in range(100, 300) if mixed[i] == out[i][0] - 1)
    assert 30 <= moved <= 70  # ~50 of 200 at f=0.25
    assert all(mixed[i] in (out[i][0], out[i][0] - 1) for i in range(100, 300))


# ----------------------------------------------- GPT-2 interchange (r14)
def test_gpt2_bytes_to_unicode_bijective():
    from balboa_spark.operators import tokenizer_io as tio

    b2u = tio.bytes_to_unicode()
    assert len(b2u) == 256 and len(set(b2u.values())) == 256
    # the published anchor points: space = Ġ, newline = Ċ, 'A' = 'A'
    assert b2u[0x20] == "Ġ" and b2u[0x0A] == "Ċ"
    assert b2u[ord("A")] == "A"
    u2b = tio.unicode_to_bytes()
    assert all(u2b[c] == b for b, c in b2u.items())


def test_gpt2_export_import_roundtrip_identical_ids(spark, tmp_path):
    """fit -> export vocab.json+merges.txt -> import into a fresh
    store -> byte encode ids IDENTICAL (the r13 verdict's missing
    last mile), on emoji/CJK/contraction text."""
    from balboa_spark.operators import bpe

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 3) for i in range(6)]
        + [(10, "naïve café 猫が好き 🚀🚀 don't")],
        "doc_id long, text string",
    )
    src = bpe.TokenizerStore(spark, str(tmp_path / "src"))
    src.fit_byte(corpus, num_merges=8)
    art = str(tmp_path / "artifacts")
    vocab = src.export_gpt2(art)
    assert vocab["<|endoftext|>"] == 256 + 8  # appended after pieces

    dst = bpe.TokenizerStore(spark, str(tmp_path / "dst"))
    merges2 = dst.import_gpt2(art)
    assert merges2 == src.merges()
    a = {r.doc_id: r.piece_ids for r in src.encode(corpus).collect()}
    b = {r.doc_id: r.piece_ids for r in dst.encode(corpus).collect()}
    assert a == b and len(a) == 7
    # decode through the imported store's merges stays byte-exact
    got = (
        dst.encode(corpus)
        .filter("doc_id = 10")
        .select(bpe.byte_decode(F.col("piece_ids"), merges2).alias("t"))
        .first()
        .t
    )
    assert got == "naïve café 猫が好き 🚀🚀 don't"
    # re-export of the imported store reproduces the artifacts
    art2 = str(tmp_path / "artifacts2")
    assert dst.export_gpt2(art2) == vocab
    import filecmp

    assert filecmp.cmp(f"{art}/merges.txt", f"{art2}/merges.txt", shallow=False)


def test_gpt2_import_honors_foreign_ids_hand_example(spark, tmp_path):
    """A hand-written GPT-2-style artifact (real-world shape: ids NOT
    in this engine's structural order, a special token, a partial
    vocab) must encode to the hand-computed ids — unmapped pieces get
    the UNK sentinel, never a silent drop."""
    import json

    from balboa_spark.operators import bpe

    art = tmp_path / "gpt2"
    art.mkdir()
    # merges in GPT-2 char space: th, the, Ġthe — greedily consistent
    # (rank order matters: (t,h) fires everywhere before Ġ can pair,
    # so the space merges with the COMPLETED 'the', exactly how a
    # real learned merge list composes)
    (art / "merges.txt").write_text(
        "#version: 0.2\nt h\nth e\nĠ the\n",
        encoding="utf-8",
    )
    (art / "vocab.json").write_text(
        json.dumps({"the": 5, "Ġthe": 9, "<|endoftext|>": 50256}),
        encoding="utf-8",
    )
    store = bpe.TokenizerStore(spark, str(tmp_path / "store"))
    merges = store.import_gpt2(str(art))
    assert merges == [("74", "68"), ("7468", "65"), ("20", "746865")]
    assert store._manifest()["special_tokens"] == {"<|endoftext|>": 50256}

    df = spark.createDataFrame(
        [(1, "the the"), (2, "the cat")], "doc_id long, text string"
    )
    got = {r.doc_id: r.piece_ids for r in store.encode(df).collect()}
    # "the the" -> pre-tokens [the][ the] -> pieces [the][Ġthe] -> [5, 9]
    assert got[1] == [5, 9]
    # " cat" pieces (Ġ,c,a,t under these merges: Ġ merges only with t)
    # are absent from the partial vocab -> UNK sentinels, not drops
    assert got[2][0] == 5 and all(i == bpe.UNK_PIECE_ID for i in got[2][1:])
    assert len(got[2]) == 1 + 4  # the + [Ġ, c, a, t]


def test_byte_bpe_fit_by_group_matches_per_slice_fit(spark):
    """The single-plan per-group fit reproduces byte_bpe_fit run on
    each language slice independently (merge-for-merge, including a
    group that exhausts its pairs early), and NULL-group rows are
    dropped."""
    from balboa_spark.operators import bpe

    slices = {
        "en": [
            "low low low low low",
            "lower lower widest widest widest",
        ],
        "de": [
            "der hund und der mond",
            "der mond und der hund laufen",
        ],
        # tiny slice: every pair count is 1 after a couple of merges,
        # so this group stops early under min_pair_count=2
        "fr": ["le chat", "le chien"],
    }
    rows = [
        (i, lang, t)
        for i, (lang, t) in enumerate(
            (lang, t) for lang, ts in slices.items() for t in ts
        )
    ] + [(99, None, "should be ignored entirely")]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])

    got = bpe.byte_bpe_fit_by_group(df, num_merges=8)
    assert set(got) <= set(slices)
    for lang, texts in slices.items():
        sdf = spark.createDataFrame([(t,) for t in texts], ["text"])
        want = bpe.byte_bpe_fit(sdf, num_merges=8)
        assert [(a, b) for a, b, _ in got.get(lang, [])] == want, lang


def test_hf_tokenizer_json_roundtrip_and_cross_format(spark, tmp_path):
    """fit -> export single-file HF tokenizer.json -> import into a
    fresh store -> identical encode ids; and the HF artifact carries
    the SAME vocab/merges semantics as the GPT-2 pair export of the
    same store (cross-format consistency)."""
    import json

    from balboa_spark.operators import bpe, tokenizer_io

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 3) for i in range(6)]
        + [(10, "naïve café 猫が好き 🚀🚀")],
        "doc_id long, text string",
    )
    src = bpe.TokenizerStore(spark, str(tmp_path / "src"))
    src.fit_byte(corpus, num_merges=8)
    tj = str(tmp_path / "tokenizer.json")
    vocab = src.export_hf(tj)
    assert vocab["<|endoftext|>"] == 256 + 8

    # cross-format: same vocab dict as the GPT-2 pair export
    assert src.export_gpt2(str(tmp_path / "gpt2")) == vocab
    doc = json.loads(open(tj, encoding="utf-8").read())
    assert doc["model"]["type"] == "BPE"
    assert doc["pre_tokenizer"]["type"] == "ByteLevel"
    assert len(doc["model"]["merges"]) == 8
    assert doc["added_tokens"][0]["content"] == "<|endoftext|>"

    dst = bpe.TokenizerStore(spark, str(tmp_path / "dst"))
    merges2 = dst.import_hf(tj)
    assert merges2 == src.merges()
    a = {r.doc_id: r.piece_ids for r in src.encode(corpus).collect()}
    b = {r.doc_id: r.piece_ids for r in dst.encode(corpus).collect()}
    assert a == b and len(a) == 7
    # dirty-target refusal
    import pytest

    with pytest.raises(FileExistsError):
        src.export_hf(tj)


def test_hf_import_pair_merges_foreign_ids_and_type_gate(spark, tmp_path):
    """A hand-built tokenizer.json with list-pair merges (the newer
    serialization), foreign ids, and an added special imports to the
    hand-computed encoding; a non-BPE model.type is refused."""
    import json

    import pytest

    from balboa_spark.operators import bpe, tokenizer_io

    tj = tmp_path / "tokenizer.json"
    tj.write_text(
        json.dumps(
            {
                "version": "1.0",
                "added_tokens": [
                    {"id": 50256, "content": "<|endoftext|>", "special": True}
                ],
                "pre_tokenizer": {"type": "ByteLevel"},
                "model": {
                    "type": "BPE",
                    "vocab": {"the": 5, "Ġthe": 9},
                    "merges": [["t", "h"], ["th", "e"], ["Ġ", "the"]],
                },
            }
        ),
        encoding="utf-8",
    )
    store = bpe.TokenizerStore(spark, str(tmp_path / "store"))
    merges = store.import_hf(str(tj))
    assert merges == [("74", "68"), ("7468", "65"), ("20", "746865")]
    assert store._manifest()["special_tokens"] == {"<|endoftext|>": 50256}
    df = spark.createDataFrame([(1, "the the")], "doc_id long, text string")
    got = store.encode(df).first().piece_ids
    assert got == [5, 9]

    bad = tmp_path / "bad.json"
    bad.write_text(
        json.dumps({"model": {"type": "WordPiece", "vocab": {}}}),
        encoding="utf-8",
    )
    with pytest.raises(ValueError, match="only BPE"):
        tokenizer_io.import_hf(str(bad))


def test_reexport_of_imported_store_honors_verbatim_ids(spark, tmp_path):
    """Re-exporting a store whose generation was IMPORTED must write
    the artifact's verbatim ids (what encode() emits under the
    vocab_source pin), not re-derived structural ids — a structural
    re-export would decode this store's token ids to the wrong text
    on any inference stack (r14 self-review find)."""
    import json

    import pytest

    from balboa_spark.operators import bpe

    art = tmp_path / "gpt2"
    art.mkdir()
    (art / "merges.txt").write_text(
        "#version: 0.2\nt h\nth e\nĠ the\n", encoding="utf-8"
    )
    orig = {"the": 5, "Ġthe": 9, "<|endoftext|>": 50256}
    (art / "vocab.json").write_text(json.dumps(orig), encoding="utf-8")
    store = bpe.TokenizerStore(spark, str(tmp_path / "store"))
    # an engine-fit generation first, so the import below is a LATER
    # generation and the no-provenance guard has an older one to hit
    store.fit_byte(
        spark.createDataFrame([(1, "the the the cat")], "doc_id long, text string"),
        num_merges=2,
    )
    fit_gen = store._manifest()["generation"]
    store.import_gpt2(str(art))

    out = store.export_gpt2(str(tmp_path / "re"))
    assert out == orig
    again = json.loads((tmp_path / "re" / "vocab.json").read_text("utf-8"))
    assert again == orig

    hf = store.export_hf(str(tmp_path / "tokenizer.json"))
    assert hf == orig
    doc = json.loads((tmp_path / "tokenizer.json").read_text("utf-8"))
    assert doc["model"]["vocab"] == {"the": 5, "Ġthe": 9}
    assert doc["added_tokens"][0]["id"] == 50256

    # the older engine-fit generation carries its own provenance
    # record (vocab_source=None, r15 ADVICE fix), so exporting it
    # writes structural ids — not the imported gen's verbatim ids
    old = store.export_gpt2(str(tmp_path / "old"), generation=fit_gen)
    assert old != orig and all(isinstance(v, int) for v in old.values())

    # pre-provenance stores (no per-gen record) keep the r14 guard:
    # a non-latest generation with unknown provenance refuses
    import os

    os.remove(
        os.path.join(store._gen_dir(fit_gen), "provenance.json")
    )
    with pytest.raises(ValueError, match="provenance"):
        store.export_gpt2(str(tmp_path / "old2"), generation=fit_gen)
    # encode(generation=) hits the same ambiguity and must refuse too
    # instead of silently re-deriving structural ids (r15 ADVICE low)
    with pytest.raises(ValueError, match="provenance"):
        store.encode(
            spark.createDataFrame([(1, "the")], "doc_id long, text string"),
            generation=fit_gen,
        )


def test_export_of_older_imported_generation_honors_verbatim_ids(
    spark, tmp_path
):
    """The MIRRORED hazard (r15 ADVICE): import at gen N, engine-fit
    at gen N+1 — export_gpt2(generation=N) must write gen N's
    verbatim imported ids (keyed off gen N's own provenance record),
    not silently re-derive structural ids because the LATEST manifest
    has no vocab_source."""
    import json

    from balboa_spark.operators import bpe

    art = tmp_path / "gpt2"
    art.mkdir()
    (art / "merges.txt").write_text(
        "#version: 0.2\nt h\nth e\nĠ the\n", encoding="utf-8"
    )
    orig = {"the": 5, "Ġthe": 9, "<|endoftext|>": 50256}
    (art / "vocab.json").write_text(json.dumps(orig), encoding="utf-8")
    store = bpe.TokenizerStore(spark, str(tmp_path / "store"))
    store.import_gpt2(str(art))
    imp_gen = store._manifest()["generation"]
    store.fit_byte(
        spark.createDataFrame(
            [(1, "the the the cat")], "doc_id long, text string"
        ),
        num_merges=2,
    )
    assert store._manifest()["generation"] != imp_gen
    assert "vocab_source" not in store._manifest()

    out = store.export_gpt2(str(tmp_path / "re"), generation=imp_gen)
    assert out == orig
    again = json.loads((tmp_path / "re" / "vocab.json").read_text("utf-8"))
    assert again == orig
    # and the latest (engine-fit) generation still exports structural
    latest = store.export_gpt2(str(tmp_path / "latest"))
    assert latest != orig


def test_unigram_hf_export_import_roundtrip_structural(spark, tmp_path):
    """r15: the unigram (SentencePiece-shaped) family gets the same
    public exit as byte-BPE — export an engine-fit store to an HF
    tokenizer.json with a "type": "Unigram" model, import it into a
    fresh store, and encode ids are IDENTICAL (the structural
    positional layout equals the engine's UNK@0 + piece-asc
    convention)."""
    import json

    import pytest

    from balboa_spark.operators import bpe, tokenizer_io, unigram

    corpus = spark.createDataFrame(
        [(0, "the quick brown fox the quick brown dog the the"),
         (1, "quick brown quick brown fox")],
        ["doc_id", "text"],
    )
    src = bpe.TokenizerStore(spark, str(tmp_path / "src"))
    pieces = src.fit_unigram(corpus, vocab_size=24, em_iters=1)

    tj = str(tmp_path / "tokenizer.json")
    vocab = src.export_hf(tj)
    doc = json.loads(open(tj, encoding="utf-8").read())
    assert doc["model"]["type"] == "Unigram"
    assert doc["model"]["unk_id"] == 0
    assert doc["model"]["vocab"][0] == ["<unk>", tokenizer_io.UNK_EXPORT_LOGP]
    assert doc["model"]["vocab"][1:] == [
        [p, lp] for p, lp in sorted(pieces)
    ]
    assert vocab[0] == ("<unk>", tokenizer_io.UNK_EXPORT_LOGP)
    # the exported UNK score IS the engine's Viterbi unseen-char score
    assert tokenizer_io.UNK_EXPORT_LOGP == unigram.UNK_LOGP

    dst = bpe.TokenizerStore(spark, str(tmp_path / "dst"))
    got_pieces = dst.import_hf(tj)
    assert sorted(got_pieces) == sorted(pieces)
    assert dst.kind() == "unigram"
    a = {r["doc_id"]: list(r["piece_ids"]) for r in src.encode(corpus).collect()}
    b = {r["doc_id"]: list(r["piece_ids"]) for r in dst.encode(corpus).collect()}
    assert a == b and a[0]

    # dirty-target refusal (the export_gpt2 convention)
    with pytest.raises(FileExistsError):
        src.export_hf(tj)


def test_unigram_hf_import_foreign_ids_unk_and_reexport(spark, tmp_path):
    """A hand-built Unigram tokenizer.json with NON-structural
    positional ids, a mid-table unk_id, and an added special: encode
    honors the positional ids VERBATIM (unseen chars -> the
    artifact's unk_id, not the engine's 0), and a re-export
    reproduces the artifact's positional table including the verbatim
    UNK row — even after a LATER engine fit (the per-generation
    provenance record, mirroring the byte arm's pin)."""
    import json

    import pytest

    from balboa_spark.operators import bpe, tokenizer_io, unigram

    tj = tmp_path / "foreign.json"
    # positions: 0=quick 1=<s> (special) 2=<unk> 3=br 4=own
    tj.write_text(
        json.dumps({
            "version": "1.0",
            "added_tokens": [{"id": 1, "content": "<s>", "special": True}],
            "model": {
                "type": "Unigram",
                "unk_id": 2,
                "vocab": [
                    ["quick", -1.5], ["<s>", 0.0], ["<unk>", -11.0],
                    ["br", -2.0], ["own", -2.5],
                ],
            },
        }),
        encoding="utf-8",
    )
    store = bpe.TokenizerStore(spark, str(tmp_path / "store"))
    pieces = store.import_hf(str(tj))
    assert sorted(pieces) == [("br", -2.0), ("own", -2.5), ("quick", -1.5)]
    assert store._manifest()["unk_id"] == 2
    assert store._manifest()["special_tokens"] == {"<s>": 1}

    docs = spark.createDataFrame(
        [(7, "quick brown")], "doc_id long, text string"
    )
    got = {r["doc_id"]: list(r["piece_ids"]) for r in store.encode(docs).collect()}
    # "quick" -> [quick]=0; "brown" -> Viterbi: br(−2.0)+own(−2.5)
    # beats any char fallback -> [br, own] = [3, 4]
    assert got[7] == [0, 3, 4]
    # unseen chars hit the artifact's unk_id (2), not the engine's 0
    oov = spark.createDataFrame([(8, "zq")], "doc_id long, text string")
    ids = list(store.encode(oov).collect()[0]["piece_ids"])
    assert 2 in ids

    imp_gen = store._manifest()["generation"]
    # a later ENGINE fit must not break the imported gen's re-export
    store.fit_unigram(
        spark.createDataFrame(
            [(0, "the quick brown fox the quick")], ["doc_id", "text"]
        ),
        vocab_size=16, em_iters=1,
    )
    out = str(tmp_path / "re.json")
    store.export_hf(out, generation=imp_gen)
    doc = json.loads(open(out, encoding="utf-8").read())
    assert doc["model"]["unk_id"] == 2
    assert doc["model"]["vocab"] == [
        ["quick", -1.5], ["<s>", 0.0], ["<unk>", -11.0],
        ["br", -2.0], ["own", -2.5],
    ]
    assert doc["added_tokens"][0]["content"] == "<s>"
    # and importing the re-export encodes identically to the original
    store2 = bpe.TokenizerStore(spark, str(tmp_path / "store2"))
    store2.import_hf(out)
    got2 = {
        r["doc_id"]: list(r["piece_ids"])
        for r in store2.encode(docs).collect()
    }
    assert got2 == got

    # non-Unigram gate on the raw importer
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"model": {"type": "BPE"}}), encoding="utf-8")
    with pytest.raises(ValueError, match="only Unigram"):
        tokenizer_io.import_hf_unigram(str(bad))


def test_unigram_imported_encode_matches_python_viterbi(spark, tmp_path):
    """Parity bar of the GPT-2 arm: encoding through an IMPORTED
    Unigram artifact equals the pure-Python Viterbi over the same
    piece table with the artifact's verbatim ids."""
    import json

    from balboa_spark.operators import bpe
    from balboa_spark.operators.unigram import _viterbi_py

    vocab = [
        ["th", -1.2], ["e", -1.8], ["the", -1.0], ["qu", -2.0],
        ["ick", -2.2], ["i", -3.0], ["ck", -2.4], ["<unk>", -9.0],
    ]
    tj = tmp_path / "art.json"
    tj.write_text(
        json.dumps({"model": {"type": "Unigram", "unk_id": 7, "vocab": vocab}}),
        encoding="utf-8",
    )
    store = bpe.TokenizerStore(spark, str(tmp_path / "s"))
    store.import_hf(str(tj))
    ids = {p: i for i, (p, _) in enumerate(vocab)}
    pieces = [(p, lp) for p, lp in vocab if p != "<unk>"]
    words = ["the", "quick", "thequick", "xyz"]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: list(r["piece_ids"])
        for r in store.encode(docs).collect()
    }
    mpl = max(len(p) for p, _ in pieces)
    for i, w in enumerate(words):
        parts, _score = _viterbi_py(w, dict(pieces), mpl)
        want = [ids.get(p, 7) for p in parts]
        assert got[i] == want, (w, got[i], want)


def test_unigram_hf_artifact_roundtrip_property(tmp_path):
    """Property: for ANY piece table (unicode pieces incl. metaspace/
    CJK/emoji, arbitrary finite log-probs, any unk position, any
    added-token overlay), import(export(x)) is a fixpoint of the
    positional table — ids, pieces, logps, unk, and specials all
    verbatim. Pure-Python (no Spark) — the artifact layer itself."""
    import json
    import os

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from balboa_spark.operators import tokenizer_io

    piece = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), min_codepoint=33
        ),
        min_size=1,
        max_size=6,
    )

    @settings(
        max_examples=40,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pieces=st.lists(piece, min_size=1, max_size=24, unique=True),
        logps=st.lists(
            st.floats(
                min_value=-50, max_value=0, allow_nan=False,
                allow_infinity=False,
            ),
            min_size=25,
            max_size=25,
        ),
        unk_pos=st.integers(min_value=0, max_value=24),
        n_specials=st.integers(min_value=0, max_value=2),
        data=st.data(),
    )
    def check(pieces, logps, unk_pos, n_specials, data):
        # build a positional vocab: pieces at their list positions,
        # an unk entry inserted, specials appended at the end
        vocab = [[p, logps[i]] for i, p in enumerate(pieces)]
        unk_pos = min(unk_pos, len(vocab))
        vocab.insert(unk_pos, ["<unk>", -99.0])
        specials = {}
        for j in range(n_specials):
            tok = f"<|sp{j}|>"
            specials[tok] = len(vocab)
            vocab.append([tok, 0.0])
        doc = {
            "added_tokens": [
                {"id": i, "content": t, "special": True}
                for t, i in specials.items()
            ],
            "model": {"type": "Unigram", "unk_id": unk_pos, "vocab": vocab},
        }
        src = tmp_path / f"a_{abs(hash(str(vocab))) % 10**9}.json"
        src.write_text(json.dumps(doc, ensure_ascii=False), encoding="utf-8")
        entries, unk, sp = tokenizer_io.import_hf_unigram(str(src))
        assert unk == ("<unk>", -99.0, unk_pos)
        assert sp == specials
        # re-export the verbatim positional table + unk + specials
        dense = {i: (p, lp) for p, lp, i in entries}
        dense[unk_pos] = ("<unk>", -99.0)
        for t, i in specials.items():
            dense[i] = (t, 0.0)
        out = str(src) + ".re.json"
        tokenizer_io.export_hf_unigram(
            [], out,
            vocab_entries=[(p, lp, i) for i, (p, lp) in sorted(dense.items())],
            unk_id=unk_pos, specials=specials,
        )
        redoc = json.loads(open(out, encoding="utf-8").read())
        assert redoc["model"]["vocab"] == vocab
        assert redoc["model"]["unk_id"] == unk_pos
        assert {
            a["content"]: a["id"] for a in redoc["added_tokens"]
        } == specials
        os.remove(out)
        os.remove(src)

    check()


def test_tokenizer_diff_reports_drift_and_gen_pinned_encode(spark, tmp_path):
    """r15: generation-pinned encode + the drift report. A re-fit on
    different data must report piece add/remove counts, renumbering,
    and the encode-drift fraction; a self-diff reports zero drift.
    encode(generation=N) reproduces the retained older fit exactly."""
    import pytest

    from balboa_spark.operators import bpe

    c1 = spark.createDataFrame(
        [(0, "the quick brown fox the quick brown dog the the"),
         (1, "quick brown quick brown fox")],
        ["doc_id", "text"],
    )
    c2 = spark.createDataFrame(
        [(0, "lazy river lazy river stone stone stone lazy"),
         (1, "river stone river lazy")],
        ["doc_id", "text"],
    )
    store = bpe.TokenizerStore(spark, str(tmp_path / "tok"))
    store.fit_byte(c1, num_merges=6)
    g0 = store._manifest()["generation"]
    enc_g0 = {r["doc_id"]: list(r["piece_ids"]) for r in store.encode(c1).collect()}
    store.fit_byte(c2, num_merges=6)

    # gen-pinned encode reproduces the OLD fit verbatim
    enc_pin = {
        r["doc_id"]: list(r["piece_ids"])
        for r in store.encode(c1, generation=g0).collect()
    }
    assert enc_pin == enc_g0
    # and differs from the latest fit on the same docs
    enc_new = {r["doc_id"]: list(r["piece_ids"]) for r in store.encode(c1).collect()}
    assert enc_new != enc_g0

    rep = bpe.tokenizer_diff(store, c1).collect()[0]
    assert (rep.gen_a, rep.gen_b) == (g0, g0 + 1)
    assert rep.pieces_added == 6 and rep.pieces_removed == 6  # 256 base shared
    # disjoint merge sets: the shared 256 base bytes keep their
    # structural ids, so nothing renumbers here (renumbering is
    # covered by the imported-artifact case below)
    assert rep.pieces_renumbered == 0
    assert rep.docs_compared == 2 and rep.docs_identical < 2
    assert rep.tokens_a > 0 and rep.tokens_b > 0

    # self-diff: zero drift
    same = bpe.tokenizer_diff(store, c1, gen_a=g0 + 1, gen_b=g0 + 1).collect()[0]
    assert same.pieces_added == same.pieces_removed == same.pieces_renumbered == 0
    assert same.docs_identical == 2

    # single-generation store refuses a default diff
    solo = bpe.TokenizerStore(spark, str(tmp_path / "solo"))
    solo.fit_byte(c1, num_merges=4)
    with pytest.raises(ValueError, match="need two"):
        bpe.tokenizer_diff(solo, c1)


def test_encode_corpus_words_seam_parity_and_loud_failure(spark):
    """r17 (advisor note): encode_corpus(words=word_histogram(df))
    must be byte-identical to words=None, and an UNDER-covering words
    relation must raise instead of silently dropping tokens from
    piece_ids. The tokens_col seam composes with both."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from balboa_spark.operators import bpe, text

    docs = spark.createDataFrame(
        [(0, "the quick brown fox the quick"),
         (1, "brown fox jumps over the lazy dog"),
         (2, ""), (3, "  fox  ")],
        ["doc_id", "text"],
    )
    merges = [("t", "h"), ("th", "e"), ("o", "x"), ("f", "ox")]
    vocab = bpe.vocab_table(docs, merges).localCheckpoint(eager=True)
    base = {
        r["doc_id"]: list(r["piece_ids"])
        for r in bpe.encode_corpus(docs, merges, vocab).collect()
    }
    hist = bpe.word_histogram(docs).localCheckpoint(eager=True)
    shared = {
        r["doc_id"]: list(r["piece_ids"])
        for r in bpe.encode_corpus(
            docs, merges, vocab, words=hist
        ).collect()
    }
    assert shared == base
    staged = docs.withColumn("_tk", text.tokens(F.col("text")))
    both = {
        r["doc_id"]: list(r["piece_ids"])
        for r in bpe.encode_corpus(
            staged, merges, vocab, words=hist, tokens_col="_tk"
        ).collect()
    }
    assert both == base
    # a histogram from a DIFFERENT corpus fails loudly, never silently
    partial = hist.filter(F.col("word") != "fox")
    with pytest.raises(SparkRuntimeException, match="does not cover token fox"):
        bpe.encode_corpus(docs, merges, vocab, words=partial).collect()


def test_tokenizer_diff_word_store_shared_stream_parity(spark, tmp_path):
    """r17: the word-kind store diff stages one token array + one
    histogram shared by both generation encodes; the report must be
    identical to the unshared per-generation encodes."""
    from balboa_spark.operators import bpe

    c1 = spark.createDataFrame(
        [(0, "the quick brown fox the quick brown dog the the"),
         (1, "quick brown quick brown fox")],
        ["doc_id", "text"],
    )
    c2 = spark.createDataFrame(
        [(0, "lazy river lazy river stone stone stone lazy"),
         (1, "river stone river lazy")],
        ["doc_id", "text"],
    )
    store = bpe.TokenizerStore(spark, str(tmp_path / "tokw"))
    store.fit(c1, num_merges=6)
    g0 = store._manifest()["generation"]
    store.fit(c2, num_merges=6)

    rep = bpe.tokenizer_diff(store, c1).collect()[0]
    # unshared replay: per-generation encodes without the seams
    va = {r["piece"]: int(r["piece_id"])
          for r in store.vocab(g0).select("piece", "piece_id").collect()}
    vb = {r["piece"]: int(r["piece_id"])
          for r in store.vocab(g0 + 1).select("piece", "piece_id").collect()}
    want = bpe.tokenizer_diff_frames(
        spark, va, vb,
        store.encode(c1, generation=g0),
        store.encode(c1, generation=g0 + 1),
        gen_a=g0, gen_b=g0 + 1,
    ).collect()[0]
    assert rep.asDict() == want.asDict()
    # non-word kinds refuse the seams instead of silently ignoring
    import pytest

    bstore = bpe.TokenizerStore(spark, str(tmp_path / "tokb"))
    bstore.fit_byte(c1, num_merges=4)
    with pytest.raises(ValueError, match="word-kind seams"):
        bstore.encode(c1, tokens_col="_tk")


def test_tokenizer_diff_counts_renumbered_imported_ids(spark, tmp_path):
    """Two imported artifacts sharing pieces at DIFFERENT ids: the
    diff counts the renumbered pieces (the silent-invalidation case —
    the vocab looks the same, every cached id is wrong)."""
    import json

    from balboa_spark.operators import bpe

    def art(dirname, vocab):
        d = tmp_path / dirname
        d.mkdir()
        (d / "merges.txt").write_text(
            "#version: 0.2\nt h\nth e\n", encoding="utf-8"
        )
        (d / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
        return str(d)

    store = bpe.TokenizerStore(spark, str(tmp_path / "store"))
    store.import_gpt2(art("a", {"th": 1, "the": 2}))
    g0 = store._manifest()["generation"]
    store.import_gpt2(art("b", {"th": 5, "the": 2, "x": 9}))

    docs = spark.createDataFrame([(1, "the th")], "doc_id long, text string")
    rep = bpe.tokenizer_diff(store, docs).collect()[0]
    assert (rep.gen_a, rep.gen_b) == (g0, g0 + 1)
    assert rep.pieces_added == 1       # "x"
    assert rep.pieces_removed == 0
    assert rep.pieces_renumbered == 1  # "th": 1 -> 5
    # same segmentation, different ids -> zero identical docs
    assert rep.docs_compared == 1 and rep.docs_identical == 0


def test_fim_transform_schedule_and_formats(spark):
    """FIM (r16): md5-deterministic apply/mode/cut schedule; PSM and
    SPM render exactly; pass-through docs keep their original text;
    segments reassemble to the tokenized document."""
    import hashlib

    from balboa_spark.operators import corpus

    rows = [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(40)]
    rows.append((100, "single"))      # n=1: never transforms
    rows.append((101, "  Mixed   WS\tdoc  here "))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in corpus.fim_transform(df, fim_rate=0.6).collect()}

    def h8(i, tag):
        return hashlib.md5(f"{i}:fim:{tag}".encode()).hexdigest()[:8]

    def h48(i, tag):
        return int(hashlib.md5(f"{i}:fim:{tag}".encode()).hexdigest()[:12], 16)

    thr = corpus.sample_threshold_hex(0.6)
    spm_thr = corpus.sample_threshold_hex(0.5)
    saw = {"psm": 0, "spm": 0, "none": 0}
    for doc_id, text in rows:
        tk = text.lower().split()
        n = len(tk)
        r = out[doc_id]
        applied = h8(doc_id, "apply") < thr and n >= 2
        assert r.fim_applied == applied, doc_id
        if not applied:
            assert r.mode == "none" and r.rendered == text
            assert (r.n_prefix, r.n_middle, r.n_suffix) == (0, 0, 0)
            saw["none"] += 1
            continue
        c1, c2 = h48(doc_id, "c1") % (n + 1), h48(doc_id, "c2") % (n + 1)
        lo, hi = min(c1, c2), max(c1, c2)
        p, m, s = " ".join(tk[:lo]), " ".join(tk[lo:hi]), " ".join(tk[hi:])
        assert (r.n_prefix, r.n_middle, r.n_suffix) == (lo, hi - lo, n - hi)
        if h8(doc_id, "mode") < spm_thr:
            want = (
                f"<fim_prefix><fim_suffix>{s}<fim_middle>{p}"
                + (" " if p and m else "") + m
            )
            assert r.mode == "spm" and r.rendered == want, doc_id
            saw["spm"] += 1
        else:
            want = f"<fim_prefix>{p}<fim_suffix>{s}<fim_middle>{m}"
            assert r.mode == "psm" and r.rendered == want, doc_id
            saw["psm"] += 1
    # the schedule exercised every arm on this fixture
    assert all(saw.values()), saw
    # determinism: a re-run (different partitioning) is identical
    again = {
        r.doc_id: r
        for r in corpus.fim_transform(df.repartition(7), fim_rate=0.6).collect()
    }
    assert {k: (v.mode, v.rendered) for k, v in out.items()} == {
        k: (v.mode, v.rendered) for k, v in again.items()
    }
