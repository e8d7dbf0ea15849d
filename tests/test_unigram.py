"""Unigram-LM tokenizer (Kudo 2018): EM expected counts vs brute
enumeration, Viterbi DP vs brute max over all segmentations, UNK
totality, closure, and the cross-engine oracle parity the driver
grades."""

import duckdb
import pytest
from pyspark.sql import functions as F

from balboa_spark.operators import unigram


def _all_segmentations(word: str, max_len: int):
    """Every way to split word into pieces of length <= max_len."""
    n = len(word)
    if n == 0:
        yield []
        return
    for first in range(1, min(max_len, n) + 1):
        head = word[:first]
        for rest in _all_segmentations(word[first:], max_len):
            yield [head] + rest


def _brute_best(word: str, vocab: dict[str, float], max_len: int):
    """Max log-prob over all segmentations; unseen single chars score
    UNK_LOGP (the totality contract); None if no segmentation."""
    def lp(p):
        if p in vocab:
            return vocab[p]
        return unigram.UNK_LOGP if len(p) == 1 else None

    best = None
    for seg in _all_segmentations(word, max_len):
        s = 0.0
        ok = True
        for p in seg:
            v = lp(p)
            if v is None:
                ok = False
                break
            s += v
        if ok and (best is None or s > best):
            best = s
    return best


VOCAB = [
    ("a", -2.0), ("b", -2.5), ("c", -3.0), ("ab", -1.8),
    ("ba", -2.2), ("abc", -2.9), ("bc", -2.4),
]
VMAP = dict(VOCAB)
L = 3


def test_viterbi_matches_brute_force_scores(spark):
    words = ["a", "ab", "abc", "abab", "abcba", "cabab", "bcbcab", "aaabbb"]
    df = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
    out = {
        r["word"]: (r["pieces"], r["logp"])
        for r in unigram.unigram_segment_words(df, VOCAB, max_piece_len=L).collect()
    }
    for w in words:
        pieces, logp = out[w]
        assert round(_brute_best(w, VMAP, L), unigram.LOGP_DP) == logp, w
        parts = pieces.split(" ")
        assert "".join(parts) == w  # pieces reassemble the word
        # and the emitted pieces actually score the claimed optimum
        assert round(sum(VMAP.get(p, unigram.UNK_LOGP) for p in parts),
                     unigram.LOGP_DP) == logp


def test_viterbi_unknown_char_totality(spark):
    # 'x'/'z' absent from the vocab: single-char UNK fallback keeps the
    # DP total; multi-char unknowns are never candidate pieces
    df = spark.createDataFrame([(0, "axb zz")], ["doc_id", "text"])
    out = {
        r["word"]: (r["pieces"], r["logp"])
        for r in unigram.unigram_segment_words(df, VOCAB, max_piece_len=L).collect()
    }
    assert out["axb"][0] == "a x b"
    assert out["axb"][1] == round(-2.0 + unigram.UNK_LOGP + -2.5, 6)
    assert out["zz"][0] == "z z" and out["zz"][1] == 2 * unigram.UNK_LOGP


def test_viterbi_oracle_parity_random_words(spark):
    """The DuckDB twin (the driver oracle's expressions) must match
    the engine word-for-word — pieces AND scores — on random strings
    over the vocab alphabet plus an unknown char."""
    import random

    rng = random.Random(13)
    words = sorted(
        {"".join(rng.choice("abcx") for _ in range(rng.randint(1, 9)))
         for _ in range(40)}
    )
    df = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
    got = {
        r["word"]: (r["pieces"], r["logp"])
        for r in unigram.unigram_segment_words(df, VOCAB, max_piece_len=L).collect()
    }
    fwd, trail, pieces, logp = unigram.viterbi_sql("word", VOCAB, L)
    vals = ", ".join(f"('{w}')" for w in words)
    q = f"""
WITH words(word) AS (VALUES {vals}),
staged AS MATERIALIZED (SELECT word, {fwd} AS fwd FROM words),
staged2 AS MATERIALIZED (SELECT word, fwd, {trail} AS tr FROM staged),
staged3 AS MATERIALIZED (SELECT word, fwd, {pieces} AS pl FROM staged2)
SELECT word, array_to_string(pl, ' '), {logp} FROM staged3
"""
    want = {r[0]: (r[1], r[2]) for r in duckdb.sql(q).fetchall()}
    assert got == want


def test_fb_expected_matches_enumeration():
    """The EM E-step's forward-backward expected counts must equal the
    brute-force expectation over the enumerated segmentation
    distribution."""
    probs = {"a": 0.3, "b": 0.2, "ab": 0.25, "ba": 0.15, "abc": 0.1}
    for word in ("ab", "aba", "abab", "abcab"):
        segs = []
        for seg in _all_segmentations(word, 3):
            p = 1.0
            ok = True
            for piece in seg:
                if piece not in probs:
                    ok = False
                    break
                p *= probs[piece]
            if ok:
                segs.append((seg, p))
        z = sum(p for _, p in segs)
        want = {}
        for seg, p in segs:
            for piece in seg:
                want[piece] = want.get(piece, 0.0) + p / z
        got = dict(unigram._fb_expected(word, probs, 3))
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-12), (word, k)


def test_unigram_fit_closure_and_segmentability(spark):
    """Every learned vocab keeps the corpus segmentable: fit on a
    small corpus, then every corpus word must segment with a finite
    score and pieces that reassemble the word (single-char closure +
    UNK totality)."""
    docs = spark.createDataFrame(
        [(0, "low low low lower lowest"), (1, "the low tide the lowest ebb")],
        ["doc_id", "text"],
    )
    v = unigram.unigram_fit(docs, vocab_size=20, em_iters=2)
    assert all(lp < 0 for _, lp in v)
    out = unigram.unigram_segment_words(docs, v).collect()
    assert out
    for r in out:
        assert "".join(r["pieces"].split(" ")) == r["word"]
        assert r["logp"] is not None and r["logp"] < 0
    # EM learned real structure: the shared stem is one piece
    seg = {r["word"]: r["pieces"] for r in out}
    assert seg["low"] == "low" and seg["lowest"].startswith("low ")


def test_viterbi_plan_no_udf_no_shuffle(spark):
    """Segmentation under a fixed vocab is a pure Column program:
    no Python evaluation nodes, and no Exchange beyond the word
    histogram's own groupBy."""
    df = spark.createDataFrame([(0, "ab abc ba")], ["doc_id", "text"])
    out = unigram.unigram_segment_words(df, VOCAB, max_piece_len=L)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan


def test_unigram_encode_corpus_ids_and_unk(spark):
    """Encode: ids follow piece-asc order from 1, unseen single chars
    map to UNK_PIECE_ID, token order is preserved positionally, and
    decoding ids back through the vocab reassembles the alnum words."""
    docs = spark.createDataFrame(
        [(1, "ab abc"), (2, "abx")], ["doc_id", "text"]
    )
    enc = {
        r["doc_id"]: list(r["piece_ids"])
        for r in unigram.unigram_encode_corpus(docs, VOCAB, max_piece_len=L).collect()
    }
    order = [p for p, _ in sorted(VOCAB)]
    ids = {p: i + 1 for i, p in enumerate(order)}
    # doc 1: 'ab' -> [ab]; 'abc' -> best of abc / ab+c / a+bc ...
    best_abc = max(
        [(["abc"],), (["ab", "c"],), (["a", "bc"],), (["a", "b", "c"],)],
        key=lambda s: sum(VMAP[p] for p in s[0]),
    )[0]
    assert enc[1] == [ids["ab"]] + [ids[p] for p in best_abc]
    # doc 2: 'abx' -> ab + UNK(x)
    assert enc[2] == [ids["ab"], unigram.UNK_PIECE_ID]
    rev = {v: k for k, v in ids.items()}
    assert "".join(rev.get(i, "x") for i in enc[2]) == "abx"


def test_viterbi_arrow_parity_with_column_fold(spark):
    """The Arrow Viterbi (the >512-piece production path) must
    reproduce the Column fold exactly — pieces AND rounded scores —
    including the tie rule and UNK fallback; and a padded 600-piece
    vocab must force the Arrow path and still agree with the fold run
    on the real pieces (the padding is unreachable junk)."""
    import random

    rng = random.Random(7)
    words = sorted(
        {"".join(rng.choice("abcx") for _ in range(rng.randint(1, 9)))
         for _ in range(30)}
    )
    df = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])

    fold = {
        r["word"]: (r["pieces"], r["logp"])
        for r in unigram.unigram_segment_words(df, VOCAB, max_piece_len=L).collect()
    }
    arrow = {
        r["word"]: (" ".join(r["sg"]["pieces"]), r["sg"]["logp"])
        for r in df.select(
            F.explode(F.split("text", " ")).alias("word")
        ).select(
            "word",
            unigram.viterbi_segment_arrow(F.col("word"), VOCAB, L).alias("sg"),
        ).collect()
    }
    assert fold == arrow

    # padded vocab: pieces over an alphabet the words never use, so
    # results must equal the small-vocab fold while the size trips the
    # Arrow switch inside unigram_segment_words
    padded = VOCAB + [
        (f"q{i}z", -30.0) for i in range(unigram.ARROW_VOCAB_THRESHOLD)
    ]
    via_arrow = {
        r["word"]: (r["pieces"], r["logp"])
        for r in unigram.unigram_segment_words(
            df, padded, max_piece_len=L
        ).collect()
    }
    assert via_arrow == fold
    # plan really is the Arrow seam, not a giant map literal
    plan = unigram.unigram_segment_words(df, padded, max_piece_len=L)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "EvalPython" in plan


def test_unigram_fit_by_group_matches_per_slice_fit(spark):
    """The grouped EM fit reproduces unigram_fit run on each language
    slice independently: identical piece sets, log-probs equal to the
    pinned rounding (summation order may differ at the last ulp), and
    NULL-group rows dropped."""
    import pytest

    from balboa_spark.operators import unigram

    slices = {
        "en": [
            "the cat sat on the mat the cat",
            "the hat and the bat and the cat",
        ],
        "de": [
            "der hund und der mond und der hund",
            "der mund und der grund",
        ],
        "fr": ["le chat et le chien", "le chien et le chat"],
    }
    rows = [
        (i, lang, t)
        for i, (lang, t) in enumerate(
            (lang, t) for lang, ts in slices.items() for t in ts
        )
    ] + [(99, None, "ignored entirely")]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])

    kw = dict(vocab_size=20, seed_m=16, em_iters=2, max_piece_len=3)
    got = unigram.unigram_fit_by_group(df, **kw)
    assert set(got) == set(slices)
    for lang, texts in slices.items():
        sdf = spark.createDataFrame([(t,) for t in texts], ["text"])
        want = unigram.unigram_fit(sdf, **kw)
        assert [p for p, _ in got[lang]] == [p for p, _ in want], lang
        for (_, lg), (_, lw) in zip(got[lang], want):
            assert lg == pytest.approx(lw, abs=2e-6), lang
