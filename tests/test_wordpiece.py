"""WordPiece interchange (r16): greedy longest-match segmentation
pinned against the published algorithm's canonical examples, verbatim
id import/export round-trip through TokenizerStore, and the Arrow
segment/encode paths."""

from __future__ import annotations

import json

import pytest

from balboa_spark.operators.wordpiece import (
    UNK_PIECE_ID,
    wordpiece_segment,
)

VOCAB = {
    "[UNK]", "un", "##aff", "##able", "aff", "##un",
    "hello", "run", "##ning", "##s",
}


def test_segment_published_examples():
    # the huggingface/tokenizers docs example
    assert wordpiece_segment("unaffable", VOCAB) == ["un", "##aff", "##able"]
    # whole-word match wins in one piece
    assert wordpiece_segment("hello", VOCAB) == ["hello"]
    # continuation chain
    assert wordpiece_segment("runnings", VOCAB) == ["run", "##ning", "##s"]
    # any unmatched position -> the WHOLE word is UNK
    assert wordpiece_segment("xyz", VOCAB) == ["[UNK]"]
    assert wordpiece_segment("runx", VOCAB) == ["[UNK]"]
    # over-long words short-circuit to UNK
    assert wordpiece_segment("a" * 101, VOCAB, max_chars=100) == ["[UNK]"]
    # longest-match-FIRST: 'aff' in vocab, but 'un'+'##aff' only after
    # the head takes the longest prefix — build a case where greed
    # matters: 'unaff' absent, so head match is 'un' (longest prefix)
    assert wordpiece_segment("unaff", VOCAB) == ["un", "##aff"]


def _artifact(tmp_path, vocab_ids, name="wp.json", **model_extra):
    doc = {
        "model": {
            "type": "WordPiece",
            "unk_token": "[UNK]",
            "continuing_subword_prefix": "##",
            "max_input_chars_per_word": 100,
            "vocab": {p: i for p, i in vocab_ids},
            **model_extra,
        },
        "added_tokens": [
            {"id": 900, "content": "[CLS]", "special": True},
            {"id": 901, "content": "[SEP]", "special": True},
        ],
    }
    p = tmp_path / name
    p.write_text(json.dumps(doc), encoding="utf-8")
    return str(p)


#: deliberately NON-structural ids (real BERT vocabs are not ranked
#: by anything this engine would derive)
WP_IDS = [
    ("[UNK]", 100), ("un", 7), ("##aff", 42), ("##able", 3),
    ("hello", 55), ("run", 9), ("##ning", 21), ("##s", 2),
]


def test_store_import_encode_export_roundtrip(spark, tmp_path):
    from balboa_spark.operators import bpe, tokenizer_io

    art = _artifact(tmp_path, WP_IDS)
    store = bpe.TokenizerStore(spark, str(tmp_path / "store"))
    got = store.import_hf(art)
    assert sorted(got) == sorted(WP_IDS)
    assert store.kind() == "wordpiece"

    docs = spark.createDataFrame(
        [(1, "unaffable hello"), (2, "runnings xyz"), (3, "Hello UNAFFABLE")],
        "doc_id long, text string",
    )
    enc = {r.doc_id: list(r.piece_ids) for r in store.encode(docs).collect()}
    # verbatim artifact ids, in token order; lowercased pre-tokens
    assert enc[1] == [7, 42, 3, 55]
    assert enc[2] == [9, 21, 2, 100]          # xyz -> [UNK] id 100
    assert enc[3] == [55, 7, 42, 3]

    # segment_col arm
    words = spark.createDataFrame([("unaffable",), ("zzz",)], "w string")
    seg = {
        r.w: list(r.p)
        for r in words.select(
            "w", store.segment_col(words.w).alias("p")
        ).collect()
    }
    assert seg["unaffable"] == ["un", "##aff", "##able"]
    assert seg["zzz"] == ["[UNK]"]

    # export reproduces the artifact verbatim (ids + params + specials)
    out = str(tmp_path / "re.json")
    exported = store.export_hf(out)
    assert exported == {p: i for p, i in WP_IDS}
    redoc = json.loads((tmp_path / "re.json").read_text("utf-8"))
    assert redoc["model"]["type"] == "WordPiece"
    assert redoc["model"]["vocab"] == {p: i for p, i in WP_IDS}
    assert redoc["model"]["continuing_subword_prefix"] == "##"
    assert {a["content"]: a["id"] for a in redoc["added_tokens"]} == {
        "[CLS]": 900, "[SEP]": 901,
    }
    # and importing the re-export commits an identical id table
    store2 = bpe.TokenizerStore(spark, str(tmp_path / "store2"))
    assert sorted(store2.import_hf(out)) == sorted(WP_IDS)

    # kinds never mix within one store path
    with pytest.raises(ValueError, match="kind"):
        store.fit_byte(docs, num_merges=1)

    # non-WordPiece artifacts refuse at the dedicated importer
    with pytest.raises(ValueError, match="only WordPiece"):
        tokenizer_io.import_hf_wordpiece(_bad_type_artifact(tmp_path))


def _bad_type_artifact(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(
        json.dumps({"model": {"type": "BPE", "vocab": {}}}),
        encoding="utf-8",
    )
    return str(p)


def test_unk_piece_id_sentinel(spark, tmp_path):
    """A malformed artifact whose unk_token is missing from the vocab
    still encodes: unmatched words map to the UNK_PIECE_ID sentinel
    instead of silently shortening the sequence."""
    from balboa_spark.operators import bpe

    ids = [(p, i) for p, i in WP_IDS if p != "[UNK]"]
    art = _artifact(tmp_path, ids)
    store = bpe.TokenizerStore(spark, str(tmp_path / "s"))
    store.import_hf(art)
    docs = spark.createDataFrame([(1, "xyz hello")], "doc_id long, text string")
    enc = {r.doc_id: list(r.piece_ids) for r in store.encode(docs).collect()}
    assert enc[1] == [UNK_PIECE_ID, 55]


def _ref_wp_fit(word_counts, num_merges, min_pair_count=2):
    """Clear-room likelihood-rule reference (exact Fractions, greedy
    left-to-right merge application)."""
    from fractions import Fraction

    vocab = [
        ([w[0]] + ["##" + c for c in w[1:]], c)
        for w, c in word_counts.items()
    ]
    merges = []
    for _ in range(num_merges):
        pairs, syms = {}, {}
        for ps, c in vocab:
            for s in ps:
                syms[s] = syms.get(s, 0) + c
            for a, b in zip(ps, ps[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = max(
            pairs.items(),
            key=lambda kv: (
                Fraction(kv[1], syms[kv[0][0]] * syms[kv[0][1]]),
                # score DESC then (a, b) ASC -> invert the tiebreak
                tuple(-ord(ch) for ch in kv[0][0] + "\x00" + kv[0][1]),
            ),
        )
        (a, b), n = best
        if n < min_pair_count:
            break
        merges.append((a, b))
        merged = a + b[2:]
        nxt = []
        for ps, c in vocab:
            out = [ps[0]]
            for x in ps[1:]:
                if out[-1] == a and x == b:
                    out[-1] = merged
                else:
                    out.append(x)
            nxt.append((out, c))
        vocab = nxt
    return merges, vocab


def test_wordpiece_fit_matches_reference_and_roundtrips(spark, tmp_path):
    """The likelihood-scored fit matches the clear-room reference
    merge-for-merge (the byte_bpe_fit parity bar) on a fixture where
    the likelihood rule DIVERGES from BPE's raw-count argmax, and the
    fitted store segments/encodes/exports end to end."""
    from balboa_spark.operators import bpe
    from balboa_spark.operators.wordpiece import wordpiece_fit

    # (t, ##h) has pair count 8 but t and ##h occur 8x each ->
    # score 8/64 = 0.125; (q, ##z) has pair count only 2 but q and z
    # occur NOWHERE else -> score 2/4 = 0.5: the likelihood rule
    # picks the rare-but-exclusive pair FIRST, where raw-count BPE
    # would pick (t, ##h)
    rows = (
        [("the tht hat",)] * 4          # t/h heavy, th pair frequent
        + [("qz",)] * 2                 # q,z exclusive to the pair
    )
    docs = spark.createDataFrame(
        [(i, t) for i, (t,) in enumerate(rows)], "doc_id long, text string"
    )
    word_counts = {"the": 4, "tht": 4, "hat": 4, "qz": 2}
    want_merges, _ = _ref_wp_fit(word_counts, num_merges=4)
    got_merges, vocab_ids = wordpiece_fit(docs, num_merges=4)
    assert got_merges == want_merges and got_merges
    assert got_merges[0] == ("q", "##z")  # the likelihood divergence
    pieces = {p for p, _ in vocab_ids}
    assert "qz" in pieces

    # fitted store end to end: segment + encode + export/import
    store = bpe.TokenizerStore(spark, str(tmp_path / "wpfit"))
    store.fit_wordpiece(docs, num_merges=4)
    assert store.kind() == "wordpiece"
    enc = {r.doc_id: list(r.piece_ids) for r in store.encode(docs).collect()}
    assert enc and all(len(v) > 0 for v in enc.values())
    out = str(tmp_path / "wp_export.json")
    exported = store.export_hf(out)
    store2 = bpe.TokenizerStore(spark, str(tmp_path / "wpfit2"))
    assert dict(store2.import_hf(out)) == exported
    enc2 = {
        r.doc_id: list(r.piece_ids) for r in store2.encode(docs).collect()
    }
    assert enc2 == enc
