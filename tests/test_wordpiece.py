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
