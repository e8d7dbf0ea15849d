"""Tokenizer-artifact interchange: the public GPT-2 ``vocab.json`` +
``merges.txt`` format (Radford et al. 2019, §2.2; the format every
byte-BPE inference stack — HF tokenizers, tiktoken importers,
llama.cpp converters — can load).

The engine's byte-BPE artifact is engine-private (hex-pair merges in
``merges.json`` + a structural id parquet — see
:class:`balboa_spark.operators.bpe.TokenizerStore`). A real user's
first post-training step is loading the tokenizer into an inference
stack, so the missing last mile is a faithful mapping between the two
representations:

- internal pieces are UPPERCASE HEX strings of the piece's bytes
  (``"20"`` = space, ``"746865"`` = ``the``) — chosen because
  ``hex(encode(text))`` is replayable on both Spark and DuckDB;
- the public format writes pieces in GPT-2's ``bytes_to_unicode``
  remap (byte 0x20 = ``Ġ``, 0x0A = ``Ċ``, ASCII printables as
  themselves), one merge per ``merges.txt`` line in learned order,
  and ``vocab.json`` mapping remapped piece -> id.

Export writes this engine's STRUCTURAL ids (byte value 0-255, then
one id per merge in learned order, then specials — the
:func:`bpe.byte_vocab` contract). Canonical OpenAI artifacts order
the 256 base tokens differently (printables first), so import always
HONORS ``vocab.json`` ids verbatim rather than recomputing them —
a real GPT-2 artifact round-trips with its real ids. Pre-tokenizer
caveat (documented, not hidden): this engine's byte pre-tokenizer is
the RE2-compatible GPT-2 regex WITHOUT the contraction alternates
and trailing-space lookahead (`bpe.BYTE_PRETOK_RE`), so encodings of
an imported real-GPT-2 tokenizer match GPT-2 exactly on text where
those alternates don't fire (no contractions, single spaces).
"""

from __future__ import annotations

import json
import os

__all__ = [
    "bytes_to_unicode",
    "unicode_to_bytes",
    "hex_to_gpt2",
    "gpt2_to_hex",
    "export_gpt2",
    "import_gpt2",
    "export_hf",
    "import_hf",
    "export_hf_unigram",
    "import_hf_unigram",
]


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's published byte -> printable-unicode remap: the 188
    'nice' printable bytes map to themselves; the remaining 68
    (controls, space, DEL, soft hyphen...) map to U+0100.. in byte
    order. Bijective over 0..255 by construction (Radford et al.
    2019 reference implementation's algorithm, re-derived)."""
    nice = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    out = {b: chr(b) for b in nice}
    shift = 0
    for b in range(256):
        if b not in out:
            out[b] = chr(256 + shift)
            shift += 1
    return out


def unicode_to_bytes() -> dict[str, int]:
    return {c: b for b, c in bytes_to_unicode().items()}


def hex_to_gpt2(piece_hex: str, _b2u: dict[int, str] | None = None) -> str:
    """Internal hex piece -> GPT-2 remapped string (``"20746865"`` ->
    ``"Ġthe"``)."""
    b2u = _b2u or bytes_to_unicode()
    return "".join(
        b2u[int(piece_hex[i : i + 2], 16)] for i in range(0, len(piece_hex), 2)
    )


def gpt2_to_hex(token: str, _u2b: dict[str, int] | None = None) -> str | None:
    """GPT-2 remapped string -> internal hex piece, or None when the
    token contains a char outside the 256-symbol remap alphabet (a
    SPECIAL token like ``<|endoftext|>``... is composed of remap
    chars, actually — specials are detected by the caller via vocab
    position, this returns None only for genuinely un-remappable
    chars, e.g. CJK in added-token entries)."""
    u2b = _u2b or unicode_to_bytes()
    try:
        return "".join(f"{u2b[c]:02X}" for c in token)
    except KeyError:
        return None


def _export_vocab(
    merges: list[tuple[str, str]],
    special_tokens: tuple[str, ...],
    vocab_ids: list[tuple[str, int]] | None,
    specials: dict[str, int] | None,
    b2u: dict[int, str],
) -> tuple[dict[str, int], dict[str, int]]:
    """(full vocab dict, specials dict) for an export. Default:
    structural ids (byte_vocab) + ``special_tokens`` appended. When
    ``vocab_ids``/``specials`` are given (a store whose generation was
    IMPORTED from a public artifact), they are honored VERBATIM —
    exporting an imported store with re-derived structural ids would
    contradict what encode() emits under the vocab_source pin, and an
    inference stack loading the re-export would silently decode the
    store's token ids to the wrong text."""
    from balboa_spark.operators.bpe import byte_vocab

    if vocab_ids is not None:
        vocab = {hex_to_gpt2(p, b2u): i for p, i in vocab_ids}
        sp = dict(specials or {})
        overlap = set(vocab) & set(sp)
        if overlap:
            raise ValueError(f"specials collide with pieces: {sorted(overlap)}")
        vocab.update(sp)
        return vocab, sp
    vocab = {hex_to_gpt2(p, b2u): i for p, i in byte_vocab(merges)}
    base = len(vocab)
    sp = {}
    for j, tok in enumerate(special_tokens):
        if tok in vocab:
            raise ValueError(f"special token {tok!r} collides with a piece")
        vocab[tok] = sp[tok] = base + j
    return vocab, sp


def export_gpt2(
    merges: list[tuple[str, str]],
    out_dir: str,
    special_tokens: tuple[str, ...] = ("<|endoftext|>",),
    vocab_ids: list[tuple[str, int]] | None = None,
    specials: dict[str, int] | None = None,
) -> dict[str, int]:
    """Write ``vocab.json`` + ``merges.txt`` for a hex-pair merge
    list. Ids are the engine's structural order (byte value 0-255,
    merges in learned order, then specials) — unless
    ``vocab_ids``/``specials`` pin explicit ids (imported stores; see
    :func:`_export_vocab`). Returns the vocab dict (remapped token ->
    id). Fails on a dir already holding either artifact (the
    write_wet_shards dirty-target convention)."""
    os.makedirs(out_dir, exist_ok=True)
    for name in ("vocab.json", "merges.txt"):
        if os.path.exists(os.path.join(out_dir, name)):
            raise FileExistsError(
                f"export_gpt2: {out_dir} already contains {name}; "
                "export into an empty directory"
            )
    b2u = bytes_to_unicode()
    vocab, _ = _export_vocab(merges, special_tokens, vocab_ids, specials, b2u)
    tmp = os.path.join(out_dir, "merges.txt.inprogress")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\n")
        for a, b in merges:
            fh.write(f"{hex_to_gpt2(a, b2u)} {hex_to_gpt2(b, b2u)}\n")
    os.replace(tmp, os.path.join(out_dir, "merges.txt"))
    tmp = os.path.join(out_dir, "vocab.json.inprogress")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(vocab, fh, ensure_ascii=False)
    os.replace(tmp, os.path.join(out_dir, "vocab.json"))
    return vocab


def import_gpt2(
    in_dir: str,
) -> tuple[list[tuple[str, str]], list[tuple[str, int]], dict[str, int]]:
    """Read ``vocab.json`` + ``merges.txt`` ->
    ``(merges_hex, vocab_hex_ids, specials)``.

    - ``merges_hex``: the merge list in file order, hex-pair space —
      drives :func:`bpe.byte_segment_any` directly;
    - ``vocab_hex_ids``: [(hex piece, id)] with ids taken VERBATIM
      from ``vocab.json`` (real artifacts don't use structural order);
    - ``specials``: vocab entries that are not byte-composed pieces —
      base-alphabet singletons and merge products are pieces; any
      other token (``<|endoftext|>``, added tokens) is special.
    """
    u2b = unicode_to_bytes()
    with open(os.path.join(in_dir, "merges.txt"), encoding="utf-8") as fh:
        lines = [ln.rstrip("\n") for ln in fh]
    merges: list[tuple[str, str]] = []
    for ln in lines:
        if not ln or ln.startswith("#"):
            continue
        a, b = ln.split(" ")
        ah, bh = gpt2_to_hex(a, u2b), gpt2_to_hex(b, u2b)
        if ah is None or bh is None:
            raise ValueError(f"merges.txt line not byte-composed: {ln!r}")
        merges.append((ah, bh))

    with open(os.path.join(in_dir, "vocab.json"), encoding="utf-8") as fh:
        raw = json.load(fh)
    # a PIECE is anything byte_segment could produce: a base byte or a
    # merge product; everything else in vocab.json is a special token
    producible = {f"{i:02X}" for i in range(256)} | {a + b for a, b in merges}
    vocab_hex: list[tuple[str, int]] = []
    specials: dict[str, int] = {}
    for tok, idx in raw.items():
        h = gpt2_to_hex(tok, u2b)
        if h is not None and h in producible:
            vocab_hex.append((h, int(idx)))
        else:
            specials[tok] = int(idx)
    return merges, vocab_hex, specials


def export_hf(
    merges: list[tuple[str, str]],
    out_path: str,
    special_tokens: tuple[str, ...] = ("<|endoftext|>",),
    vocab_ids: list[tuple[str, int]] | None = None,
    specials: dict[str, int] | None = None,
) -> dict[str, int]:
    """Write a single-file HF ``tokenizer.json`` (the huggingface/
    tokenizers serialization format — public JSON schema readable from
    any released tokenizer artifact) for a hex-pair merge list: a
    ByteLevel pre-tokenizer/decoder around a BPE model whose vocab
    carries this engine's structural ids (or the pinned verbatim ids
    of an imported store — see :func:`_export_vocab`) and whose merges
    are ``"a b"`` strings in learned order; specials land in
    ``added_tokens``. Same byte->printable remap and dirty-target
    refusal as :func:`export_gpt2`. Returns the model vocab (remapped
    token -> id, specials included)."""
    if os.path.exists(out_path):
        raise FileExistsError(
            f"export_hf: {out_path} exists; export to a fresh path"
        )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    b2u = bytes_to_unicode()
    vocab, sp_map = _export_vocab(
        merges, special_tokens, vocab_ids, specials, b2u
    )
    added = [
        {
            "id": i,
            "content": tok,
            "single_word": False,
            "lstrip": False,
            "rstrip": False,
            "normalized": False,
            "special": True,
        }
        for tok, i in sorted(sp_map.items(), key=lambda kv: kv[1])
    ]
    added_contents = {a["content"] for a in added}
    doc = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": added,
        "normalizer": None,
        "pre_tokenizer": {
            "type": "ByteLevel",
            "add_prefix_space": False,
            "trim_offsets": True,
            "use_regex": True,
        },
        "post_processor": None,
        "decoder": {
            "type": "ByteLevel",
            "add_prefix_space": False,
            "trim_offsets": True,
            "use_regex": True,
        },
        "model": {
            "type": "BPE",
            "dropout": None,
            "unk_token": None,
            "continuing_subword_prefix": None,
            "end_of_word_suffix": None,
            "fuse_unk": False,
            "byte_fallback": False,
            "vocab": {
                t: i for t, i in vocab.items() if t not in added_contents
            },
            "merges": [
                f"{hex_to_gpt2(a, b2u)} {hex_to_gpt2(b, b2u)}"
                for a, b in merges
            ],
        },
    }
    tmp = out_path + ".inprogress"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(doc, fh, ensure_ascii=False)
    os.replace(tmp, out_path)
    return vocab


def import_hf(
    in_path: str,
) -> tuple[list[tuple[str, str]], list[tuple[str, int]], dict[str, int]]:
    """Read an HF ``tokenizer.json`` ->
    ``(merges_hex, vocab_hex_ids, specials)`` — the
    :func:`import_gpt2` contract from the single-file format.

    Only ``model.type == "BPE"`` with a ByteLevel pre-tokenizer maps
    onto this engine's byte arm; anything else raises (an imported
    WordPiece/Unigram artifact silently treated as byte-BPE would
    mis-encode every document). Merges accept both serializations the
    format has used: ``"a b"`` strings and ``["a", "b"]`` pairs.
    Ids from ``model.vocab`` are honored VERBATIM; ``added_tokens``
    and non-byte-composed vocab entries land in specials."""
    with open(in_path, encoding="utf-8") as fh:
        doc = json.load(fh)
    model = doc.get("model") or {}
    if model.get("type") != "BPE":
        raise ValueError(
            f"import_hf: model.type={model.get('type')!r}; only BPE "
            "maps onto the byte arm"
        )
    pre = (doc.get("pre_tokenizer") or {}).get("type")
    if pre not in ("ByteLevel", None):
        raise ValueError(
            f"import_hf: pre_tokenizer {pre!r} is not ByteLevel; the "
            "byte arm cannot reproduce its splits"
        )
    u2b = unicode_to_bytes()
    merges: list[tuple[str, str]] = []
    for m in model.get("merges", []):
        a, b = m.split(" ") if isinstance(m, str) else (m[0], m[1])
        ah, bh = gpt2_to_hex(a, u2b), gpt2_to_hex(b, u2b)
        if ah is None or bh is None:
            raise ValueError(f"tokenizer.json merge not byte-composed: {m!r}")
        merges.append((ah, bh))
    producible = {f"{i:02X}" for i in range(256)} | {a + b for a, b in merges}
    vocab_hex: list[tuple[str, int]] = []
    specials: dict[str, int] = {}
    for tok, idx in (model.get("vocab") or {}).items():
        h = gpt2_to_hex(tok, u2b)
        if h is not None and h in producible:
            vocab_hex.append((h, int(idx)))
        else:
            specials[tok] = int(idx)
    for a in doc.get("added_tokens") or []:
        specials.setdefault(a["content"], int(a["id"]))
    return merges, vocab_hex, specials


#: logp assigned to the UNK entry in exported Unigram artifacts —
#: MUST equal balboa_spark.operators.unigram.UNK_LOGP (the score the
#: engine's Viterbi gives an unseen single character), so an external
#: stack running Viterbi over the exported artifact reproduces the
#: engine's segmentation; pinned by a test rather than an import (this
#: module stays pyspark-free).
UNK_EXPORT_LOGP = -20.0


def export_hf_unigram(
    pieces: list[tuple[str, float]],
    out_path: str,
    unk_piece: str = "<unk>",
    vocab_entries: list[tuple[str, float, int]] | None = None,
    unk_id: int = 0,
    specials: dict[str, int] | None = None,
) -> list[tuple[str, float]]:
    """Write a single-file HF ``tokenizer.json`` with a
    ``"type": "Unigram"`` model (the huggingface/tokenizers
    serialization of a SentencePiece-style unigram LM — public JSON
    schema: ``model.vocab`` is a positional ``[[piece, logp], ...]``
    list whose INDEX is the token id, plus ``model.unk_id``).

    Structural layout (``vocab_entries=None``): index 0 is the UNK
    entry (``unk_piece`` at :data:`UNK_EXPORT_LOGP` — the engine's
    Viterbi score for an unseen character) and the engine pieces land
    at indices 1..n in piece-ascending order — EXACTLY the
    ``unigram.UNK_PIECE_ID`` / piece-asc id convention, so the
    positional ids equal what ``unigram_encode_corpus`` emits.

    Pinned layout (``vocab_entries=[(piece, logp, id), ...]``): the
    verbatim positional table of an IMPORTED artifact is re-emitted
    at its recorded ids (the export_gpt2 id-pin convention); gaps are
    impossible because positions are ids.

    Pre-tokenizer caveat (documented, not hidden): the engine splits
    on whitespace and keeps alnum words (``bpe.WORD_RE``); the
    nearest public pre-tokenizer is ``WhitespaceSplit``, which keeps
    punctuation runs the engine drops — segmentations agree on
    alnum-word text. Returns the positional vocab written.
    """
    if os.path.exists(out_path):
        raise FileExistsError(
            f"export_hf_unigram: {out_path} exists; export to a fresh path"
        )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    if vocab_entries is None:
        vocab = [(unk_piece, float(UNK_EXPORT_LOGP))] + [
            (p, float(lp)) for p, lp in sorted(pieces)
        ]
        unk_id = 0
    else:
        by_id = sorted(vocab_entries, key=lambda e: e[2])
        ids = [e[2] for e in by_id]
        if ids != list(range(len(ids))):
            raise ValueError(
                "export_hf_unigram: pinned ids must be dense 0..n-1 "
                f"(Unigram ids are positional); got {ids[:5]}..."
            )
        vocab = [(p, float(lp)) for p, lp, _ in by_id]
    added = [
        {
            "id": i,
            "content": tok,
            "single_word": False,
            "lstrip": False,
            "rstrip": False,
            "normalized": False,
            "special": True,
        }
        for tok, i in sorted((specials or {}).items(), key=lambda kv: kv[1])
    ]
    doc = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": added,
        "normalizer": None,
        "pre_tokenizer": {"type": "WhitespaceSplit"},
        "post_processor": None,
        "decoder": None,
        "model": {
            "type": "Unigram",
            "unk_id": int(unk_id),
            "vocab": [[p, lp] for p, lp in vocab],
            "byte_fallback": False,
        },
    }
    tmp = out_path + ".inprogress"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(doc, fh, ensure_ascii=False)
    os.replace(tmp, out_path)
    return vocab


def import_hf_unigram(
    in_path: str,
) -> tuple[
    list[tuple[str, float, int]],
    tuple[str, float, int] | None,
    dict[str, int],
]:
    """Read an HF ``tokenizer.json`` with a ``"type": "Unigram"``
    model -> ``(vocab_entries, unk, specials)`` where
    ``vocab_entries`` is the verbatim positional table
    ``[(piece, logp, id), ...]`` (id = list index — honored VERBATIM,
    the import_gpt2 convention), ``unk`` is the artifact's UNK entry
    ``(piece, logp, id)`` (None if ``unk_id`` unset — kept verbatim
    so a re-export reproduces the artifact's own UNK row), and
    ``specials`` maps added-token content -> id. Entries listed in
    ``added_tokens`` are excluded from the piece table (they are
    control tokens no segmentation should produce). Anything but a
    Unigram model raises."""
    with open(in_path, encoding="utf-8") as fh:
        doc = json.load(fh)
    model = doc.get("model") or {}
    if model.get("type") != "Unigram":
        raise ValueError(
            f"import_hf_unigram: model.type={model.get('type')!r}; "
            "only Unigram maps onto the unigram arm"
        )
    raw = model.get("vocab") or []
    unk_id = model.get("unk_id")
    specials = {
        a["content"]: int(a["id"]) for a in doc.get("added_tokens") or []
    }
    unk = None
    if unk_id is not None and 0 <= int(unk_id) < len(raw):
        p, lp = raw[int(unk_id)]
        unk = (p, float(lp), int(unk_id))
    vocab_entries = [
        (p, float(lp), i)
        for i, (p, lp) in enumerate(raw)
        if p not in specials and i != unk_id
    ]
    return vocab_entries, unk, specials


def import_hf_wordpiece(
    in_path: str,
) -> tuple[list[tuple[str, int]], dict, dict[str, int]]:
    """Read an HF ``tokenizer.json`` with a ``"type": "WordPiece"``
    model (the BERT family) -> ``(vocab_ids, params, specials)``:
    ``vocab_ids`` is the ``model.vocab`` id map VERBATIM
    (``[(piece, id), ...]`` — the import_gpt2 convention), ``params``
    carries the segmentation contract (``unk_token``,
    ``continuing_subword_prefix``, ``max_input_chars_per_word``) with
    the format's published defaults, and ``specials`` maps
    added-token content -> id. The unk token STAYS in the piece table
    (greedy segmentation emits it); other added tokens are excluded
    (control tokens no segmentation should produce). Anything but a
    WordPiece model raises."""
    with open(in_path, encoding="utf-8") as fh:
        doc = json.load(fh)
    model = doc.get("model") or {}
    if model.get("type") != "WordPiece":
        raise ValueError(
            f"import_hf_wordpiece: model.type={model.get('type')!r}; "
            "only WordPiece maps onto the wordpiece arm"
        )
    params = {
        "unk_token": model.get("unk_token", "[UNK]"),
        "continuing_subword_prefix": model.get(
            "continuing_subword_prefix", "##"
        ),
        "max_input_chars_per_word": int(
            model.get("max_input_chars_per_word", 100)
        ),
    }
    specials = {
        a["content"]: int(a["id"]) for a in doc.get("added_tokens") or []
    }
    vocab_ids = [
        (p, int(i))
        for p, i in (model.get("vocab") or {}).items()
        if p not in specials or p == params["unk_token"]
    ]
    if not vocab_ids:
        raise ValueError(
            f"import_hf_wordpiece: {in_path} has an empty vocab"
        )
    return vocab_ids, params, specials


def export_hf_wordpiece(
    vocab_ids: list[tuple[str, int]],
    params: dict,
    out_path: str,
    specials: dict[str, int] | None = None,
) -> dict[str, int]:
    """Write a WordPiece id table back as a single-file HF
    ``tokenizer.json`` (``"type": "WordPiece"``): ids VERBATIM, the
    segmentation params round-tripped, specials in ``added_tokens`` —
    so an imported artifact re-exports byte-compatibly and an external
    stack segments identically. Returns the written vocab map."""
    vocab = {p: int(i) for p, i in vocab_ids}
    doc = {
        "version": "1.0",
        "model": {
            "type": "WordPiece",
            "unk_token": params.get("unk_token", "[UNK]"),
            "continuing_subword_prefix": params.get(
                "continuing_subword_prefix", "##"
            ),
            "max_input_chars_per_word": int(
                params.get("max_input_chars_per_word", 100)
            ),
            "vocab": vocab,
        },
        "added_tokens": [
            {"id": int(i), "content": p, "special": True}
            for p, i in sorted(
                (specials or {}).items(), key=lambda kv: kv[1]
            )
            if p not in vocab
        ],
    }
    tmp = out_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(doc, fh, ensure_ascii=False)
    os.replace(tmp, out_path)
    return vocab
