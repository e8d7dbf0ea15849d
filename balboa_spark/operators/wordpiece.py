"""WordPiece interchange + segmentation — the third public tokenizer
family (BERT-style), joining the byte-BPE (GPT-2) and Unigram
(SentencePiece) arms (r15 verdict stretch #8).

Import honors the public huggingface/tokenizers ``tokenizer.json``
``"type": "WordPiece"`` schema: the ``vocab`` id map VERBATIM (the
import_gpt2 convention — real artifacts are not in this engine's
structural order), ``unk_token``, ``continuing_subword_prefix``
(canonically ``##``) and ``max_input_chars_per_word``. Segmentation
is the published greedy longest-match-first algorithm: starting at
the word head, take the LONGEST vocab piece matching the remaining
prefix (continuation pieces carry the prefix); any position with no
match — or a word longer than ``max_input_chars_per_word`` — maps
the WHOLE word to ``unk_token``.

Scale shape: the greedy loop is inherently sequential per word and
has no bounded-unroll relational form (unlike the BPE merge fold,
whose step count is the PINNED merge count, the match loop advances
by data-dependent strides), so it runs as an Arrow-batched pandas
UDF over the DISTINCT pre-token relation — vocabulary-sized, NOT the
token stream — and joins back by word, exactly the byte-arm encode
shape. The vocab dict rides the closure (parameter-sized; ~30k
pieces for public BERT vocabs).

Pre-tokenization note (declared scope): corpus encode reuses the
engine's word convention (lowercased whitespace tokens filtered to
``^[a-z0-9]+$``, operators/text.tokens + bpe.WORD_RE) so WordPiece
sequences are comparable with the other arms on the same corpus; the
reference BERT pre-tokenizer additionally splits punctuation and CJK
chars, which this engine's pre-token convention does not reproduce.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: id emitted for pieces somehow absent from the id table (a
#: malformed artifact whose unk_token is missing): keep the sequence
#: length honest, mirror bpe.UNK_PIECE_ID's convention.
UNK_PIECE_ID = -1


def wordpiece_segment(
    word: str,
    vocab: set,
    unk_token: str = "[UNK]",
    prefix: str = "##",
    max_chars: int = 100,
) -> list[str]:
    """Greedy longest-match-first WordPiece segmentation of one word
    (pure Python — the per-word kernel the Arrow batch path maps, and
    the clear-room reference the tests pin against huggingface's
    published examples, e.g. 'unaffable' -> un ##aff ##able)."""
    if len(word) > max_chars:
        return [unk_token]
    pieces: list[str] = []
    start = 0
    n = len(word)
    while start < n:
        end = n
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = prefix + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [unk_token]
        pieces.append(cur)
        start = end
    return pieces


def wordpiece_segment_col(
    word: Column,
    vocab: set,
    unk_token: str = "[UNK]",
    prefix: str = "##",
    max_chars: int = 100,
) -> Column:
    """Arrow-batched segmentation expression over a word column: one
    pandas UDF call per batch of DISTINCT words, vocab in the
    closure."""
    from pyspark.sql.functions import pandas_udf

    v = set(vocab)

    @pandas_udf("array<string>")
    def seg(words: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in words:
            yield s.map(
                lambda w: wordpiece_segment(
                    w, v, unk_token=unk_token, prefix=prefix,
                    max_chars=max_chars,
                )
            )

    return seg(word)


def wordpiece_encode_corpus(
    df: DataFrame,
    vocab_ids: list[tuple[str, int]],
    unk_token: str = "[UNK]",
    prefix: str = "##",
    max_chars: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus -> (id, piece_ids array<int>) under a VERBATIM WordPiece
    id table (artifact ids, never re-derived — the vocab_source pin).
    Segmentation is paid once per DISTINCT pre-token (Arrow batch over
    the vocabulary-sized relation) and joins back; the id map is a
    parameter-sized broadcast; the regroup restores token order
    positionally — the bpe.encode_corpus plan with a WordPiece
    segmenter slotted in."""
    from balboa_spark.operators.bpe import WORD_RE
    from balboa_spark.operators.text import tokens

    spark = df.sparkSession
    vocab = {p for p, _ in vocab_ids}
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(tokens(F.col(text_col)), lambda w: w.rlike(WORD_RE))
        ).alias("_wpos", "_word"),
    )
    seg = (
        toks.select("_word")
        .distinct()
        .select(
            "_word",
            wordpiece_segment_col(
                F.col("_word"), vocab, unk_token=unk_token,
                prefix=prefix, max_chars=max_chars,
            ).alias("_pieces"),
        )
    )
    id_df = spark.createDataFrame(
        list(vocab_ids), "piece string, piece_id int"
    )
    pieces = toks.join(seg, "_word").select(
        F.col(id_col),
        "_wpos",
        F.posexplode("_pieces").alias("_ppos", "piece"),
    )
    mapped = pieces.join(F.broadcast(id_df), "piece", "left").withColumn(
        "piece_id", F.coalesce("piece_id", F.lit(UNK_PIECE_ID))
    )
    return mapped.groupBy(id_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("_wpos", "_ppos", "piece_id"))
            ),
            lambda s: s["piece_id"],
        ).alias("piece_ids")
    )
