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


def _wp_merge_pair(pieces: Column, a: str, b: str) -> Column:
    """One greedy left-to-right merge pass for WordPiece pieces:
    adjacent (a, b) becomes ``a + b[2:]`` — the continuation marker of
    the RIGHT piece is absorbed (within a word only the head piece is
    unprefixed, so b always carries ``##``). Fold semantics identical
    to bpe.merge_pair (first-element seeding, merged piece becomes the
    fold's last element)."""
    merged = a + b[2:]
    rest = F.slice(pieces, 2, F.greatest(F.size(pieces) - 1, F.lit(0)))
    return F.aggregate(
        rest,
        F.array(F.element_at(pieces, 1)),
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == a) & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def wordpiece_fit(
    df: DataFrame,
    num_merges: int,
    min_pair_count: int = 2,
    text_col: str = "text",
    score_digits: int = 12,
    stats_out: list | None = None,
) -> tuple[list[tuple[str, str]], list[tuple[str, int]]]:
    """WordPiece TRAINING under the published likelihood rule
    (Schuster & Nakajima 2012; the huggingface/tokenizers WordPiece
    trainer): each round merges the adjacent pair maximizing
    ``count(ab) / (count(a) * count(b))`` — pairs whose parts are rare
    outside the pair win over merely-frequent pairs, which is the one
    behavioral difference from BPE's raw-count argmax.

    Plan shape per round (the bpe._fit_merges discipline): ONE
    vocab-sized pass produces BOTH the pair counts and the symbol
    counts (two aggregates over the same localCheckpointed relation),
    one broadcast-joined score argmax collects a single row, and the
    winning merge applies as a pure column fold — driver state is the
    merge list only. The score is rounded to ``score_digits`` before
    the (score DESC, a, b) tie-break so the argmax is
    float-order-stable.

    Returns ``(merges, vocab_ids)``: the merge list in learn order
    and the FINAL piece table with dense ids (weight DESC, piece —
    the vocab_table ranking convention), ready for
    :func:`wordpiece_encode_corpus` / a TokenizerStore commit. Pass a
    list as ``stats_out`` to also receive each round's winning
    ``(a, b, pair_count)`` — the driver-graded fit surface.
    """
    from balboa_spark.operators.bpe import chars, word_histogram

    hist = word_histogram(df, text_col)
    vocab = hist.select(
        "cnt",
        F.transform(
            chars(F.col("word")),
            lambda c, i: F.when(i == 0, c).otherwise(F.concat(F.lit("##"), c)),
        ).alias("p"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = (
            vocab.filter(F.size("p") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.arrays_zip(
                        F.expr("slice(p, 1, size(p) - 1)").alias("a"),
                        F.expr("slice(p, 2, size(p) - 1)").alias("b"),
                    )
                ).alias("pr"),
            )
            .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
            .agg(F.sum("cnt").alias("n"))
        )
        syms = (
            vocab.select("cnt", F.explode("p").alias("s"))
            .groupBy("s")
            .agg(F.sum("cnt").alias("c"))
        )
        best = (
            pairs.join(
                F.broadcast(syms.select(F.col("s").alias("a"),
                                        F.col("c").alias("ca"))), "a")
            .join(
                F.broadcast(syms.select(F.col("s").alias("b"),
                                        F.col("c").alias("cb"))), "b")
            .select(
                "a", "b", "n",
                F.round(
                    F.col("n") / (F.col("ca") * F.col("cb")), score_digits
                ).alias("score"),
            )
            .orderBy(F.col("score").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        if stats_out is not None:
            stats_out.append((a, b, int(best[0]["n"])))
        nxt = vocab.select(
            "cnt", _wp_merge_pair(F.col("p"), a, b).alias("p")
        ).localCheckpoint(eager=True)
        vocab.unpersist()
        vocab = nxt
    wt = (
        vocab.select("cnt", F.explode("p").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("weight"))
        .orderBy(F.col("weight").desc(), "piece")
        .collect()
    )
    vocab.unpersist()
    vocab_ids = [(r["piece"], i) for i, r in enumerate(wt)]
    return merges, vocab_ids
