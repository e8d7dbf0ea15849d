"""Byte-pair-encoding tokenizer training and segmentation, distributed.

The missing piece between the corpus operators (token counts, vocab
top-k, packing) and an actual LLM data pipeline is training the
tokenizer itself. This is word-level BPE (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
algorithm): learn a sequence of greedy adjacent-pair merges from the
corpus word histogram, then segment any word by replaying the merges
in order.

Scale design (the reference has no tokenizer trainer; this is one of
the engine's beyond-reference LLM-pipeline operators):

- The corpus is touched ONCE, to build the word histogram
  (tokenize → explode → groupBy word). Everything after operates on
  the vocabulary relation, which is orders of magnitude smaller than
  the corpus at any scale (Heaps' law) and stays distributed.
- Each merge round is one vocab-sized shuffle (pair counts with
  map-side partial aggregation) + a driver-side top-1 (ONE row via
  TakeOrdered — bounded driver state: the learned merge list itself,
  ``num_merges`` pairs).
- The per-round piece rewrite is a pure higher-order-function fold
  (``F.aggregate``) — JVM-side, no Python UDF — and the vocab
  relation is re-materialized with ``localCheckpoint`` each round so
  lineage depth stays O(1) instead of O(num_merges).
- Segmentation with a FIXED merge list is a stateless projection
  (a chain of ``num_merges`` folds), embarrassingly parallel.

Only ``^[a-z0-9]+$`` words participate: BPE over a lowercased alnum
vocabulary keeps every piece regex-safe for both Spark and DuckDB
replay (the oracle unrolls the same fold with string functions).
"""

from __future__ import annotations

import pandas as pd  # module-global: pandas_udf type hints resolve here

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from balboa_spark.operators.text import tokens

WORD_RE = "^[a-z0-9]+$"


def chars(word: Column) -> Column:
    """Initial BPE state: the word as an array of single characters."""
    return F.regexp_extract_all(word, F.lit("(.)"), 1)


def merge_pair(pieces: Column, a: str, b: str) -> Column:
    """One greedy left-to-right merge pass: every adjacent (a, b) in
    ``pieces`` becomes the single piece ``a+b``. Fold semantics match
    classic BPE exactly: after merging, the new piece is the fold's
    last element, so "aaa" under merge (a,a) yields [aa, a], not
    [a, aa] or [aa, aa]. Seeded with the first element (not an empty
    array) so the accumulator never needs an untyped empty literal —
    and so the DuckDB oracle's ``list_reduce`` (which has
    first-element seeding built in) replays it verbatim."""
    merged = a + b
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


def merge_pair_col(pieces: Column, a: Column, b: Column) -> Column:
    """:func:`merge_pair` with the pair as COLUMNS — one greedy merge
    pass where each row can carry a different (a, b) (the per-group
    fit joins the round's |G|-row argmax table onto the vocab and
    applies each group's own merge in a single pass). Same fold
    semantics as the literal version."""
    rest = F.slice(pieces, 2, F.greatest(F.size(pieces) - 1, F.lit(0)))
    return F.aggregate(
        rest,
        F.array(F.element_at(pieces, 1)),
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == a) & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(a, b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _merge_pass_str(s: Column, a: str, b: str) -> Column:
    """One greedy merge pass over a SPACE-JOINED piece string — same
    semantics as :func:`merge_pair`, but the expression references its
    input exactly once (inside the split). That single-reference shape
    is load-bearing: chaining N array folds where each level re-reads
    its input k times builds a k^N-node Catalyst expression tree
    (analysis hangs around N=10); the string fold keeps the chain
    LINEAR in the number of merges. Pieces are alnum by construction
    (WORD_RE), so the regex literals need no escaping."""
    return F.aggregate(
        F.split(s, " "),
        F.lit(""),
        lambda acc, x: F.when(acc == "", x)
        .when(
            (F.regexp_extract(acc, "([^ ]+)$", 1) == a) & (x == b),
            F.regexp_replace(acc, "([^ ]+)$", a + b),
        )
        .otherwise(F.concat_ws(" ", acc, x)),
    )


def segment(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Segment a word under a fixed merge list: chars, then each merge
    replayed in learned order. A pure column expression — a linear
    chain of ``len(merges)`` single-reference string folds (see
    :func:`_merge_pass_str`), no shuffle, no UDF."""
    s = F.concat_ws(" ", chars(word))
    for a, b in merges:
        s = _merge_pass_str(s, a, b)
    return F.split(s, " ")


#: merge-count ceiling for the Column-fold segmenter: the linear chain
#: of string folds analyzes fine into the hundreds, but a production
#: vocabulary carries 30k-100k merges and a 30k-node expression chain
#: will not analyze, let alone run. Above this, segmentation switches
#: to the Arrow batch path.
ARROW_MERGE_THRESHOLD = 64


def _segment_word_py(
    pieces: list[str],
    merges: list[tuple[str, str]],
    ranks: dict[tuple[str, str], int],
) -> list[str]:
    """EXACT Python twin of :func:`segment`'s sequential-pass
    semantics, restated efficiently: replaying merge j is a no-op
    unless pair j is currently present, and pass ranks strictly
    increase — so instead of touching all N merges per word, find the
    smallest not-yet-passed rank among the word's CURRENT adjacent
    pairs (<= len-1 dict lookups) and run that one greedy
    left-to-right pass. Each applied pass shortens the word, so the
    cost is O(len^2) dict lookups + O(len) per applied pass —
    independent of merge-list size, which is what makes 100k-merge
    production vocabularies feasible. A pair whose rank precedes the
    last applied pass is skipped exactly like the sequential replay
    would skip it (its pass already ran)."""
    cur = pieces
    last = -1
    while len(cur) > 1:
        best = -1
        for i in range(len(cur) - 1):
            r = ranks.get((cur[i], cur[i + 1]), -1)
            if r > last and (best == -1 or r < best):
                best = r
        if best == -1:
            break
        a, b = merges[best]
        out = [cur[0]]
        for x in cur[1:]:
            if out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        cur = out
        last = best
    return cur


def segment_arrow(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Arrow-batched segmentation for production-sized merge lists —
    the designated pandas_udf seam (same as compression_signals), one
    Python invocation per Arrow batch, pure-Python merge replay
    inside. Semantics are IDENTICAL to :func:`segment` (parity-tested
    against the Column fold and against a naive sequential-pass
    reference); use this above :data:`ARROW_MERGE_THRESHOLD` where
    the expression-chain form stops being analyzable. The merge list
    rides the UDF closure (task-broadcast once per executor; 100k
    merges is a few MB)."""
    from pyspark.sql.functions import pandas_udf

    mlist = [tuple(m) for m in merges]
    ranks = {m: i for i, m in enumerate(mlist)}

    @pandas_udf("array<string>")
    def _seg(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _segment_word_py(list(w), mlist, ranks))

    return _seg(word)


def segment_any(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Segmentation with automatic path choice: the oracle-replayable
    Column fold for short merge lists, the Arrow batch segmenter past
    :data:`ARROW_MERGE_THRESHOLD`."""
    if len(merges) > ARROW_MERGE_THRESHOLD:
        return segment_arrow(word, merges)
    return segment(word, merges)


# -- byte-level arm (GPT-2 shape: Radford et al. 2019 §2.2) ------------------
#
# Production GPT-style pipelines tokenize BYTE-level so no text is ever
# OOV: a byte-level pre-tokenizer splits raw text into pre-tokens
# (leading space attached), each pre-token becomes its UTF-8 byte
# sequence, and BPE merges run over a 256-symbol byte alphabet. GPT-2
# remaps bytes to printable unicode chars (bytes_to_unicode) purely so
# pieces stay visible strings; this engine's SQL-replayable equivalent
# is UPPERCASE HEX PAIRS — hex(encode(text)) is identical in Spark and
# DuckDB, pieces stay regex-safe ([0-9A-F]+) for the same merge folds
# the word-level arm uses, and decode is unhex(concat(pieces)).
# Both properties are verified: cross-engine hex parity in the graded
# oracle, byte-exact encode→decode round-trip on emoji/CJK in tests.

#: GPT-2's pre-tokenizer minus the contraction alternates and the
#: trailing-space lookahead — RE2 (DuckDB) has no lookahead, and both
#: engines must replay the SAME split. Leading space attaches to the
#: following word (the GPT-2 convention that makes " the" one token).
BYTE_PRETOK_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def byte_pretokenize(text: Column) -> Column:
    """GPT-2-style pre-tokens of raw text (lossless: concatenating the
    pre-tokens restores the text exactly — every char lands in exactly
    one alternative)."""
    return F.regexp_extract_all(text, F.lit(BYTE_PRETOK_RE), 0)


def byte_units(word: Column) -> Column:
    """Initial byte-level BPE state: the pre-token's UTF-8 bytes as
    uppercase hex pairs (the 256-symbol base alphabet)."""
    return F.regexp_extract_all(F.hex(F.encode(word, "UTF-8")), F.lit(".."), 0)


def byte_word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-sized pass of the byte arm: (word, cnt) over
    pre-tokens. EVERY pre-token participates (no WORD_RE gate — the
    whole point of byte level is that nothing is out-of-alphabet)."""
    return (
        df.select(F.explode(byte_pretokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def byte_segment(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Segment a pre-token under a fixed byte-merge list: hex pairs,
    then each merge replayed in learned order — the same linear chain
    of single-reference string folds as the word arm (pieces are
    [0-9A-F]+, regex-safe by construction)."""
    s = F.concat_ws(" ", byte_units(word))
    for a, b in merges:
        s = _merge_pass_str(s, a, b)
    return F.split(s, " ")


def byte_segment_arrow(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Arrow-batched byte segmentation for production-sized merge
    lists — same seam and replay semantics as :func:`segment_arrow`,
    initial state = the UTF-8 hex pairs."""
    from pyspark.sql.functions import pandas_udf

    mlist = [tuple(m) for m in merges]
    ranks = {m: i for i, m in enumerate(mlist)}

    @pandas_udf("array<string>")
    def _seg(words: pd.Series) -> pd.Series:
        return words.map(
            lambda w: _segment_word_py(
                [f"{byte:02X}" for byte in w.encode("utf-8")], mlist, ranks
            )
        )

    return _seg(word)


def byte_segment_any(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Byte segmentation with automatic path choice (the
    :data:`ARROW_MERGE_THRESHOLD` contract of :func:`segment_any`)."""
    if len(merges) > ARROW_MERGE_THRESHOLD:
        return byte_segment_arrow(word, merges)
    return byte_segment(word, merges)


def byte_bpe_fit(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 16,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` byte-level merges from the corpus — the
    word arm's fit loop (one vocab-sized pair-count shuffle + a 1-row
    TakeOrdered per round, vocab re-materialized per round) over the
    hex-pair initial state."""
    vocab = byte_word_histogram(df, text_col).select(
        "cnt", byte_units(F.col("word")).alias("p")
    )
    return _fit_merges(vocab, num_merges, min_pair_count)


def byte_bpe_fit_by_group(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    num_merges: int = 16,
    min_pair_count: int = 2,
) -> dict[str, list[tuple[str, str, int]]]:
    """ONE byte-level tokenizer per group, fit in a single relational
    plan — CCNet trains one model per language
    (``lm.kn_ngram_lm_perplexity_by_group`` precedent); production
    tokenizers are likewise fit per language slice so frequent
    scripts don't starve rare ones of merges.

    No per-group loop: the vocabulary relation carries the group key,
    each round computes EVERY group's argmax pair in one aggregation
    (groupBy(_g) over the pair counts — a |G|-row result, the only
    driver-collected state), and one broadcast join applies each
    group's own merge to its vocab slice via :func:`merge_pair_col`.
    Cost per round is identical to the ungrouped fit (one vocab-sized
    shuffle); |G| never multiplies the data passes. A group whose best
    pair falls under ``min_pair_count`` simply stops accumulating
    merges (re-evaluated each round — its frozen vocab reproduces the
    same failing argmax, so no active-set state is needed and the
    DuckDB replay can't drift).

    Rows with a NULL group are dropped (no language id -> no
    per-language tokenizer; route through LID first).

    Returns {group: [(a, b, pair_count), ...] in learned order}.
    """
    spark = df.sparkSession
    vocab = (
        df.filter(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).cast("string").alias("_g"),
            F.explode(byte_pretokenize(F.col(text_col))).alias("word"),
        )
        .groupBy("_g", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("_g", "cnt", byte_units(F.col("word")).alias("p"))
        .localCheckpoint(eager=True)
    )
    merges: dict[str, list[tuple[str, str, int]]] = {}
    for _ in range(num_merges):
        best = (
            vocab.filter(F.size("p") >= 2)
            .select(
                "_g",
                "cnt",
                F.explode(
                    F.arrays_zip(
                        F.expr("slice(p, 1, size(p) - 1)").alias("a"),
                        F.expr("slice(p, 2, size(p) - 1)").alias("b"),
                    )
                ).alias("pr"),
            )
            .groupBy("_g", F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
            .agg(F.sum("cnt").alias("n"))
            .groupBy("_g")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("n")).alias("nn"), "a", "b", "n"
                    )
                ).alias("m")
            )
            .select("_g", "m.a", "m.b", "m.n")
            .collect()
        )
        round_pairs = [
            (r["_g"], r["a"], r["b"], int(r["n"]))
            for r in best
            if r["n"] >= min_pair_count
        ]
        if not round_pairs:
            break
        for g, a, b, n in round_pairs:
            merges.setdefault(g, []).append((a, b, n))
        mt = spark.createDataFrame(
            [(g, a, b) for g, a, b, _ in round_pairs],
            "_g string, _ma string, _mb string",
        )
        nxt = (
            vocab.join(F.broadcast(mt), on="_g", how="left")
            .select(
                "_g",
                "cnt",
                F.when(
                    F.col("_ma").isNotNull(),
                    merge_pair_col(
                        F.col("p"), F.col("_ma"), F.col("_mb")
                    ),
                )
                .otherwise(F.col("p"))
                .alias("p"),
            )
            .localCheckpoint(eager=True)
        )
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return merges


def byte_vocab(merges: list[tuple[str, str]]) -> list[tuple[str, int]]:
    """The byte tokenizer's id table, GPT-2 shape: 256 base byte
    tokens (piece_id = byte value) + one minted piece per merge in
    learned order. STRUCTURAL, not corpus-derived — every piece any
    segmentation can ever produce is either a base pair or a merge
    product, so encode is provably OOV-free on arbitrary UTF-8
    regardless of what corpus the merges were fit on. Parameter-sized
    (256 + len(merges) rows): broadcast it."""
    pieces = [f"{i:02X}" for i in range(256)] + [a + b for a, b in merges]
    return [(p, i) for i, p in enumerate(pieces)]


def byte_encode_corpus(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_ids: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """Corpus → (id, piece_ids array<int>) under the byte tokenizer.
    Same distributed shape as :func:`encode_corpus` — segmentation
    runs once per DISTINCT pre-token and joins back; the id map is the
    parameter-sized structural vocab, broadcast, INNER join (no UNK
    branch: :func:`byte_vocab` covers every producible piece).

    ``vocab_ids`` overrides the structural id table with an EXPLICIT
    [(hex piece, id)] map — the imported-artifact path
    (:mod:`tokenizer_io`: real GPT-2 ``vocab.json`` ids are not in
    structural order). An explicit map may be partial, so that path
    LEFT-joins and emits :data:`UNK_PIECE_ID` for unmapped pieces
    (the word-arm sentinel convention — never a silent drop)."""
    spark = df.sparkSession
    vocab = spark.createDataFrame(
        vocab_ids if vocab_ids is not None else byte_vocab(merges),
        "piece string, piece_id int",
    )
    toks = df.select(
        F.col(id_col),
        F.posexplode(byte_pretokenize(F.col(text_col))).alias("_wpos", "_word"),
    )
    seg = (
        toks.select("_word")
        .distinct()
        .select("_word", byte_segment_any(F.col("_word"), merges).alias("_pieces"))
    )
    pieces = toks.join(seg, "_word").select(
        F.col(id_col), "_wpos", F.posexplode("_pieces").alias("_ppos", "piece")
    )
    if vocab_ids is not None:
        mapped = pieces.join(F.broadcast(vocab), "piece", "left").withColumn(
            "piece_id", F.coalesce(F.col("piece_id"), F.lit(UNK_PIECE_ID))
        )
    else:
        mapped = pieces.join(F.broadcast(vocab), "piece")
    return mapped.groupBy(id_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("_wpos", "_ppos", "piece_id"))
            ),
            lambda s: s["piece_id"],
        ).alias("piece_ids")
    )


def byte_decode(piece_ids: Column, merges: list[tuple[str, str]]) -> Column:
    """(array<int> piece ids) → original text: ids back to hex pieces
    via the structural vocab (an element_at against a parameter-sized
    array literal), concatenated and unhexed. Byte-exact inverse of
    :func:`byte_encode_corpus` for any UTF-8 input — the no-OOV
    round-trip the tests pin on emoji/CJK."""
    table = F.array(*[F.lit(p) for p, _ in byte_vocab(merges)])
    hexes = F.transform(piece_ids, lambda i: F.element_at(table, i + 1))
    return F.decode(F.unhex(F.concat_ws("", hexes)), "UTF-8")


def word_histogram(
    df: DataFrame, text_col: str = "text", tokens_col: str | None = None
) -> DataFrame:
    """The one corpus-sized pass: (word, cnt) for alnum words.

    ``tokens_col``: optional pre-tokenized array column holding
    EXACTLY ``text.tokens(text_col)`` — a caller that already staged
    the token array (tokenizer_diff's shared stream, r17) skips the
    tokenize chain; identical by construction (same tokenizer, same
    WORD_RE filter applied here either way)."""
    tk = (
        F.col(tokens_col) if tokens_col is not None
        else tokens(F.col(text_col))
    )
    return (
        df.select(F.explode(tk).alias("word"))
        .filter(F.col("word").rlike(WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_fit(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 16,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    merge list in learned order (the tokenizer artifact — bounded
    driver state, one pair per round). Ties break deterministically
    on (count desc, a asc, b asc), so a re-fit over the same corpus
    is reproducible regardless of partitioning."""
    vocab = word_histogram(df, text_col).select(
        "cnt", chars(F.col("word")).alias("p")
    )
    return _fit_merges(vocab, num_merges, min_pair_count)


def _fit_merges(
    vocab: DataFrame, num_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """The shared greedy merge loop over a (cnt, p: array<string>)
    vocabulary relation — one vocab-sized pair-count shuffle + a 1-row
    TakeOrdered per round, vocab re-materialized per round so lineage
    stays O(1). Both the char and the byte arm call this."""
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair = (
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
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not pair or pair[0]["n"] < min_pair_count:
            break
        a, b = pair[0]["a"], pair[0]["b"]
        merges.append((a, b))
        nxt = vocab.select("cnt", merge_pair(F.col("p"), a, b).alias("p"))
        nxt = nxt.localCheckpoint(eager=True)
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return merges


def bpe_segment_words(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    top_n: int | None = None,
) -> DataFrame:
    """Segment the corpus vocabulary under a fixed merge list:
    (word, cnt, pieces [space-joined], n_pieces), heaviest words
    first. ``top_n`` bounds the output for reporting (deterministic
    cnt-desc, word-asc order); at scale leave it None and let the
    caller keep the relation distributed."""
    out = word_histogram(df, text_col).select(
        "word",
        "cnt",
        F.concat_ws(" ", segment_any(F.col("word"), merges)).alias("pieces"),
    )
    out = out.select(
        "word",
        "cnt",
        "pieces",
        F.size(F.split("pieces", " ")).alias("n_pieces"),
    )
    out = out.orderBy(F.col("cnt").desc(), "word")
    return out.limit(top_n) if top_n is not None else out


class TokenizerStore:
    """The tokenizer as a persisted, crash-safe artifact.

    ``bpe_fit`` returns a driver-side merge list; a pipeline needs the
    tokenizer ON DISK with the same commit discipline as every other
    persisted artifact (ObservationStore / VectorStore /
    PostingsIndex — plans/genstore): immutable ``gen-<n>/`` snapshots
    holding ``merges.json`` (the learned merge list, in order) and
    ``vocab/`` (the :func:`vocab_table` parquet: piece, weight,
    piece_id), committed by ONE atomic manifest rename, keep-last-2
    vacuum. A crash mid-``fit`` leaves the previous tokenizer fully
    readable; segmentation and the id mapping can never disagree
    (they flip together).

    Load → segment round-trip: :meth:`segment_col` rebuilds the
    segmentation expression from the stored merges via
    :func:`segment_any`, so a reader needs no state beyond the path —
    the production shape where the tokenizer is fit once on the
    corpus snapshot and replayed by every downstream job.

    ``kind`` (r13): one store persists any of the engine's three
    tokenizer families under the same commit model — ``"word"``
    (Sennrich word-level BPE, the original arm), ``"byte"`` (GPT-2
    byte-level BPE: merges.json over hex-pair units + the STRUCTURAL
    256+merges vocab), ``"unigram"`` (SentencePiece unigram LM:
    pieces.json [(piece, logp)] + the piece-asc id table). The kind
    is pinned by the first committed fit (manifest field, the
    attribute-store schema-pinning convention): a later fit with a
    different kind raises instead of silently mixing artifacts that
    downstream readers would misinterpret. Pre-r13 manifests have no
    kind field and read as "word"."""

    MANIFEST = "manifest.json"

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path

    def _manifest(self) -> dict:
        import json
        import os

        with open(os.path.join(self.path, self.MANIFEST)) as fh:
            return json.load(fh)

    def _gen_dir(self, gen: int) -> str:
        import os

        return os.path.join(self.path, f"gen-{gen}")

    def kind(self) -> str:
        """The committed tokenizer family ('word' for pre-r13 stores
        whose manifest predates the field)."""
        return self._manifest().get("kind", "word")

    def _start_fit(self, kind: str) -> tuple[int, str]:
        import os

        try:
            man = self._manifest()
            committed = man.get("kind", "word")
            if committed != kind:
                raise ValueError(
                    f"store at {self.path} is committed as kind "
                    f"{committed!r}; a {kind!r} tokenizer needs a new "
                    "path (kinds never mix within one artifact)"
                )
            gen = man["generation"] + 1
        except FileNotFoundError:
            gen = 0
        gen_dir = self._gen_dir(gen)
        os.makedirs(gen_dir, exist_ok=True)
        return gen, gen_dir

    def _commit(self, gen: int, extra: dict) -> None:
        import json
        import os

        from balboa_spark.plans.genstore import (
            flip_manifest,
            vacuum_generations,
        )

        # Per-generation provenance record, written BEFORE the
        # manifest flip: the top-level manifest describes only the
        # latest generation, so an imported gen N followed by an
        # engine fit at gen N+1 would otherwise lose gen N's
        # id-provenance and export_gpt2(generation=N) would silently
        # re-derive structural ids that contradict gen N's stored id
        # table. vocab_source=None is the explicit "structural ids"
        # record for engine-fit generations.
        prov = {
            "vocab_source": extra.get("vocab_source"),
            "special_tokens": extra.get("special_tokens") or {},
            "unk_id": extra.get("unk_id"),
            "unk_piece": extra.get("unk_piece"),
            "unk_logp": extra.get("unk_logp"),
        }
        ptmp = os.path.join(self._gen_dir(gen), "provenance.json.tmp")
        with open(ptmp, "w") as fh:
            json.dump(prov, fh)
        os.replace(ptmp, os.path.join(self._gen_dir(gen), "provenance.json"))

        flip_manifest(
            self.path, {"generation": gen, **extra}, self.MANIFEST
        )
        vacuum_generations(self.path, gen, keep_last=2)

    def fit(
        self,
        df: DataFrame,
        text_col: str = "text",
        num_merges: int = 16,
        min_pair_count: int = 2,
    ) -> list[tuple[str, str]]:
        """Fit on the corpus and commit a new generation. Returns the
        merge list (also persisted). Cost = the bpe_fit rounds + one
        extra vocabulary pass for the piece table."""
        import json
        import os

        gen, gen_dir = self._start_fit("word")
        merges = bpe_fit(
            df, text_col=text_col, num_merges=num_merges,
            min_pair_count=min_pair_count,
        )
        with open(os.path.join(gen_dir, "merges.json"), "w") as fh:
            json.dump([list(m) for m in merges], fh)
        vocab_table(df, merges, text_col=text_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(gen_dir, "vocab"))
        self._commit(gen, {
            "kind": "word",
            "num_merges": len(merges),
            "text_col": text_col,
            "min_pair_count": min_pair_count,
        })
        return merges

    def fit_byte(
        self,
        df: DataFrame,
        text_col: str = "text",
        num_merges: int = 16,
        min_pair_count: int = 2,
    ) -> list[tuple[str, str]]:
        """Byte-level arm: persist merges.json (hex-pair merges) + the
        STRUCTURAL vocab parquet (piece, weight=0, piece_id — ids are
        positional: 256 base bytes then merges, so encode stays
        provably OOV-free straight off the stored table)."""
        import json
        import os

        gen, gen_dir = self._start_fit("byte")
        merges = byte_bpe_fit(
            df, text_col=text_col, num_merges=num_merges,
            min_pair_count=min_pair_count,
        )
        with open(os.path.join(gen_dir, "merges.json"), "w") as fh:
            json.dump([list(m) for m in merges], fh)
        self.spark.createDataFrame(
            [(p, 0, i) for p, i in byte_vocab(merges)],
            "piece string, weight long, piece_id int",
        ).write.mode("overwrite").parquet(os.path.join(gen_dir, "vocab"))
        self._commit(gen, {
            "kind": "byte",
            "num_merges": len(merges),
            "text_col": text_col,
            "min_pair_count": min_pair_count,
        })
        return merges

    def fit_unigram(
        self,
        df: DataFrame,
        text_col: str = "text",
        vocab_size: int = 48,
        max_piece_len: int = 4,
        seed_m: int = 64,
        em_iters: int = 2,
    ) -> list[tuple[str, float]]:
        """Unigram-LM arm: persist pieces.json [(piece, logp)] + the
        piece-asc id table (UNK_PIECE_ID 0 is implicit; ids from 1)."""
        import json
        import os

        from balboa_spark.operators import unigram as _ug

        gen, gen_dir = self._start_fit("unigram")
        pieces = _ug.unigram_fit(
            df, text_col=text_col, vocab_size=vocab_size,
            max_piece_len=max_piece_len, seed_m=seed_m, em_iters=em_iters,
        )
        with open(os.path.join(gen_dir, "pieces.json"), "w") as fh:
            json.dump([[p, lp] for p, lp in pieces], fh)
        self.spark.createDataFrame(
            [(p, lp, i + 1) for i, (p, lp) in enumerate(sorted(pieces))],
            "piece string, logp double, piece_id int",
        ).write.mode("overwrite").parquet(os.path.join(gen_dir, "vocab"))
        self._commit(gen, {
            "kind": "unigram",
            "vocab_size": len(pieces),
            "max_piece_len": max_piece_len,
            "text_col": text_col,
        })
        return pieces

    def pieces(
        self, generation: int | None = None
    ) -> list[tuple[str, float]]:
        """The stored unigram piece distribution [(piece, logp)]."""
        import json
        import os

        if self.kind() != "unigram":
            raise ValueError(
                f"pieces() is the unigram artifact; this store is "
                f"{self.kind()!r}"
            )
        gen = self._resolve_gen(generation)
        with open(os.path.join(self._gen_dir(gen), "pieces.json")) as fh:
            return [(p, lp) for p, lp in json.load(fh)]

    def generations(self) -> list[int]:
        """Committed, retained tokenizer generations, oldest first —
        a ``generation=`` read pins segmentation AND ids to one
        historical fit (they flip together, so they can never mix)."""
        import os

        try:
            cur = self._manifest()["generation"]
        except FileNotFoundError:
            return []
        return sorted(
            g
            for e in os.listdir(self.path)
            if e.startswith("gen-") and e[4:].isdigit()
            and (g := int(e[4:])) <= cur
        )

    def _resolve_gen(self, generation: int | None) -> int:
        if generation is None:
            return self._manifest()["generation"]
        if generation not in self.generations():
            raise ValueError(
                f"generation {generation} is not retained "
                f"(available: {self.generations()})"
            )
        return generation

    def merges(self, generation: int | None = None) -> list[tuple[str, str]]:
        import json
        import os

        if self.kind() == "unigram":
            raise ValueError(
                "merges() is a BPE artifact; this store is 'unigram' — "
                "use pieces()"
            )
        gen = self._resolve_gen(generation)
        with open(os.path.join(self._gen_dir(gen), "merges.json")) as fh:
            return [tuple(m) for m in json.load(fh)]

    def vocab(self, generation: int | None = None) -> DataFrame:
        import os

        gen = self._resolve_gen(generation)
        return self.spark.read.parquet(
            os.path.join(self._gen_dir(gen), "vocab")
        )

    def segment_col(self, word: Column) -> Column:
        """Segmentation expression under the STORED tokenizer —
        Column fold for small merge lists, Arrow batch above the
        threshold (see :func:`segment_any` / :func:`byte_segment_any`).
        The unigram kind has no single-Column form (its Viterbi needs
        the staged two-projection shape — forward fold materialized,
        backward walk reading the column): use
        :func:`balboa_spark.operators.unigram.unigram_segment_words`
        with :meth:`pieces`."""
        k = self.kind()
        if k == "word":
            return segment_any(word, self.merges())
        if k == "byte":
            return byte_segment_any(word, self.merges())
        if k == "wordpiece":
            # greedy longest-match has a single-Column Arrow form
            from balboa_spark.operators import wordpiece as _wp

            man = self._manifest()
            vocab = {
                r["piece"]
                for r in self.vocab().select("piece").collect()
            }
            return _wp.wordpiece_segment_col(
                word, vocab,
                unk_token=man.get("unk_token", "[UNK]"),
                prefix=man.get("continuing_subword_prefix", "##"),
                max_chars=int(man.get("max_input_chars_per_word", 100)),
            )
        raise ValueError(
            "unigram segmentation needs the staged DataFrame path — "
            "use unigram.unigram_segment_words(df, store.pieces(), ...)"
        )

    def _gen_provenance(self, gen: int) -> dict:
        """The REQUESTED generation's provenance record (post-r15
        gens carry one); pre-provenance fallback: the manifest when
        gen is latest, else an explicit no-provenance marker."""
        import json
        import os

        ppath = os.path.join(self._gen_dir(gen), "provenance.json")
        if os.path.exists(ppath):
            with open(ppath) as fh:
                return json.load(fh)
        man = self._manifest()
        if gen == man.get("generation"):
            return man
        if man.get("vocab_source") in ("gpt2_import", "hf_import"):
            # the store HAS imported ids somewhere in its history but
            # this pre-provenance generation can't say whether THEY
            # are its ids — silently re-deriving structural ids here
            # would contradict the generation's stored id table,
            # exactly the hazard export_gpt2/_export_hf_unigram
            # refuse (r15 ADVICE)
            raise ValueError(
                f"generation {gen} predates per-generation provenance "
                "and is not the latest, but the store manifest records "
                f"an imported vocab ({man.get('vocab_source')!r}) — "
                "its id assignment is ambiguous. Re-export the "
                "generation under a post-r15 fit, or encode the "
                "latest generation."
            )
        return {"vocab_source": None, "_unknown": True}

    def encode(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        generation: int | None = None,
        words: DataFrame | None = None,
        tokens_col: str | None = None,
    ) -> DataFrame:
        """Corpus → (id, piece_ids array<int>) under the STORED
        tokenizer, whichever kind is committed. ``generation`` pins a
        retained historical fit (segmentation AND ids together — the
        generations() contract); default = latest.

        ``words`` / ``tokens_col`` (word kind only, r17): the
        :func:`encode_corpus` sharing seams — a caller encoding the
        same corpus under several generations (tokenizer_diff) stages
        the token array and the word histogram once and passes both;
        other kinds tokenize differently, so the seams raise rather
        than silently ignore."""
        k = self.kind()
        gen = self._resolve_gen(generation)
        prov = self._gen_provenance(gen)
        if k == "word":
            return encode_corpus(
                df, self.merges(gen), self.vocab(gen),
                text_col=text_col, id_col=id_col,
                words=words, tokens_col=tokens_col,
            )
        if words is not None or tokens_col is not None:
            raise ValueError(
                f"words=/tokens_col= are word-kind seams; this store "
                f"is committed as kind {k!r} (its tokenizer does not "
                "consume text.tokens arrays)"
            )
        if k == "byte":
            # an imported public artifact pins EXPLICIT ids (real
            # GPT-2 vocab.json is not in structural order) — read the
            # parameter-sized id table back and honor it verbatim
            vocab_ids = None
            if prov.get("vocab_source") in ("gpt2_import", "hf_import"):
                vocab_ids = [
                    (r["piece"], r["piece_id"])
                    for r in self.vocab(gen)
                    .select("piece", "piece_id")
                    .collect()
                ]
            return byte_encode_corpus(
                df, self.merges(gen), text_col=text_col, id_col=id_col,
                vocab_ids=vocab_ids,
            )
        if k == "wordpiece":
            # wordpiece generations exist only via import — the id
            # table and segmentation params are always the artifact's
            from balboa_spark.operators import wordpiece as _wp

            man = self._manifest()
            vocab_ids = [
                (r["piece"], int(r["piece_id"]))
                for r in self.vocab(gen).select("piece", "piece_id").collect()
            ]
            return _wp.wordpiece_encode_corpus(
                df, vocab_ids,
                unk_token=prov.get(
                    "unk_token", man.get("unk_token", "[UNK]")
                ),
                prefix=prov.get(
                    "continuing_subword_prefix",
                    man.get("continuing_subword_prefix", "##"),
                ),
                max_chars=int(prov.get(
                    "max_input_chars_per_word",
                    man.get("max_input_chars_per_word", 100),
                )),
                text_col=text_col, id_col=id_col,
            )
        from balboa_spark.operators import unigram as _ug

        man = self._manifest()
        # same verbatim-id pin as the byte arm: an imported public
        # Unigram artifact's positional ids are honored, never
        # re-derived piece-asc
        vocab_ids, unk_id = None, _ug.UNK_PIECE_ID
        if prov.get("vocab_source") == "hf_import":
            vocab_ids = [
                (r["piece"], r["piece_id"])
                for r in self.vocab(gen).select("piece", "piece_id").collect()
            ]
            if prov.get("unk_id") is not None:
                unk_id = int(prov["unk_id"])
        pieces = self.pieces(gen)
        # the DP window must cover the longest piece; the manifest's
        # max_piece_len describes only the LATEST fit, so a pinned
        # older generation derives it from its own piece table (a
        # window >= the true max is exact — longer candidates simply
        # never match)
        if gen == man.get("generation"):
            mpl = int(man.get("max_piece_len", 4))
        else:
            mpl = max((len(p) for p, _ in pieces), default=1)
        return _ug.unigram_encode_corpus(
            df, pieces, text_col=text_col, id_col=id_col,
            max_piece_len=mpl,
            vocab_ids=vocab_ids, unk_id=unk_id,
        )

    def export_gpt2(
        self,
        out_dir: str,
        generation: int | None = None,
        special_tokens: tuple[str, ...] = ("<|endoftext|>",),
    ) -> dict[str, int]:
        """Write the stored byte tokenizer as public GPT-2
        ``vocab.json`` + ``merges.txt`` artifacts (the interchange a
        post-training inference stack loads — see
        :mod:`tokenizer_io`). Byte kind only."""
        from balboa_spark.operators import tokenizer_io

        if self.kind() != "byte":
            raise ValueError(
                f"export_gpt2 is the byte-BPE interchange; this store "
                f"is {self.kind()!r}"
            )
        vocab_ids, specials = self._pinned_export_ids(generation)
        return tokenizer_io.export_gpt2(
            self.merges(generation), out_dir, special_tokens,
            vocab_ids=vocab_ids, specials=specials,
        )

    def _pinned_export_ids(self, generation: int | None):
        """(vocab_ids, specials) for exporting an IMPORTED generation:
        encode() honors the imported artifact's ids verbatim (the
        vocab_source pin), so exports must write those same ids — a
        structural re-derivation would hand an inference stack a vocab
        that decodes this store's token ids to the wrong text. Returns
        (None, None) for engine-fit generations (structural ids)."""
        import json
        import os

        gen = self._resolve_gen(generation)
        ppath = os.path.join(self._gen_dir(gen), "provenance.json")
        if os.path.exists(ppath):
            # post-r15 generations carry their own provenance record,
            # so the answer is per-REQUESTED-generation regardless of
            # what the latest manifest says
            with open(ppath) as fh:
                prov = json.load(fh)
            if prov.get("vocab_source") not in ("gpt2_import", "hf_import"):
                return None, None
            vocab_ids = [
                (r["piece"], int(r["piece_id"]))
                for r in self.vocab(gen)
                .select("piece", "piece_id")
                .collect()
            ]
            return vocab_ids, dict(prov.get("special_tokens") or {})
        # pre-provenance generation dir: the top-level manifest is the
        # only record and it describes the LATEST generation only
        man = self._manifest()
        if gen != man.get("generation"):
            raise ValueError(
                "exporting a generation with no recorded id provenance "
                "(pre-provenance store, non-latest generation); "
                "re-import or export the latest generation"
            )
        if man.get("vocab_source") not in ("gpt2_import", "hf_import"):
            return None, None
        vocab_ids = [
            (r["piece"], int(r["piece_id"]))
            for r in self.vocab(gen)
            .select("piece", "piece_id")
            .collect()
        ]
        return vocab_ids, dict(man.get("special_tokens") or {})

    def import_gpt2(self, in_dir: str) -> list[tuple[str, str]]:
        """Commit a NEW byte generation from public GPT-2 artifacts.
        Merges come from ``merges.txt`` (file order); ids from
        ``vocab.json`` VERBATIM (real artifacts are not in this
        engine's structural order), persisted in the generation's id
        parquet and honored by :meth:`encode` via the
        ``vocab_source`` manifest pin. Special tokens (entries that
        no byte segmentation can produce) are recorded in the
        manifest, not the piece table."""
        import json
        import os

        from balboa_spark.operators import tokenizer_io

        merges, vocab_hex, specials = tokenizer_io.import_gpt2(in_dir)
        gen, gen_dir = self._start_fit("byte")
        with open(os.path.join(gen_dir, "merges.json"), "w") as fh:
            json.dump([list(m) for m in merges], fh)
        self.spark.createDataFrame(
            [(p, 0, i) for p, i in vocab_hex],
            "piece string, weight long, piece_id int",
        ).write.mode("overwrite").parquet(os.path.join(gen_dir, "vocab"))
        self._commit(gen, {
            "kind": "byte",
            "num_merges": len(merges),
            "vocab_source": "gpt2_import",
            "special_tokens": specials,
        })
        return merges

    def export_hf(
        self,
        out_path: str,
        generation: int | None = None,
        special_tokens: tuple[str, ...] = ("<|endoftext|>",),
        unk_piece: str = "<unk>",
    ) -> dict[str, int] | list[tuple[str, float]]:
        """Write the stored tokenizer as a single-file HF
        ``tokenizer.json``: a ByteLevel-BPE model for the byte kind
        (tokenizer_io.export_hf), a Unigram model — pieces +
        log-probs + unk handling, the SentencePiece-shaped
        interchange — for the unigram kind
        (tokenizer_io.export_hf_unigram). The word kind is
        engine-private (no public single-file schema for its
        whitespace-word BPE) and refuses."""
        from balboa_spark.operators import tokenizer_io

        k = self.kind()
        if k == "unigram":
            return self._export_hf_unigram(out_path, generation, unk_piece)
        if k == "wordpiece":
            # every wordpiece generation (imported OR engine-fit; the
            # kind is post-provenance, r16) stores an EXPLICIT id
            # table — export writes it verbatim either way
            gen = self._resolve_gen(generation)
            prov = self._gen_provenance(gen)
            man = self._manifest()
            vocab_ids = [
                (r["piece"], int(r["piece_id"]))
                for r in self.vocab(gen).select("piece", "piece_id").collect()
            ]
            params = {
                key: prov.get(key, man.get(key))
                for key in (
                    "unk_token",
                    "continuing_subword_prefix",
                    "max_input_chars_per_word",
                )
            }
            return tokenizer_io.export_hf_wordpiece(
                vocab_ids, params, out_path,
                specials=prov.get(
                    "special_tokens", man.get("special_tokens")
                ),
            )
        if k != "byte":
            raise ValueError(
                f"export_hf handles byte and unigram kinds; this store "
                f"is {k!r}"
            )
        vocab_ids, specials = self._pinned_export_ids(generation)
        return tokenizer_io.export_hf(
            self.merges(generation), out_path, special_tokens,
            vocab_ids=vocab_ids, specials=specials,
        )

    def _export_hf_unigram(
        self, out_path: str, generation: int | None, unk_piece: str
    ) -> list[tuple[str, float]]:
        """Unigram export arm: structural layout (UNK at 0 +
        piece-asc ids from 1 — exactly what unigram_encode_corpus
        emits) for engine-fit generations; the VERBATIM positional
        table for imported ones (the export_gpt2 id-pin convention —
        a re-derived layout would decode this store's ids to the
        wrong pieces on an external stack). Documented caveat: an
        imported SPECIAL token re-exports at score 0.0 (its original
        model-vocab score is not recorded — inert in practice, since
        segmentation never produces an added token; ids and the UNK
        row round-trip verbatim)."""
        import json
        import os

        from balboa_spark.operators import tokenizer_io

        gen = self._resolve_gen(generation)
        ppath = os.path.join(self._gen_dir(gen), "provenance.json")
        prov = None
        if os.path.exists(ppath):
            with open(ppath) as fh:
                prov = json.load(fh)
        elif gen == self._manifest().get("generation"):
            prov = self._manifest()
        else:
            raise ValueError(
                "exporting a generation with no recorded id provenance "
                "(pre-provenance store, non-latest generation); "
                "re-export the latest generation"
            )
        if prov.get("vocab_source") == "hf_import":
            rows = sorted(
                (
                    (r["piece"], float(r["logp"]), int(r["piece_id"]))
                    for r in self.vocab(gen).collect()
                ),
                key=lambda e: e[2],
            )
            unk_id = prov.get("unk_id")
            specials = dict(prov.get("special_tokens") or {})
            # re-insert the UNK and special entries at their recorded
            # positions so the positional table is dense again — the
            # UNK row verbatim from the imported artifact
            entries = {i: (p, lp) for p, lp, i in rows}
            if unk_id is not None:
                entries[int(unk_id)] = (
                    prov.get("unk_piece") or unk_piece,
                    float(
                        prov["unk_logp"]
                        if prov.get("unk_logp") is not None
                        else tokenizer_io.UNK_EXPORT_LOGP
                    ),
                )
            for tok, i in specials.items():
                entries.setdefault(int(i), (tok, 0.0))
            dense = [
                (p, lp, i) for i, (p, lp) in sorted(entries.items())
            ]
            return tokenizer_io.export_hf_unigram(
                [], out_path, vocab_entries=dense,
                unk_id=0 if unk_id is None else int(unk_id),
                specials=specials,
            )
        return tokenizer_io.export_hf_unigram(
            self.pieces(gen), out_path, unk_piece=unk_piece
        )

    def import_hf(
        self, in_path: str
    ) -> list[tuple[str, str]] | list[tuple[str, float]]:
        """Commit a NEW generation from an HF ``tokenizer.json``,
        dispatched on ``model.type``: BPE lands in the byte arm (the
        :meth:`import_gpt2` contract — verbatim ids via the
        ``vocab_source`` manifest pin, specials in the manifest);
        Unigram lands in the unigram arm (verbatim positional ids +
        the artifact's ``unk_id``). Kinds never mix within one store
        path (:meth:`_start_fit` enforces it)."""
        import json
        import os

        from balboa_spark.operators import tokenizer_io

        with open(in_path, encoding="utf-8") as fh:
            mtype = (json.load(fh).get("model") or {}).get("type")
        if mtype == "Unigram":
            return self._import_hf_unigram(in_path)
        if mtype == "WordPiece":
            return self._import_hf_wordpiece(in_path)

        merges, vocab_hex, specials = tokenizer_io.import_hf(in_path)
        gen, gen_dir = self._start_fit("byte")
        with open(os.path.join(gen_dir, "merges.json"), "w") as fh:
            json.dump([list(m) for m in merges], fh)
        self.spark.createDataFrame(
            [(p, 0, i) for p, i in vocab_hex],
            "piece string, weight long, piece_id int",
        ).write.mode("overwrite").parquet(os.path.join(gen_dir, "vocab"))
        self._commit(gen, {
            "kind": "byte",
            "num_merges": len(merges),
            "vocab_source": "hf_import",
            "special_tokens": specials,
        })
        return merges

    def _import_hf_unigram(self, in_path: str) -> list[tuple[str, float]]:
        import json
        import os

        from balboa_spark.operators import tokenizer_io

        entries, unk, specials = tokenizer_io.import_hf_unigram(in_path)
        if not entries:
            raise ValueError(
                f"import_hf: {in_path} has an empty Unigram piece table"
            )
        pieces = [(p, lp) for p, lp, _ in entries]
        gen, gen_dir = self._start_fit("unigram")
        with open(os.path.join(gen_dir, "pieces.json"), "w") as fh:
            json.dump([[p, lp] for p, lp in pieces], fh)
        self.spark.createDataFrame(
            [(p, lp, i) for p, lp, i in entries],
            "piece string, logp double, piece_id int",
        ).write.mode("overwrite").parquet(os.path.join(gen_dir, "vocab"))
        self._commit(gen, {
            "kind": "unigram",
            "vocab_size": len(pieces),
            # the Viterbi DP window must cover the longest piece
            "max_piece_len": max(len(p) for p, _ in pieces),
            "vocab_source": "hf_import",
            "special_tokens": specials,
            # the artifact's UNK row verbatim, so a re-export
            # reproduces it instead of substituting a default
            "unk_id": None if unk is None else unk[2],
            "unk_piece": None if unk is None else unk[0],
            "unk_logp": None if unk is None else unk[1],
        })
        return pieces

    def fit_wordpiece(
        self,
        df: DataFrame,
        text_col: str = "text",
        num_merges: int = 16,
        min_pair_count: int = 2,
    ) -> list[tuple[str, str]]:
        """WordPiece arm (r16): train under the published likelihood
        rule (wordpiece.wordpiece_fit — merge argmax on
        count(ab)/(count(a)*count(b))) and persist the FINAL piece
        table with dense (weight DESC, piece) ids plus the default
        segmentation params; :meth:`encode`/:meth:`segment_col`
        dispatch to greedy longest-match over the stored vocab."""
        import json
        import os

        from balboa_spark.operators import wordpiece as _wp

        gen, gen_dir = self._start_fit("wordpiece")
        merges, vocab_ids = _wp.wordpiece_fit(
            df, num_merges=num_merges, min_pair_count=min_pair_count,
            text_col=text_col,
        )
        with open(os.path.join(gen_dir, "merges.json"), "w") as fh:
            json.dump([list(m) for m in merges], fh)
        self.spark.createDataFrame(
            [(p, 0, i) for p, i in vocab_ids],
            "piece string, weight long, piece_id int",
        ).write.mode("overwrite").parquet(os.path.join(gen_dir, "vocab"))
        self._commit(gen, {
            "kind": "wordpiece",
            "num_merges": len(merges),
            "vocab_size": len(vocab_ids),
            "text_col": text_col,
            "min_pair_count": min_pair_count,
            "unk_token": "[UNK]",
            "continuing_subword_prefix": "##",
            "max_input_chars_per_word": 100,
        })
        return merges

    def _import_hf_wordpiece(self, in_path: str) -> list[tuple[str, int]]:
        """Commit a NEW wordpiece generation from a BERT-family HF
        ``tokenizer.json`` (r16 — the third public interchange
        family): the id table VERBATIM, the segmentation params
        (unk / ## prefix / max word chars) in the manifest, specials
        recorded. :meth:`encode` dispatches to the greedy
        longest-match segmenter (operators/wordpiece.py)."""
        import os

        from balboa_spark.operators import tokenizer_io

        vocab_ids, params, specials = tokenizer_io.import_hf_wordpiece(
            in_path
        )
        gen, gen_dir = self._start_fit("wordpiece")
        self.spark.createDataFrame(
            [(p, 0, i) for p, i in vocab_ids],
            "piece string, weight long, piece_id int",
        ).write.mode("overwrite").parquet(os.path.join(gen_dir, "vocab"))
        self._commit(gen, {
            "kind": "wordpiece",
            "vocab_size": len(vocab_ids),
            "vocab_source": "hf_import",
            "special_tokens": specials,
            **params,
        })
        return vocab_ids


#: id emitted for a piece absent from the vocabulary (possible only
#: when encoding a corpus whose charset was unseen at fit time) — an
#: explicit sentinel, NOT a silent drop: collect_list skips NULLs, so
#: a NULL id would shorten the sequence invisibly.
UNK_PIECE_ID = -1


def encode_corpus(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words: DataFrame | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """Corpus → (id, piece_ids array<int>): segment every alnum token
    under the merge list and map pieces to dense ids via one broadcast
    LEFT join against the (piece, piece_id) vocabulary. A piece absent
    from the vocab (a character unseen at fit time — the fit-on-A,
    encode-on-B production shape) becomes :data:`UNK_PIECE_ID`, so the
    sequence keeps its true length instead of silently losing tokens.
    The explode keeps per-row state bounded; the regroup restores
    token order positionally. Segmentation cost is paid once per
    DISTINCT word (the fold/Arrow path runs on the vocabulary-sized
    distinct relation, not the token stream) and joins back by word.

    ``words``: an optional precomputed relation with a ``word`` column
    covering every WORD_RE token of the corpus (e.g. a checkpointed
    :func:`word_histogram`). When given, the distinct-word relation
    derives from it instead of re-aggregating the token stream —
    a caller encoding the SAME corpus under several merge lists (the
    drift report) pays the distinct Exchange once, not per encode.
    The word set must cover the corpus exactly (word_histogram does,
    by construction: same tokenizer, same WORD_RE filter); an
    uncovered word FAILS LOUDLY (left join + raise_error, r17 — a
    histogram from a different corpus or text column can never
    silently shorten encodings).

    ``tokens_col``: optional pre-tokenized array column holding
    EXACTLY ``text.tokens(text_col)`` — a caller encoding the same
    staged corpus twice (the drift report) tokenizes once; identical
    by construction (the WORD_RE filter still applies here)."""
    tk = (
        F.col(tokens_col) if tokens_col is not None
        else tokens(F.col(text_col))
    )
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(tk, lambda w: w.rlike(WORD_RE))
        ).alias("_wpos", "_word"),
    )
    distinct_words = (
        words.select(F.col("word").alias("_word"))
        if words is not None
        else toks.select("_word").distinct()
    )
    seg = distinct_words.select(
        "_word", segment_any(F.col("_word"), merges).alias("_pieces")
    )
    if words is not None:
        # coverage assertion, zero-cost when covered: NULL _pieces
        # (word absent from `words`) raises instead of vanishing in
        # the posexplode below
        pieces_col = F.coalesce(
            F.col("_pieces"),
            F.raise_error(
                F.concat(
                    F.lit("encode_corpus: words= does not cover token "),
                    F.col("_word"),
                )
            ),
        )
        joined = toks.join(seg, "_word", "left")
    else:
        pieces_col = F.col("_pieces")
        joined = toks.join(seg, "_word")
    pieces = (
        joined
        .select(
            F.col(id_col),
            "_wpos",
            F.posexplode(pieces_col).alias("_ppos", "piece"),
        )
    )
    mapped = pieces.join(
        F.broadcast(vocab.select("piece", "piece_id")), "piece", "left"
    ).withColumn(
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


def vocab_table(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    hist: DataFrame | None = None,
) -> DataFrame:
    """The tokenizer's second artifact: the piece vocabulary with
    dense integer ids, (piece, weight, piece_id), id 0 = heaviest.
    Weight is the piece's total corpus occurrences (word count x
    per-word piece multiplicity).

    The ranking window is unpartitioned BY DESIGN and safe at any
    corpus scale: the piece set is structurally bounded by
    |initial character set| + len(merges) distinct values (every
    merge mints exactly one new piece), so the windowed relation is
    parameter-sized — never corpus- or vocab-sized.

    ``hist``: optional precomputed :func:`word_histogram` relation
    (word, cnt) — pass a checkpointed one when deriving several
    vocabularies over the same corpus (the histogram is
    merge-list-invariant, so the corpus pass is shareable)."""
    from pyspark.sql import Window

    pieces = (
        (word_histogram(df, text_col) if hist is None else hist)
        .select(
            "cnt", F.explode(segment_any(F.col("word"), merges)).alias("piece")
        )
        .groupBy("piece")
        .agg(F.sum("cnt").alias("weight"))
    )
    w = Window.orderBy(F.col("weight").desc(), "piece")
    return pieces.select(
        "piece",
        "weight",
        (F.row_number().over(w) - 1).alias("piece_id"),
    )


def tokenizer_diff(
    store: "TokenizerStore",
    docs: DataFrame,
    gen_a: int | None = None,
    gen_b: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Generation drift report: what changed between two retained
    tokenizer fits, and how much it perturbs encodings — the
    pre-flight check before pointing a training pipeline at a re-fit
    tokenizer (a vocab that LOOKS similar can still renumber ids or
    re-segment common words, silently invalidating every cached
    token count and packed shard downstream).

    Defaults: ``gen_a`` = previous retained generation, ``gen_b`` =
    latest. One row: generations, piece-table delta (added / removed
    / re-identified — same piece string, different id), and encode
    drift over ``docs`` (documents compared, fraction identical,
    total tokens under each generation).

    Scale shape: the piece tables are parameter-sized collects; the
    encode drift is two encode passes + ONE id-keyed equi-join + one
    aggregate. Run it on a SAMPLE (``corpus.hash_sample``) — the
    report is an estimate, not a corpus pass.
    """
    gens = store.generations()
    if gen_b is None:
        gen_b = gens[-1]
    if gen_a is None:
        if len(gens) < 2:
            raise ValueError(
                f"tokenizer_diff: only {gens} retained — need two "
                "generations (or pass gen_a/gen_b explicitly)"
            )
        gen_a = gens[-2]
    va = {
        r["piece"]: int(r["piece_id"])
        for r in store.vocab(gen_a).select("piece", "piece_id").collect()
    }
    vb = {
        r["piece"]: int(r["piece_id"])
        for r in store.vocab(gen_b).select("piece", "piece_id").collect()
    }
    if store.kind() == "word":
        # r17: the two encode passes share ONE staged token stream and
        # ONE word histogram (both generation-invariant) instead of
        # each re-tokenizing the corpus and re-aggregating its distinct
        # words — the q_tokenizer_drift sharing applied to the
        # store-backed report. The token array is doc-sized
        # (tokenizer_diff's contract is a SAMPLE, see above), the
        # histogram covers the staged stream by construction, and
        # encode_corpus raises on any coverage gap rather than
        # dropping tokens.
        staged = docs.select(
            F.col(id_col), tokens(F.col(text_col)).alias("_tk")
        ).localCheckpoint(eager=True)
        hist = word_histogram(staged, tokens_col="_tk").localCheckpoint(
            eager=True
        )
        ea = store.encode(
            staged, id_col=id_col, generation=gen_a,
            words=hist, tokens_col="_tk",
        )
        eb = store.encode(
            staged, id_col=id_col, generation=gen_b,
            words=hist, tokens_col="_tk",
        )
    else:
        ea = store.encode(
            docs, text_col=text_col, id_col=id_col, generation=gen_a
        )
        eb = store.encode(
            docs, text_col=text_col, id_col=id_col, generation=gen_b
        )
    return tokenizer_diff_frames(
        docs.sparkSession, va, vb, ea, eb,
        gen_a=int(gen_a), gen_b=int(gen_b), id_col=id_col,
    )


def tokenizer_diff_frames(
    spark,
    va: dict,
    vb: dict,
    ea: DataFrame,
    eb: DataFrame,
    gen_a: int = 0,
    gen_b: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Store-free relational core of :func:`tokenizer_diff` (split out
    r16 so the drift report is driver-gradeable — the
    `corpus_tokenizer_drift` entry feeds it pinned-merge vocab/encode
    relations the DuckDB oracle can replay). ``va``/``vb`` are
    piece -> id dicts (parameter-sized); ``ea``/``eb`` are encode
    relations (id, piece_ids)."""
    added = len(set(vb) - set(va))
    removed = len(set(va) - set(vb))
    renumbered = sum(
        1 for p in set(va) & set(vb) if va[p] != vb[p]
    )
    j = ea.alias("a").join(
        eb.alias("b"), F.col(f"a.{id_col}") == F.col(f"b.{id_col}")
    )
    row = j.agg(
        F.count(F.lit(1)).alias("docs_compared"),
        F.sum(
            F.when(
                F.col("a.piece_ids") == F.col("b.piece_ids"), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("docs_identical"),
        F.sum(F.size("a.piece_ids")).alias("tokens_a"),
        F.sum(F.size("b.piece_ids")).alias("tokens_b"),
    )
    meta = spark.createDataFrame(
        [(int(gen_a), int(gen_b), added, removed, renumbered)],
        "gen_a int, gen_b int, pieces_added int, pieces_removed int, "
        "pieces_renumbered int",
    )
    return meta.crossJoin(row)
