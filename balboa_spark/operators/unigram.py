"""Unigram-LM (SentencePiece-style) tokenizer: seed vocab, EM fit,
and a cross-engine Viterbi segmenter.

Kudo 2018 ("Subword Regularization", §3 — public algorithm): model a
word as the max-probability concatenation of vocabulary pieces under a
unigram piece distribution; FIT the distribution by EM over all
segmentations; SEGMENT by Viterbi. This completes the engine's
tokenizer family (word-level BPE, byte-level BPE, unigram LM) — the
three production tokenizer shapes.

Scale design (same discipline as operators/bpe.py):

- One corpus pass builds the word histogram; everything downstream is
  vocabulary-relational (Heaps' law) or parameter-sized (the piece
  table itself — bounded driver state).
- The E-step runs once per DISTINCT word (an Arrow pandas_udf doing
  per-word forward-backward — the designated Python seam, vocabulary
  broadcast in the closure), weighted by word count relationally; the
  M-step is one groupBy(piece) sum. No driver-side loops over data.
- SEGMENTATION under a FIXED vocab is a pure Column program: a
  forward DP fold (F.aggregate over the position sequence, array
  accumulator of (score, backptr) structs) + a backward
  reconstruction fold — no UDF, no shuffle, and the DuckDB twin
  (:func:`viterbi_sql`) replays it expression-for-expression, so the
  driver oracle grades the DP itself.
- Ties in the DP break to the HIGHEST backpointer (the shortest
  final piece) — max over (score, bp) structs, identical
  lexicographic struct comparison in Spark and DuckDB.

Pieces come from lowercased ``^[a-z0-9]+$`` words (the word-BPE
alphabet contract), so every piece is literal-safe in both engines.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from balboa_spark.operators.bpe import WORD_RE, word_histogram

#: log-prob assigned to a single character absent from the vocabulary
#: (fit-on-A / segment-on-B): keeps Viterbi total instead of undefined.
UNK_LOGP = -20.0

#: fixed rounding of piece log-probs — pinned literals stay short and
#: the DP's float trajectory is identical across engines.
LOGP_DP = 6


def seed_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    top_m: int = 64,
) -> DataFrame:
    """(piece, freq): every substring of length 1..max_piece_len of
    every vocab word, weighted by word count; the top_m multi-char
    pieces by (freq desc, piece asc) UNION all single characters
    (closure: any alnum word stays segmentable). One vocab-sized
    explode, one groupBy — never corpus-cardinality on the driver."""
    words = word_histogram(df, text_col)
    subs = words.select(
        "cnt",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(int(max_piece_len)),
                                F.length("word") - i + 1,
                            ),
                        ),
                        lambda le: F.col("word").substr(i, le),
                    ),
                )
            )
        ).alias("piece"),
    )
    freq = subs.groupBy("piece").agg(F.sum("cnt").alias("freq"))
    chars = freq.filter(F.length("piece") == 1)
    multi = (
        freq.filter(F.length("piece") >= 2)
        .orderBy(F.col("freq").desc(), "piece")
        .limit(int(top_m))
    )
    return chars.unionByName(multi)


def _fb_expected(word: str, vocab: dict[str, float], max_len: int) -> list:
    """Forward-backward expected piece counts over ALL segmentations
    of one word (log-space-free: probs are tiny but words are short;
    use plain floats with underflow-safe scaling via max-shift)."""
    n = len(word)
    # alpha[i] = total prob of prefix i; beta[i] = of suffix from i
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        a = 0.0
        for j in range(max(0, i - max_len), i):
            p = vocab.get(word[j:i])
            if p is not None and alpha[j] > 0.0:
                a += alpha[j] * p
        alpha[i] = a
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        b = 0.0
        for j in range(i + 1, min(n, i + max_len) + 1):
            p = vocab.get(word[i:j])
            if p is not None and beta[j] > 0.0:
                b += p * beta[j]
        beta[i] = b
    z = alpha[n]
    if z <= 0.0:
        return []
    out: dict[str, float] = {}
    for i in range(n):
        for j in range(i + 1, min(n, i + max_len) + 1):
            piece = word[i:j]
            p = vocab.get(piece)
            if p is not None:
                e = alpha[i] * p * beta[j] / z
                if e > 0.0:
                    out[piece] = out.get(piece, 0.0) + e
    return list(out.items())


def unigram_fit(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 48,
    max_piece_len: int = 4,
    seed_m: int = 64,
    em_iters: int = 2,
    prune_per_iter: float = 0.25,
) -> list[tuple[str, float]]:
    """Learn a unigram piece distribution: seed -> (EM round + prune
    worst multi-char pieces) x em_iters -> final M-step. Returns
    [(piece, logp)] sorted (piece asc), logp rounded to LOGP_DP —
    bounded driver state, the tokenizer artifact.

    Per round: ONE Arrow pass over the DISTINCT-word relation
    (expected counts), one relational M-step. Pruning drops the
    bottom ``prune_per_iter`` fraction of multi-char pieces by
    probability (ties: piece desc dropped first) but never below
    ``vocab_size`` and never a single char (closure)."""
    words = word_histogram(df, text_col).localCheckpoint(eager=True)
    seed = {
        r["piece"]: float(r["freq"])
        for r in seed_vocab(df, text_col, max_piece_len, seed_m).collect()
    }
    tot = sum(seed.values())
    vocab = {p: f / tot for p, f in seed.items()}

    def em_round(cur: dict[str, float]) -> dict[str, float]:
        items = sorted(cur.items())
        pieces, probs = [p for p, _ in items], [pr for _, pr in items]

        from pyspark.sql.functions import pandas_udf

        vmap = dict(zip(pieces, probs))

        @pandas_udf("array<struct<piece:string,e:double>>")
        def _estep(ws: pd.Series) -> pd.Series:
            return ws.map(
                lambda w: [
                    {"piece": p, "e": e}
                    for p, e in _fb_expected(w, vmap, max_piece_len)
                ]
            )

        counts = (
            words.select("cnt", _estep("word").alias("_es"))
            .select("cnt", F.explode("_es").alias("pe"))
            .groupBy(F.col("pe.piece").alias("piece"))
            .agg(F.sum(F.col("pe.e") * F.col("cnt")).alias("c"))
            .collect()
        )
        total = sum(r["c"] for r in counts)
        return {r["piece"]: r["c"] / total for r in counts if r["c"] > 0}

    for _ in range(em_iters):
        vocab = em_round(vocab)
        multi = sorted(
            ((pr, p) for p, pr in vocab.items() if len(p) >= 2),
        )
        n_drop = min(
            int(len(multi) * prune_per_iter),
            max(0, len(vocab) - int(vocab_size)),
        )
        for _, p in multi[:n_drop]:
            del vocab[p]
    vocab = em_round(vocab)
    return sorted((p, round(math.log(pr), LOGP_DP)) for p, pr in vocab.items())


def word_histogram_by_group(
    df: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """(_g, word, cnt): the one corpus-sized pass of the per-group fit
    — :func:`bpe.word_histogram` with the group key carried through.
    NULL-group rows are dropped (no language id -> no per-language
    tokenizer; route through LID first)."""
    from balboa_spark.operators.bpe import tokens

    return (
        df.filter(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).cast("string").alias("_g"),
            F.explode(tokens(F.col(text_col))).alias("word"),
        )
        .filter(F.col("word").rlike(WORD_RE))
        .groupBy("_g", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def unigram_fit_by_group(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    vocab_size: int = 48,
    max_piece_len: int = 4,
    seed_m: int = 64,
    em_iters: int = 2,
    prune_per_iter: float = 0.25,
) -> dict[str, list[tuple[str, float]]]:
    """ONE unigram piece distribution per group, fit in a single
    relational plan — the per-language twin of
    :func:`bpe.byte_bpe_fit_by_group` (CCNet trains per-language
    models; Wenzek et al. 2020). Per EM round: ONE Arrow pass over the
    DISTINCT (group, word) relation — the pandas_udf receives both
    columns and selects the group's piece distribution from a
    broadcast dict-of-dicts — and one groupBy(_g, piece) M-step whose
    result (|G| x |V| rows, the per-group tokenizer artifacts) is the
    only driver-collected state. Seeding, normalization, and pruning
    run per group with the same rules as :func:`unigram_fit`, so the
    result equals the ungrouped fit applied to each slice (pinned by
    test)."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    words = word_histogram_by_group(df, group_col, text_col).localCheckpoint(
        eager=True
    )
    subs = words.select(
        "_g",
        "cnt",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(int(max_piece_len)),
                                F.length("word") - i + 1,
                            ),
                        ),
                        lambda le: F.col("word").substr(i, le),
                    ),
                )
            )
        ).alias("piece"),
    )
    freq = subs.groupBy("_g", "piece").agg(F.sum("cnt").alias("freq"))
    wm = Window.partitionBy("_g").orderBy(F.col("freq").desc(), "piece")
    seed_rows = (
        freq.filter(F.length("piece") == 1)
        .unionByName(
            freq.filter(F.length("piece") >= 2)
            .withColumn("_rn", F.row_number().over(wm))
            .filter(F.col("_rn") <= int(seed_m))
            .drop("_rn")
        )
        .collect()
    )
    raw: dict[str, dict[str, float]] = {}
    for r in seed_rows:
        raw.setdefault(r["_g"], {})[r["piece"]] = float(r["freq"])
    vocab = {
        g: {p: f / tot for p, f in d.items()}
        for g, d in raw.items()
        for tot in [sum(d.values())]
    }

    def em_round(
        cur: dict[str, dict[str, float]],
    ) -> dict[str, dict[str, float]]:
        vmaps = {g: dict(d) for g, d in cur.items()}

        @pandas_udf("array<struct<piece:string,e:double>>")
        def _estep(gs: pd.Series, ws: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    [
                        {"piece": p, "e": e}
                        for p, e in _fb_expected(
                            w, vmaps.get(g, {}), max_piece_len
                        )
                    ]
                    for g, w in zip(gs, ws)
                ]
            )

        counts = (
            words.select("_g", "cnt", _estep("_g", "word").alias("_es"))
            .select("_g", "cnt", F.explode("_es").alias("pe"))
            .groupBy("_g", F.col("pe.piece").alias("piece"))
            .agg(F.sum(F.col("pe.e") * F.col("cnt")).alias("c"))
            .collect()
        )
        out: dict[str, dict[str, float]] = {}
        totals: dict[str, float] = {}
        for r in counts:
            if r["c"] > 0:
                out.setdefault(r["_g"], {})[r["piece"]] = r["c"]
                totals[r["_g"]] = totals.get(r["_g"], 0.0) + r["c"]
        return {
            g: {p: c / totals[g] for p, c in d.items()}
            for g, d in out.items()
        }

    for _ in range(em_iters):
        vocab = em_round(vocab)
        for d in vocab.values():
            multi = sorted((pr, p) for p, pr in d.items() if len(p) >= 2)
            n_drop = min(
                int(len(multi) * prune_per_iter),
                max(0, len(d) - int(vocab_size)),
            )
            for _, p in multi[:n_drop]:
                del d[p]
    vocab = em_round(vocab)
    return {
        g: sorted((p, round(math.log(pr), LOGP_DP)) for p, pr in d.items())
        for g, d in vocab.items()
    }


# -- Viterbi segmentation: cross-engine DP folds ----------------------------

def _vocab_map(vocab: list[tuple[str, float]]) -> Column:
    return F.create_map(
        *[x for p, lp in vocab for x in (F.lit(p), F.lit(float(lp)))]
    )


def viterbi_forward(
    word: Column, vocab: list[tuple[str, float]], max_piece_len: int
) -> Column:
    """Forward DP as ONE F.aggregate over the position sequence:
    accumulator = array of (s, bp) structs, element p+1 = best score /
    backpointer for the length-p prefix. Candidates at position i are
    pieces ending at i with length <= max_piece_len; unknown single
    chars score UNK_LOGP (totality); ties break to the highest bp
    (max over (s, bp) structs — identical in DuckDB)."""
    m = _vocab_map(vocab)
    L = int(max_piece_len)

    def lookup(piece: Column, length: Column) -> Column:
        return F.coalesce(
            F.element_at(m, piece),
            F.when(length == 1, F.lit(float(UNK_LOGP))),
        )

    def step(acc: Column, i: Column) -> Column:
        cands = F.filter(
            F.transform(
                F.sequence(F.greatest(F.lit(1), i - F.lit(L) + 1), i),
                lambda j: F.struct(
                    (
                        F.element_at(acc, j)["s"]
                        + lookup(word.substr(j, i - j + 1), i - j + 1)
                    ).alias("s"),
                    (j - 1).alias("bp"),
                ),
            ),
            lambda c: c["s"].isNotNull(),
        )
        return F.concat(acc, F.array(F.array_max(cands)))

    init = F.array(F.struct(F.lit(0.0).alias("s"), F.lit(0).alias("bp")))
    return F.aggregate(F.sequence(F.lit(1), F.length(word)), init, step)


def viterbi_pieces(word: Column, fwd: Column) -> Column:
    """Backward reconstruction from a FORWARD COLUMN REFERENCE (pass
    a materialized column, not the forward expression — referencing
    the fold expression three times would clone its whole tree, the
    bpe single-reference lesson): walk backpointers from the full
    length, prepending each piece."""
    n = F.length(word)
    init = F.struct(
        n.alias("pos"), F.array().cast("array<string>").alias("parts")
    )

    def step(acc: Column, _) -> Column:
        bp = F.element_at(fwd, acc["pos"] + 1)["bp"]
        return F.when(
            acc["pos"] > 0,
            F.struct(
                bp.alias("pos"),
                F.concat(
                    F.array(word.substr(bp + 1, acc["pos"] - bp)),
                    acc["parts"],
                ).alias("parts"),
            ),
        ).otherwise(acc)

    return F.aggregate(F.sequence(F.lit(1), n), init, step)["parts"]


#: vocab-size ceiling for the Column-fold Viterbi: the piece-logprob
#: MAP LITERAL is one expression node per entry, so a production
#: 32k-256k-piece vocabulary would build an unanalyzable plan — the
#: unigram twin of bpe.ARROW_MERGE_THRESHOLD. Above this,
#: segmentation switches to the Arrow batch path.
ARROW_VOCAB_THRESHOLD = 512


def _viterbi_py(
    word: str, vmap: dict[str, float], max_len: int
) -> tuple[list[str], float]:
    """EXACT Python twin of the Column DP (same candidate order, same
    additions, same tie rule: equal scores break to the HIGHEST
    backpointer = shortest final piece), for the Arrow path."""
    n = len(word)
    best = [0.0] + [None] * n  # type: ignore[list-item]
    bp = [0] * (n + 1)
    for i in range(1, n + 1):
        b_s, b_j = None, None
        for j in range(max(1, i - max_len + 1), i + 1):
            piece = word[j - 1:i]
            lp = vmap.get(piece)
            if lp is None and len(piece) == 1:
                lp = UNK_LOGP
            if lp is None or best[j - 1] is None:
                continue
            s = best[j - 1] + lp
            # max over (s, bp=j-1): ties -> highest j-1
            if b_s is None or s > b_s or (s == b_s and j - 1 > b_j):
                b_s, b_j = s, j - 1
        best[i], bp[i] = b_s, b_j
    parts: list[str] = []
    pos = n
    while pos > 0:
        parts.append(word[bp[pos]:pos])
        pos = bp[pos]
    parts.reverse()
    return parts, best[n]


def viterbi_segment_arrow(
    word: Column, vocab: list[tuple[str, float]], max_piece_len: int
) -> Column:
    """Arrow-batched Viterbi for production-sized vocabularies — the
    designated pandas_udf seam (the vocab rides the closure,
    task-broadcast once per executor; 256k pieces is a few MB).
    Returns struct(pieces array<string>, logp double), logp rounded
    like the Column path; parity-tested against the fold."""
    from pyspark.sql.functions import pandas_udf

    vmap = {p: float(lp) for p, lp in vocab}
    L = int(max_piece_len)

    @pandas_udf("struct<pieces:array<string>,logp:double>")
    def _seg(words: pd.Series) -> pd.DataFrame:
        out = words.map(lambda w: _viterbi_py(w, vmap, L))
        return pd.DataFrame(
            {
                "pieces": out.map(lambda t: t[0]),
                "logp": out.map(lambda t: round(t[1], LOGP_DP)),
            }
        )

    return _seg(word)


def unigram_segment_words(
    df: DataFrame,
    vocab: list[tuple[str, float]],
    text_col: str = "text",
    max_piece_len: int = 4,
    top_n: int | None = None,
) -> DataFrame:
    """Corpus vocabulary segmented under a fixed unigram vocab:
    (word, cnt, pieces [space-joined], n_pieces, logp) heaviest-first.
    Column-fold DP up to ARROW_VOCAB_THRESHOLD pieces (the
    oracle-replayable path), Arrow batch above it. Two staged
    projections keep the fold plan single-reference: the forward fold
    materializes as a column, the backward fold and the final score
    read that column."""
    words = word_histogram(df, text_col)
    if top_n is not None:
        words = words.orderBy(F.col("cnt").desc(), "word").limit(int(top_n))
    if len(vocab) > ARROW_VOCAB_THRESHOLD:
        seg = words.select(
            "word",
            "cnt",
            viterbi_segment_arrow(
                F.col("word"), vocab, max_piece_len
            ).alias("_sg"),
        )
        out = seg.select(
            "word",
            "cnt",
            F.concat_ws(" ", F.col("_sg.pieces")).alias("pieces"),
            F.col("_sg.logp").alias("logp"),
        )
    else:
        staged = words.select(
            "word",
            "cnt",
            viterbi_forward(F.col("word"), vocab, max_piece_len).alias("_fwd"),
        )
        out = staged.select(
            "word",
            "cnt",
            F.concat_ws(
                " ", viterbi_pieces(F.col("word"), F.col("_fwd"))
            ).alias("pieces"),
            F.round(F.element_at("_fwd", -1)["s"], LOGP_DP).alias("logp"),
        )
    return out.select(
        "word",
        "cnt",
        "pieces",
        F.size(F.split("pieces", " ")).alias("n_pieces"),
        "logp",
    ).orderBy(F.col("cnt").desc(), "word")


#: id reserved for an unseen single character (the UNK piece); real
#: pieces get ids 1.. in vocab (piece asc) order.
UNK_PIECE_ID = 0


def unigram_encode_corpus(
    df: DataFrame,
    vocab: list[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
    vocab_ids: list[tuple[str, int]] | None = None,
    unk_id: int = UNK_PIECE_ID,
) -> DataFrame:
    """Corpus → (id, piece_ids array<int>) under the unigram vocab:
    Viterbi-segment once per DISTINCT word (the fold runs on the
    vocabulary-sized relation, never the token stream), join back by
    word, map pieces to dense ids via a parameter-sized broadcast
    (vocab order = piece asc, ids from 1; unseen single chars —
    scored UNK_LOGP by the DP — map to UNK_PIECE_ID so sequences keep
    their true length). ``vocab_ids``/``unk_id`` override the
    structural ids with an imported artifact's VERBATIM table (the
    byte_encode_corpus vocab_ids convention — a store imported from a
    public Unigram tokenizer.json must emit the artifact's ids, not
    re-derived piece-asc ones). Same distributed shape as
    bpe.encode_corpus / byte_encode_corpus."""
    from balboa_spark.operators.bpe import WORD_RE as _WR
    from balboa_spark.operators.text import tokens

    spark = df.sparkSession
    idmap = spark.createDataFrame(
        vocab_ids
        if vocab_ids is not None
        else [(p, i + 1) for i, (p, _) in enumerate(sorted(vocab))],
        "piece string, piece_id int",
    )
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(tokens(F.col(text_col)), lambda w: w.rlike(_WR))
        ).alias("_wpos", "_word"),
    )
    distinct_words = toks.select("_word").distinct()
    if len(vocab) > ARROW_VOCAB_THRESHOLD:
        seg = distinct_words.select(
            "_word",
            viterbi_segment_arrow(
                F.col("_word"), vocab, max_piece_len
            )["pieces"].alias("_pieces"),
        )
    else:
        staged = distinct_words.select(
            "_word",
            viterbi_forward(F.col("_word"), vocab, max_piece_len).alias("_fwd"),
        )
        seg = staged.select(
            "_word",
            viterbi_pieces(F.col("_word"), F.col("_fwd")).alias("_pieces"),
        )
    pieces = toks.join(seg, "_word").select(
        F.col(id_col), "_wpos", F.posexplode("_pieces").alias("_ppos", "piece")
    )
    mapped = pieces.join(F.broadcast(idmap), "piece", "left").withColumn(
        "piece_id", F.coalesce("piece_id", F.lit(int(unk_id)))
    )
    return mapped.groupBy(id_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("_wpos", "_ppos", "piece_id"))
            ),
            lambda s: s["piece_id"],
        ).alias("piece_ids")
    )


def viterbi_sql(
    word_expr: str,
    vocab: list[tuple[str, float]] | None,
    max_piece_len: int,
    case_col: str | None = None,
    case_vocabs: dict[str, list[tuple[str, float]]] | None = None,
) -> tuple[str, str, str]:
    """The DuckDB twin: (fwd_expr, trail_expr, pieces_expr, logp_expr)
    — fwd computes the forward (s, bp) table over ``word_expr``;
    trail assumes columns ``word`` and ``fwd``; pieces assumes
    ``word`` and ``tr``; logp assumes ``word`` and ``fwd``. Stage each
    as its own MATERIALIZED CTE column (the engine's staged
    single-reference shape — see the trail note below for why).
    list_reduce has first-element seeding only, so both folds prepend
    their seed to a same-typed position list (the BPE-oracle
    convention).

    ``case_col``/``case_vocabs``: per-group vocabularies selected by a
    CASE over the named column — ONE DP expression for every group.
    This exists because the alternative (one textually-identical DP
    block per group UNION ALLed) re-triggers the lambda cross-talk
    hazard documented at the trail note below ACROSS blocks: with five
    per-language blocks, DuckDB evaluated one block's trail against
    another block's word (reproduced: trail started at the wrong
    word's length). A single block has nothing to cross-talk with."""
    L = int(max_piece_len)

    def map_literal(v: list[tuple[str, float]]) -> str:
        keys = ", ".join(f"'{p}'" for p, _ in v)
        vals = ", ".join(f"CAST({lp!r} AS DOUBLE)" for _, lp in v)
        return f"map([{keys}], [{vals}])"

    if case_vocabs is not None:
        whens = " ".join(
            f"WHEN '{g}' THEN {map_literal(v)}"
            for g, v in sorted(case_vocabs.items())
        )
        vocab_map = f"(CASE {case_col} {whens} END)"
    else:
        vocab_map = map_literal(vocab)
    lookup = (
        f"coalesce(({vocab_map}"
        f"[substring({{w}}, j, x.i - j + 1)])[1], "
        f"CASE WHEN x.i - j + 1 = 1 THEN CAST({UNK_LOGP!r} AS DOUBLE) END)"
    )
    fwd = f"""list_reduce(
  list_prepend(
    struct_pack(i := 0, st := [struct_pack(s := CAST(0.0 AS DOUBLE), bp := 0)]),
    list_transform(range(1, length({word_expr}) + 1),
      k -> struct_pack(i := k, st := CAST(NULL AS STRUCT(s DOUBLE, bp INTEGER)[])))),
  (acc, x) -> struct_pack(i := x.i, st := list_append(acc.st,
    list_aggregate(
      list_filter(
        list_transform(range(greatest(1, x.i - {L} + 1), x.i + 1),
          j -> struct_pack(
            s := acc.st[j].s + {lookup.format(w=word_expr)},
            bp := j - 1)),
        c -> c.s IS NOT NULL),
      'max')))
).st"""
    # NB: the backward fold accumulates the POSITION TRAIL as a PLAIN
    # LIST whose last element is the current position, and the pieces
    # are cut OUTSIDE the fold. Two DuckDB lambda hazards drove this
    # shape (both reproduced, both plan-context-dependent): (a) a
    # struct_pack accumulator whose field rebinds a name a SIBLING
    # field also reads (pos := new; sibling reading acc.pos) evaluates
    # in an undefined order, and (b) referencing the same
    # list_transform lambda twice in one SELECT duplicates it through
    # CTE inlining and re-triggers (a). A single-field list
    # accumulator has no sibling fields to cross-talk and was verified
    # stable inline AND materialized. The trail ends in 0 once the
    # walk reaches the origin (the CASE stops appending).
    trail = """list_reduce(
  list_prepend(
    [length(word)],
    list_transform(range(1, length(word) + 1), k -> CAST(NULL AS INTEGER[]))),
  (acc, x) -> CASE WHEN acc[-1] > 0
              THEN list_append(acc, fwd[acc[-1] + 1].bp)
              ELSE acc END
)"""
    pieces = """list_reverse(list_transform(
  range(1, len(tr)),
  k -> substring(word, tr[k + 1] + 1, tr[k] - tr[k + 1])))"""
    logp = f"round(fwd[length(word) + 1].s, {LOGP_DP})"
    return fwd, trail, pieces, logp
