"""Suffix-array exact-substring audit of the three substring-dedup
proxies (README "passage_dedup vs suffix-array substring dedup"
deviation paragraph -> measured numbers).

Ground truth: Lee et al. 2022 exact substring dedup at threshold T
tokens, computed with a REAL suffix array (prefix doubling + Kasai
LCP) over the concatenated token stream. Keep-first semantics: for
every duplicated T-token window value, the occurrence with the
smallest global (doc, pos) is kept; every other occurrence marks its
[pos, pos+T) token range removed. Token-coverage equivalence: a token
lies inside a duplicated substring of length >= T iff it is covered by
a duplicated T-window, so this window-level ground truth removes
exactly the Lee et al. token set (attribution can differ only on
chimeric overlaps where a doc's span is stitched from several earlier
documents; attribution-only, does not change the removed set).

Audited operators (same corpus, same tokenization — operators/text.py
tokens()):
- span_dedup(span_tokens=T)      — claims EXACT window-level keep-first
- passage_dedup(passage_tokens=T)    — fixed grid, alignment-lucky
- passage_dedup_cdc(passage_tokens=T//2) — content-defined chunks

Each operator is additionally mirrored in pure Python (independent
md5-level reimplementation); the mirror's per-doc kept/removed counts
are asserted equal to the Spark output, so the positional
precision/recall below is measured on sets PROVEN consistent with the
distributed implementation, not on a lookalike.

Corpus: sf documents.parquet text, consecutive docs concatenated
CONCAT_N at a time (the raw rows average ~54 tokens — too short for a
T=50 audit), plus planted cross-doc spans at RANDOM token offsets
(the exact failure mode the fixed grid misses). Deterministic seed.

Usage: python scripts/substr_audit.py [sf_dir] [T]
Prints a JSON line with per-operator token-level precision/recall vs
the suffix-array ground truth; run numbers land in README.md.
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------- corpus


def tokenize(text: str) -> list[str]:
    # operators/text.py tokens(): whitespace split of lowercased text,
    # empties removed (Java \s+ and Python \s+ agree on this corpus).
    return [t for t in re.split(r"\s+", text.lower()) if t]


def build_corpus(sf_dir: str, concat_n: int = 8, seed: int = 0xA0D17) -> list[tuple[int, str]]:
    import duckdb

    rows = duckdb.connect().execute(
        f"select doc_id, text from read_parquet('{sf_dir}/documents.parquet') "
        "order by doc_id limit 4800"
    ).fetchall()
    docs = []
    for i in range(0, len(rows) - concat_n + 1, concat_n):
        text = " ".join(t for _, t in rows[i : i + concat_n] if t)
        docs.append([i // concat_n, tokenize(text)])
    rng = random.Random(seed)
    # plant: 10% donor docs each copy one 50..150-token span into two
    # later docs at arbitrary token offsets (grid-misaligned on purpose)
    n_planted = 0
    for d in rng.sample(range(len(docs) // 2), max(1, len(docs) // 10)):
        tk = docs[d][1]
        if len(tk) < 160:
            continue
        L = rng.randint(50, 150)
        s = rng.randrange(len(tk) - L)
        span = tk[s : s + L]
        for r in rng.sample(range(len(docs) // 2, len(docs)), 2):
            at = rng.randrange(len(docs[r][1]) + 1)
            docs[r][1] = docs[r][1][:at] + span + docs[r][1][at:]
            n_planted += 1
    out = [(i, " ".join(tk)) for i, tk in docs]
    print(f"[audit] corpus: {len(out)} docs, "
          f"{sum(len(t[1].split()) for t in out)} tokens, "
          f"{n_planted} planted span copies", file=sys.stderr)
    return out


# ------------------------------------------------- suffix-array ground truth


def suffix_array(a: np.ndarray) -> np.ndarray:
    """SA of int sequence a, prefix doubling, O(n log^2 n)."""
    n = len(a)
    rank = np.unique(a, return_inverse=True)[1].astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    tmp = np.empty(n, dtype=np.int64)
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        sa = order
        tmp[sa[0]] = 0
        prev = (rank[sa[1:]] != rank[sa[:-1]]) | (key2[sa[1:]] != key2[sa[:-1]])
        tmp[sa[1:]] = np.cumsum(prev)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def lcp_kasai(a: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """lcp[i] = LCP(suffix sa[i], suffix sa[i+1])."""
    n = len(a)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(max(n - 1, 0), dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r == n - 1:
            h = 0
            continue
        j = sa[r + 1]
        while i + h < n and j + h < n and a[i + h] == a[j + h]:
            h += 1
        lcp[r] = h
        if h:
            h -= 1
    return lcp


def ground_truth(docs: list[tuple[int, list[str]]], T: int):
    """Returns removed: set[(doc_id, tok_pos)].

    Concatenate doc token streams (doc-id order == span_dedup's
    keep-first order) with unique sentinels so no window straddles
    docs; group equal T-windows via SA runs with LCP >= T; non-first
    occurrences mark [p, p+T) removed.
    """
    vocab: dict[str, int] = {}
    seq: list[int] = []
    where: list[tuple[int, int]] = []  # global pos -> (doc_id, local pos)
    valid_start = []  # global positions where a T-window fits inside one doc
    for did, tk in docs:
        base = len(seq)
        for j, t in enumerate(tk):
            seq.append(vocab.setdefault(t, len(vocab)))
            where.append((did, j))
        for j in range(max(0, len(tk) - T + 1)):
            valid_start.append(base + j)
        seq.append(-len(seq) - 10**9)  # unique sentinel, never equal
        where.append((-1, -1))
    a = np.array(seq, dtype=np.int64)
    a = np.unique(a, return_inverse=True)[1]  # compact to non-negative
    sa = suffix_array(a)
    lcp = lcp_kasai(a, sa)
    valid = np.zeros(len(a), dtype=bool)
    valid[np.array(valid_start, dtype=np.int64)] = True

    removed: set[tuple[int, int]] = set()
    i = 0
    n = len(sa)
    while i < n:
        j = i
        while j < n - 1 and lcp[j] >= T:
            j += 1
        group = sorted(p for p in sa[i : j + 1] if valid[p])
        for p in group[1:]:  # every occurrence but the global first
            did, pos = where[p]
            for q in range(pos, pos + T):
                removed.add((did, q))
        i = j + 1
    return removed


# ------------------------------------------------------- python op mirrors


def md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def mirror_span(docs, T):
    """span_dedup: keep-first sliding windows (corpus.py:1163)."""
    first: dict[str, tuple[int, int]] = {}
    for did, tk in docs:
        for p in range(len(tk) - T + 1):
            h = md5(" ".join(tk[p : p + T]))
            if h not in first:
                first[h] = (did, p)
    removed = set()
    for did, tk in docs:
        for p in range(len(tk) - T + 1):
            h = md5(" ".join(tk[p : p + T]))
            if first[h] != (did, p):
                for q in range(p, p + T):
                    removed.add((did, q))
    return removed


def mirror_passage(docs, T, max_df=1):
    """passage_dedup: fixed grid, drop passages with doc-df > max_df
    (corpus.py:1084). Returns (removed_tokens, removed_passages_by_doc,
    n_passages_by_doc) so the Spark output's passage counts can be
    checked too."""
    from collections import defaultdict

    dfc = defaultdict(set)
    for did, tk in docs:
        for k in range(0, len(tk), T):
            dfc[md5(" ".join(tk[k : k + T]))].add(did)
    removed = set()
    rem_pass = defaultdict(int)
    n_pass = {}
    for did, tk in docs:
        n_pass[did] = (len(tk) + T - 1) // T
        for k in range(0, len(tk), T):
            if len(dfc[md5(" ".join(tk[k : k + T]))]) > max_df:
                rem_pass[did] += 1
                for q in range(k, min(k + T, len(tk))):
                    removed.add((did, q))
    return removed, dict(rem_pass), n_pass


def mirror_cdc(docs, P, g=4, max_df=1):
    """passage_dedup_cdc: content-defined double-span chunks, drop
    chunks with doc-df > max_df (corpus.py:1265)."""
    from collections import defaultdict

    thresh = format(16**8 // P, "08x")

    def chunks(tk):
        # boundary after i when md5 of the g-gram ending at i is under
        # the 1/P hex threshold; chunks partition the doc between
        # consecutive boundaries (corpus.py element_at(starts, j+2) is
        # 1-BASED = 0-based starts[j+1]), tail chunk runs to n.
        n = len(tk)
        bpos = []
        if n >= g:
            for i in range(g - 1, n - 1):
                if md5(" ".join(tk[i - g + 1 : i + 1]))[:8] < thresh:
                    bpos.append(i)
        starts = [0] + [i + 1 for i in bpos]
        return [
            (s, (starts[j + 1] if j + 1 < len(starts) else n) - s)
            for j, s in enumerate(starts)
        ]

    dfc = defaultdict(set)
    per_doc = {}
    for did, tk in docs:
        cs = chunks(tk)
        per_doc[did] = cs
        for s, L in cs:
            dfc[md5(" ".join(tk[s : s + L]))].add(did)
    removed = set()
    for did, tk in docs:
        for s, L in per_doc[did]:
            if len(dfc[md5(" ".join(tk[s : s + L]))]) > max_df:
                for q in range(s, s + L):
                    removed.add((did, q))
    return removed


# ----------------------------------------------------------------- spark run


def spark_counts(corpus, T):
    """Run the real operators; return per-op {doc_id: removed_count}."""
    from balboa_spark.operators.corpus import (
        passage_dedup,
        passage_dedup_cdc,
        span_dedup,
    )
    from balboa_spark.session import get_spark

    spark = get_spark("substr-audit")
    df = spark.createDataFrame(corpus, "doc_id long, text string").repartition(32)
    df = df.localCheckpoint(eager=True)
    out = {}
    sd = span_dedup(df, span_tokens=T).collect()
    out["span_dedup"] = {r.doc_id: r.n_removed for r in sd}
    pd_ = passage_dedup(df, passage_tokens=T).collect()
    out["passage_dedup_kept"] = {r.doc_id: r.n_kept for r in pd_}
    cdc = passage_dedup_cdc(df, passage_tokens=T // 2).collect()
    out["cdc_kept"] = {r.doc_id: r.n_kept_tokens for r in cdc}
    return out


def pr(removed_op, removed_gt):
    tp = len(removed_op & removed_gt)
    prec = tp / len(removed_op) if removed_op else 1.0
    rec = tp / len(removed_gt) if removed_gt else 1.0
    return round(prec, 4), round(rec, 4)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    corpus = build_corpus(sf_dir)
    docs = [(did, tokenize(text)) for did, text in corpus]

    gt = ground_truth(docs, T)
    m_span = mirror_span(docs, T)
    m_pass, rem_pass, n_pass = mirror_passage(docs, T)
    m_cdc = mirror_cdc(docs, T // 2)
    # independent-oracle check: suffix-array GT and the md5 window
    # mirror implement the same semantics two different ways
    assert m_span == gt, (
        f"SA ground truth != window mirror: {len(m_span ^ gt)} diffs"
    )

    sc = spark_counts(corpus, T)
    ndoc_tokens = {did: len(tk) for did, tk in docs}

    def by_doc(removed):
        from collections import Counter

        return Counter(did for did, _ in removed)

    # tie the mirrors to the real distributed outputs, doc by doc
    span_counts = by_doc(m_span)
    for did, n in ndoc_tokens.items():
        if did in sc["span_dedup"]:
            assert sc["span_dedup"][did] == span_counts.get(did, 0), (
                f"span_dedup doc {did}: spark n_removed="
                f"{sc['span_dedup'][did]} mirror={span_counts.get(did, 0)}"
            )
        else:  # fully-removed docs vanish from the output
            assert span_counts.get(did, 0) == n, f"span doc {did} missing"
    for did in ndoc_tokens:
        exp_kept = n_pass[did] - rem_pass.get(did, 0)
        got_kept = sc["passage_dedup_kept"].get(did, 0)
        assert got_kept == exp_kept, (
            f"passage_dedup doc {did}: spark n_kept={got_kept} mirror={exp_kept}"
        )
    cdc_counts = by_doc(m_cdc)
    for did, n in ndoc_tokens.items():
        exp = n - cdc_counts.get(did, 0)
        got = sc["cdc_kept"].get(did, 0)
        assert got == exp, (
            f"cdc doc {did}: spark kept={got} mirror={exp}"
        )

    res = {
        "T": T,
        "docs": len(docs),
        "tokens": sum(ndoc_tokens.values()),
        "gt_removed_tokens": len(gt),
        "ops": {
            "span_dedup": dict(zip(("precision", "recall"), pr(m_span, gt))),
            "passage_dedup": dict(zip(("precision", "recall"), pr(m_pass, gt))),
            "passage_dedup_cdc": dict(zip(("precision", "recall"), pr(m_cdc, gt))),
        },
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
