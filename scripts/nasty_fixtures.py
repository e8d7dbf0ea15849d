"""Adversarial-fixture generator for the engine-vs-oracle parity audit.

The driver's correctness gate runs on clean synthetic text, so a
kernel and its DuckDB oracle can agree there while diverging on real
corpus dirt — exactly the class of latent bug the r12 ADVICE found
four of (trailing-whitespace fingerprints, truncating vs floor
division on pre-1970 timestamps, INNER-vs-LEFT empty-group joins,
short-doc share normalization). This script manufactures that dirt
deliberately: it copies the sf0.001 tables and APPENDS schema-exact
adversarial rows to `documents`, `events`, and `embeddings`, so every
registered (query, oracle) pair can be replayed against it with the
unmodified driver_sim harness:

    python scripts/nasty_fixtures.py /tmp/nasty_sf
    SPARK_GRAFT_SF_DIR=/tmp/nasty_sf python scripts/driver_sim.py

Any [FAIL] is a cross-engine divergence that the clean fixtures were
hiding; triage each as an engine bug, an oracle bug, or a documented
semantic precondition. Planted classes:

documents: trailing/leading whitespace near-dups, CRLF, whitespace-only
  and empty text, NULL text, single-token docs per language (the
  empty-bigram LM class), NFC-vs-NFD accent pairs, NBSP/zero-width
  space, emoji/CJK, case-only dup pairs, a repeated-token flood, a
  5000-char single token, exact dup pairs across sources, one-word-
  apart near dups, delimiter soup (| \\ " ').
events: pre-1970 and epoch-0 timestamps (floor-vs-truncate division),
  exact timestamp ties on one user (order stability), NULL value and
  NULL/empty/malformed/nested/unicode JSON props, negative and huge
  values, a single-event user and an exact-gap session-boundary pair.
embeddings: the zero vector (cosine /0), an exact duplicate and the
  exact negation of a planted vector, unit basis vectors, an all-ones
  vector, a tiny-norm (1e-8) vector, one huge component.

Determinism: every planted row is a literal — no RNG, no clock.
"""

from __future__ import annotations

import os
import shutil
import sys
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# ---------------------------------------------------------------- documents
FOX = "the quick brown fox jumps over the lazy dog"
NEAR_A = (
    "curation pipelines normalize text before fingerprinting so that "
    "incidental whitespace and case differences do not defeat "
    "deduplication across crawls and snapshots of the same page"
)
NEAR_B = NEAR_A.replace("incidental", "accidental")

def doc_rows(base_id: int):
    rows = [
        # trailing/leading whitespace near-dups of the same sentence
        (FOX, "en", "src0"),
        (FOX + "\n", "en", "src1"),
        (FOX + " \t", "en", "src2"),
        ("\t" + FOX, "en", "src3"),
        ("  " + FOX + "  ", "en", "src4"),
        ("line one\r\nline two\r\nline one", "en", "src5"),
        (" \t\n", "en", "src6"),          # whitespace-only
        ("", "en", "src7"),               # empty string
        (None, "en", "src8"),             # NULL text
        # single-token docs per language (empty-bigram LM class)
        ("hello", "en", "src0"),
        ("bonjour", "fr", "src1"),
        ("hallo", "de", "src2"),
        ("hola", "es", "src3"),
        ("你好", "zh", "src4"),
        # unicode: NFC vs NFD, NBSP, zero-width space, emoji/CJK, sharp s
        ("caf\u00e9 au lait", "fr", "src5"),           # NFC e-acute
        ("cafe\u0301 au lait", "fr", "src6"),          # NFD e + combining acute
        ("foo\u00a0bar\u200bbaz quux", "en", "src7"),  # NBSP + zero-width space
        ("宇宙飞船 🚀 launches tonight café naïve", "zh", "src8"),
        ("STRASSE RULES apply", "de", "src9"),
        ("straße rules apply", "de", "src10"),
        # case-only dup pair
        ("Hello World Again", "en", "src11"),
        ("hello world again", "en", "src12"),
        # repetition flood and a single enormous token
        (("spam " * 400).strip(), "en", "src13"),
        ("a" * 5000, "en", "src14"),
        # exact dup pair across sources
        (NEAR_A, "en", "src15"),
        (NEAR_A, "en", "src16"),
        # near-dup one word apart
        (NEAR_B, "en", "src17"),
        # delimiter soup and punctuation-only
        ("a|b\\c\"d'e f|g", "en", "src18"),
        ("!!! ??? ... ---", "en", "src19"),
        ("123 456 123 789 123", "en", "src0"),
        # NULL group keys: lang/source are groupBy keys, URL inputs,
        # and LID training labels (probed green everywhere — pinned
        # so a future kernel cannot regress the consistent handling)
        ("null lang doc words here", None, "src0"),
        ("null source doc words here", "en", None),
        # the SAME word flooding the top-K of EVERY language: per-lang
        # kernels whose relations carry duplicate words across groups
        # (corpus_unigram_by_lang / corpus_bpe_by_lang) — this is the
        # exact shape that exposed DuckDB's vectorized list_reduce
        # row cross-talk in the r14 oracle (same-word rows swapped
        # walk results run-dependently); pinned so the recursive-CTE
        # replay can never regress to a fold
        (("crosslang " * 500).strip(), "en", "src1"),
        (("crosslang " * 500).strip(), "de", "src2"),
        (("crosslang " * 500).strip(), "fr", "src3"),
        (("crosslang " * 500).strip(), "es", "src4"),
        (("crosslang " * 500).strip(), "zh", "src5"),
    ]
    return {
        "doc_id": [base_id + i for i in range(len(rows))],
        "text": [t for t, _, _ in rows],
        "lang": [l for _, l, _ in rows],
        "source": [s for _, _, s in rows],
        "n_chars": [len(t) if t is not None else None for t, _, _ in rows],
    }

# ------------------------------------------------------------------- events
def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)

def event_rows(base_id: int, base_user: int):
    u1, u2, u3 = base_user + 1, base_user + 2, base_user + 3
    rows = [
        # pre-1970 + epoch 0 (floor vs truncate division classes)
        (ts("1950-01-01 00:00:00"), u1, "view", 1.0, '{"k": 1}'),
        (ts("1969-12-31 23:59:30"), u1, "click", 2.0, '{"k": 2}'),
        (ts("1970-01-01 00:00:00"), u1, "view", 3.0, '{"k": 3}'),
        # exact timestamp tie on one user (order stability)
        (ts("2024-01-15 12:00:00"), u2, "click", 4.0, '{"k": 4}'),
        (ts("2024-01-15 12:00:00"), u2, "view", 5.0, '{"k": 5}'),
        # session boundary exactly at a 30-minute gap
        (ts("2024-01-16 08:00:00"), u2, "view", 6.0, '{"k": 6}'),
        (ts("2024-01-16 08:30:00"), u2, "click", 7.0, '{"k": 7}'),
        # single-event user
        (ts("2024-01-17 09:00:00"), u3, "signup", 8.0, '{"k": 8}'),
        # value edge cases
        (ts("2024-01-18 10:00:00"), u1, "purchase", -5.0, '{"k": 9}'),
        (ts("2024-01-18 11:00:00"), u1, "purchase", 0.0, '{"k": 10}'),
        (ts("2024-01-18 12:00:00"), u1, "purchase", 1e15, '{"k": 11}'),
        (ts("2024-01-18 13:00:00"), u1, "purchase", 1e-9, '{"k": 12}'),
        (ts("2024-01-18 14:00:00"), u1, "error", None, '{"k": 13}'),
        # props edge cases
        (ts("2024-01-19 10:00:00"), u2, "view", 14.0, "{}"),
        (ts("2024-01-19 11:00:00"), u2, "view", 15.0, ""),
        (ts("2024-01-19 12:00:00"), u2, "view", 16.0, None),
        (ts("2024-01-19 13:00:00"), u2, "view", 17.0, "not json"),
        (ts("2024-01-19 14:00:00"), u2, "view", 18.0, '{"k": null}'),
        (ts("2024-01-19 15:00:00"), u2, "view", 19.0, '{"k": "ünïcode"}'),
        (ts("2024-01-19 16:00:00"), u2, "view", 20.0, '{"k": {"a": 1}}'),
        (ts("2024-01-19 17:00:00"), u2, "view", 21.0, '{"K": 22}'),
        # non-finite values (failed sensor readings / div-by-zero
        # upstream): the finite-guard contract maps these to NULL
        (ts("2024-01-20 10:00:00"), u3, "purchase", float("nan"), '{"k": 23}'),
        (ts("2024-01-20 11:00:00"), u3, "purchase", float("inf"), '{"k": 24}'),
        (ts("2024-01-20 12:00:00"), u3, "purchase", float("-inf"), '{"k": 25}'),
        # NULL timestamp (unparseable log line): time-ordered operators
        # exclude it by contract — Spark windows order NULLs FIRST and
        # DuckDB's LAST, so any kernel that lets it through diverges
        (None, u3, "view", 1.0, '{"k": 26}'),
        # NULL event_type (schema-drifted producer): SFT content =
        # event_type || ' ' || props goes NULL on both engines. An
        # ALL-NULL-content conversation (isolated by the gap rule)
        # must render as the bare system prefix — DuckDB string_agg
        # over zero non-NULL pieces is NULL and needs the coalesce
        # the ADVICE r13 fix added; Spark array_join skips NULLs.
        (ts("2024-02-01 10:00:00"), u3, None, 1.0, '{"k": 27}'),
        # NULL event_type MID-conversation: the NULL piece must drop
        # from the render on both engines while n_turns still counts
        # it and the loss-span cumsum treats its piece length as 0
        (ts("2024-02-02 10:00:00"), u1, "view", 1.0, '{"k": 28}'),
        (ts("2024-02-02 10:05:00"), u1, None, 2.0, '{"k": 29}'),
        (ts("2024-02-02 10:10:00"), u1, "click", 3.0, '{"k": 30}'),
    ]
    return {
        "event_id": [base_id + i for i in range(len(rows))],
        "ts": [r[0] for r in rows],
        "user_id": [r[1] for r in rows],
        "event_type": [r[2] for r in rows],
        "value": [r[3] for r in rows],
        "props": [r[4] for r in rows],
    }

# --------------------------------------------------------------- embeddings
def emb_rows(base_id: int, dim: int):
    planted = [float(i % 7) - 3.0 for i in range(dim)]  # deterministic pattern
    e0 = [1.0] + [0.0] * (dim - 1)
    e1 = [0.0, 1.0] + [0.0] * (dim - 2)
    vecs = [
        [0.0] * dim,                        # zero vector (cosine /0)
        planted,                            # anchor
        list(planted),                      # exact duplicate (cos=1)
        [-x for x in planted],              # exact negation (cos=-1)
        e0, e1,                             # orthogonal unit basis
        [1.0] * dim,                        # all ones
        [1e-8] * dim,                       # tiny norm
        [1e6] + [0.0] * (dim - 1),          # one huge component
    ]
    return {
        "vec_id": [base_id + i for i in range(len(vecs))],
        "embedding": vecs,
        "label": [i % 10 for i in range(len(vecs))],
    }


def append_rows(src_path: str, dst_path: str, new_cols: dict) -> int:
    base = pq.read_table(src_path)
    schema = pa.schema([base.schema.field(i) for i in range(len(base.schema))])
    extra = pa.table(
        {k: pa.array(v, type=schema.field(k).type) for k, v in new_cols.items()},
        schema=schema,
    )
    out = pa.concat_tables([base.cast(schema), extra])
    pq.write_table(out, dst_path)
    return extra.num_rows


def main() -> int:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nasty_sf"
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        s = os.path.join(SRC, f"{t}.parquet")
        d = os.path.join(dst, f"{t}.parquet")
        if t == "documents":
            import duckdb
            base = duckdb.sql(
                f"select max(doc_id) from read_parquet('{s}')").fetchone()[0]
            n = append_rows(s, d, doc_rows(base + 1))
        elif t == "events":
            import duckdb
            eid, uid = duckdb.sql(
                f"select max(event_id), max(user_id) from read_parquet('{s}')"
            ).fetchone()
            n = append_rows(s, d, event_rows(eid + 1, uid))
        elif t == "embeddings":
            import duckdb
            vid, dim = duckdb.sql(
                f"select max(vec_id), max(len(embedding)) from read_parquet('{s}')"
            ).fetchone()
            n = append_rows(s, d, emb_rows(vid + 1, dim))
        else:
            shutil.copyfile(s, d)
            n = 0
        print(f"{t}: +{n} adversarial rows -> {d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
