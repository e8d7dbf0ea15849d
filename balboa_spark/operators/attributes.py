"""Per-document attribute store + rule mixer (the tagger/mixer split).

A production pretraining pipeline does not recompute quality signals,
language ID, or perplexity every time it re-mixes a corpus: taggers
run ONCE per document and materialize their outputs as narrow
attribute relations parallel to the (immutable, huge) text; mixing is
then a boolean-rule evaluation over attributes plus one id-keyed
semi-join back to the text. This is the architecture of AI2's Dolma
toolkit (Soldaini et al. 2024, "Dolma: an Open Corpus of Three
Trillion Tokens...", §Toolkit: taggers write attribute files, the
mixer filters documents by expressions over attributes) — re-expressed
here as parquet relations under the repo's persisted-store contract
(manifest + commit-seq CAS, epoch-scoped appends, fold compaction).

Why it matters at 100 TB: text is the heavy column. Every mixer plan
here touches text exactly once — the final ``left_semi`` join on the
uniform document id. Taggers append (id, attrs) rows that are a few
hundred bytes each; re-tagging (a better classifier, a new PII regex)
appends a NEW VERSION rather than rewriting history, and readers
resolve latest-wins with one partial-aggregatable ``max(struct)``
per id — no window function, no skew (ids are unique, so every group
is tiny by construction).

Store layout (one namespace per tagger, each with its OWN manifest so
tagger writers never contend on a shared commit seq):

    <root>/<tagger>/manifest.json     format, id col, attr schema,
                                      last_ver, claimed_auto, retired
    <root>/<tagger>/state/epoch=<scope>/*.parquet
                                      rows: (id, _ver, attr...)

Versioning: every append claims ``_ver = last_ver + 1`` under the
manifest CAS *before* writing data (the claimed-auto pattern), so two
racing writers produce distinct versions or one loud
``ConcurrentWriterError`` — never an interleaved overwrite. Reader
truth is ``max(struct(_ver, attrs))`` per id: a torn append (data
written, commit stamp lost) is either invisible (scope dir incomplete
→ spark skips no committed data: parquet dirs are written atomically
per file, and a replay overwrites the same scope) or fully resolved;
a streaming replay of epoch N claims a fresh _ver but writes equal
rows into the SAME scope dir (mode=overwrite), so latest-wins picks
content identical to the first attempt.

Null semantics in the mixer follow SQL three-valued logic: a document
with no attribute row for a tagger gets nulls after the left join,
and a rule that evaluates to NULL does not keep the document — the
Dolma default (missing attribute ⇒ filter fails). Rules that want to
keep untagged docs say so explicitly (``quality__n_tokens IS NULL OR
...``).

Reference analog: the reference engine has no attribute store — this
is part of the beyond-reference LLM-pipeline surface (SURVEY.md §2
extension list), sitting on the same store machinery as
operators/dedup_store.py.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from balboa_spark.operators.dedup_store import (
    _epoch_scope,
    _fold_candidates,
    _scope_in_list_sql,
    _should_compact,
    _state_scopes,
)

MANIFEST = "manifest.json"

#: On-disk format version for attribute namespaces.
ATTR_FORMAT = 1

#: Partial-match email pattern used by the built-in ``pii`` tagger —
#: ONE definition shared by the CLI tagger, the bench item, and the
#: graded fixture (their DuckDB oracle keeps an intentionally
#: independent literal copy). Identical semantics under Java regex
#: (Spark rlike) and RE2 (DuckDB regexp_matches).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

_TAGGER_RE = re.compile(r"[a-z][a-z0-9_]*")


def _tagger_selection(
    taggers: "list[str] | dict[str, list[str] | None]",
) -> dict:
    """Normalize the mixer's tagger argument: a list of names, or a
    dict ``{tagger: [cols] | None}`` for column-pruned reads."""
    return (
        dict(taggers) if isinstance(taggers, dict) else {t: None for t in taggers}
    )


def _check_tagger_name(tagger: str) -> str:
    """Lowercase namespace names up front: Spark resolves column names
    case-insensitively by default, so two taggers differing only by
    case would produce AMBIGUOUS_REFERENCE prefixed columns in the
    mixer. Lowercasing at the boundary makes them the SAME namespace
    loudly (schema check) instead of colliding silently later."""
    t = tagger.lower()
    if not _TAGGER_RE.fullmatch(t):
        raise ValueError(
            f"tagger name {tagger!r} must match [a-z][a-z0-9_]* "
            "(it becomes a directory name and a column prefix)"
        )
    return t


class _TaggerNS:
    """One tagger's namespace: manifest + epoch-scoped state dirs.

    Duck-typed to what the dedup_store scope helpers expect
    (``spark``, ``_read_manifest``, ``_write_manifest``,
    ``_next_epoch``) so claim/fold/trigger logic is shared, not
    re-derived."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.state_path = os.path.join(path, "state")
        man = self._read_manifest()
        if man is not None and man.get("format") != ATTR_FORMAT:
            raise ValueError(
                f"attribute namespace at {path} uses on-disk format "
                f"{man.get('format')} (this build reads {ATTR_FORMAT}); "
                "re-tag the corpus — there is no in-place migration"
            )

    def _read_manifest(self) -> dict | None:
        p = os.path.join(self.path, MANIFEST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _write_manifest(
        self, extra: dict | None = None, expected_seq: int | None = None
    ) -> None:
        from balboa_spark.plans.genstore import flip_manifest

        prev = self._read_manifest() or {}
        if expected_seq is None:
            expected_seq = prev.get("commit_seq", 0)
        man = {**prev, "format": ATTR_FORMAT}
        if extra:
            man.update(extra)
        os.makedirs(self.path, exist_ok=True)
        flip_manifest(self.path, man, MANIFEST, expected_seq=expected_seq)

    def _next_epoch(self, state_path: str) -> int:
        if not os.path.exists(state_path):
            return 0
        eps = [
            int(d.rsplit("-", 1)[1])
            for d in os.listdir(state_path)
            if d.startswith("epoch=auto-") and d.rsplit("-", 1)[1].isdigit()
        ]
        return (max(eps) + 1) if eps else 0


class AttributeStore:
    """Versioned per-document attribute relations, one namespace per
    tagger, plus the rule mixer over them. See the module docstring
    for the layout and the latest-wins contract."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._namespaces: dict[str, _TaggerNS] = {}

    # -- namespaces ---------------------------------------------------

    def _ns(self, tagger: str) -> _TaggerNS:
        t = _check_tagger_name(tagger)
        if t not in self._namespaces:
            self._namespaces[t] = _TaggerNS(
                self.spark, os.path.join(self.path, t)
            )
        return self._namespaces[t]

    def taggers(self) -> list[str]:
        """Namespaces with committed DATA, sorted. The manifest alone
        is not enough: write() claims its version in the manifest
        BEFORE the parquet lands, so a first-ever write torn between
        claim and data would otherwise list a namespace that every
        read rejects — wedging callers (the CLI mixer's default
        tagger list) on a crash that is supposed to be invisible."""
        if not os.path.exists(self.path):
            return []
        out = []
        for d in sorted(os.listdir(self.path)):
            if (
                _TAGGER_RE.fullmatch(d)
                and os.path.exists(os.path.join(self.path, d, MANIFEST))
                and os.path.isdir(os.path.join(self.path, d, "state"))
            ):
                out.append(d)
        return out

    # -- writes -------------------------------------------------------

    def write(
        self,
        attrs: DataFrame,
        tagger: str,
        id_col: str = "doc_id",
        epoch_id: int | None = None,
        stream_id: str = "default",
        max_live_epochs: int | None = None,
    ) -> int:
        """Append one tagger batch: every non-id column of ``attrs``
        becomes an attribute. Returns the claimed version.

        The attr schema is pinned by the FIRST write (sorted column
        names in the manifest); a later write with different columns
        raises — silent schema drift would make latest-wins resolution
        compare structs of different shapes. Map-typed columns are
        rejected (latest-wins orders by ``max(struct(...))`` and maps
        are not orderable in Spark).

        ``epoch_id``/``stream_id`` scope streaming appends exactly like
        the dedup stores: a foreachBatch replay overwrites its own
        scope dir, so torn appends self-heal; one-shot callers get a
        CAS-claimed ``auto-N`` scope. ``max_live_epochs`` arms the
        size-triggered fold so a long-running tagger stream cannot
        accumulate unbounded partition dirs."""
        ns = self._ns(tagger)
        cols = sorted(c for c in attrs.columns if c != id_col)
        if id_col not in attrs.columns or not cols:
            raise ValueError(
                f"attrs must carry {id_col!r} plus >=1 attribute column, "
                f"got {attrs.columns}"
            )
        for f_ in attrs.schema.fields:
            # simpleString covers maps nested inside structs/arrays too
            # — a nested map would pass a top-level-class check, commit
            # the schema, and then make every read fail unorderable
            if f_.name != id_col and "map<" in f_.dataType.simpleString():
                raise ValueError(
                    f"attribute {f_.name!r} contains a map type — maps "
                    "are not orderable, so latest-wins resolution cannot "
                    "compare them; store a sorted array of entries instead"
                )
        # ONE manifest read serves the schema check AND the claim —
        # the claim's CAS then guards the whole read-modify-write
        cur = ns._read_manifest() or {}
        if cur.get("columns") is not None:
            if cur.get("columns") != cols or cur.get("id_col") != id_col:
                raise ValueError(
                    f"tagger {tagger!r} was committed with id "
                    f"{cur.get('id_col')!r} + columns {cur.get('columns')}, "
                    f"this write carries {id_col!r} + {cols}; a new schema "
                    "needs a new tagger name"
                )
        # claim the version (and the auto scope) under the CAS BEFORE
        # any data is written — racing writers get distinct versions or
        # a loud ConcurrentWriterError, never an interleaved overwrite
        ver = int(cur.get("last_ver", 0)) + 1
        claim: dict = {
            "last_ver": ver,
            "id_col": id_col,
            "columns": cols,
        }
        if epoch_id is None:
            # _claim_auto_scope stamps claimed_auto itself; fold the
            # version claim into the same CAS write by pre-merging
            expected = cur.get("commit_seq", 0)
            n = max(
                ns._next_epoch(ns.state_path),
                int(cur.get("claimed_auto", -1)) + 1,
            )
            claim["claimed_auto"] = n
            ns._write_manifest(extra=claim, expected_seq=expected)
            scope = f"auto-{n}"
        else:
            scope = _epoch_scope(epoch_id, stream_id)
            ns._write_manifest(
                extra=claim, expected_seq=cur.get("commit_seq", 0)
            )
        (
            attrs.select(F.col(id_col), F.lit(ver).alias("_ver"), *cols)
            .write.mode("overwrite")
            .parquet(os.path.join(ns.state_path, f"epoch={scope}"))
        )
        # data lands, THEN the commit stamp (store-wide order)
        ns._write_manifest()
        if max_live_epochs is not None and _should_compact(
            ns, ns.state_path, max_live_epochs
        ):
            self.compact(tagger)
        return ver

    # -- reads --------------------------------------------------------

    def read(
        self,
        tagger: str,
        prefix: bool = True,
        cols: list[str] | None = None,
    ) -> DataFrame:
        """The tagger's latest-wins attribute relation: one row per
        document id, newest version's values. Resolution is ONE
        ``groupBy(id).agg(max(struct(_ver, attrs...)))`` — ids are
        unique per version so groups are tiny, the aggregate is
        map-side combinable, and no window partitions anything
        skewable. ``prefix`` namespaces the attribute columns as
        ``<tagger>__<col>`` for the mixer.

        ``cols`` restricts the read to a subset of the tagger's
        attributes: a wide tagger (dozens of signals) mixed on two of
        them should not drag every column through the resolution
        aggregate — the struct is built only over the requested
        columns, so parquet column pruning reaches the scan
        (plan-tested). Winner selection is unchanged (``_ver`` alone
        decides between committed versions)."""
        ns = self._ns(tagger)
        man = ns._read_manifest()
        if man is None or not os.path.exists(ns.state_path):
            raise ValueError(f"tagger {tagger!r} has no committed attributes")
        id_col, all_cols = man["id_col"], man["columns"]
        if cols is None:
            cols = all_cols
        else:
            unknown = sorted(set(cols) - set(all_cols))
            if unknown:
                raise ValueError(
                    f"tagger {tagger!r} has no attributes {unknown}; "
                    f"committed columns: {all_cols}"
                )
            cols = [c for c in all_cols if c in set(cols)]
        df = self.spark.read.parquet(ns.state_path)
        resolved = (
            df.groupBy(id_col)
            .agg(
                F.max(
                    F.struct(F.col("_ver"), *[F.col(c) for c in cols])
                ).alias("_s")
            )
            .select(
                F.col(id_col),
                *[F.col(f"_s.{c}").alias(c) for c in cols],
            )
        )
        if prefix:
            t = _check_tagger_name(tagger)
            for c in cols:
                resolved = resolved.withColumnRenamed(c, f"{t}__{c}")
        return resolved

    def attributes(
        self,
        docs: DataFrame,
        taggers: list[str] | dict[str, list[str] | None],
        id_col: str = "doc_id",
    ) -> DataFrame:
        """``docs``' ids left-joined with every named tagger's resolved
        relation (prefixed columns). Only the id column of ``docs``
        flows into the joins — text stays out of every shuffle until
        the caller semi-joins the verdict back. ``taggers`` is a list
        of names, or a dict ``{tagger: [cols] | None}`` to
        column-prune wide taggers down to the attributes a rule
        actually touches (see :meth:`read`)."""
        sel = _tagger_selection(taggers)
        joined = docs.select(F.col(id_col))
        for t, tcols in sel.items():
            rel = self.read(t, prefix=True, cols=tcols)
            ns_id = self._ns(t)._read_manifest()["id_col"]
            if ns_id != id_col:
                rel = rel.withColumnRenamed(ns_id, id_col)
            joined = joined.join(rel, id_col, "left")
        return joined

    # -- mixing -------------------------------------------------------

    def mix(
        self,
        docs: DataFrame,
        taggers: list[str] | dict[str, list[str] | None],
        rule: str,
        id_col: str = "doc_id",
        keep_attrs: bool = False,
    ) -> DataFrame:
        """Documents passing ``rule`` — a SQL boolean expression over
        the prefixed attribute columns (``quality__n_tokens >= 50 AND
        NOT pii__has_email``). NULL does not keep (module docstring).

        Plan shape (batch): narrow id+attr joins decide the keep-set;
        the text relation is touched exactly once, by the final
        ``left_semi`` join on the uniform id key.

        STREAMING docs work too: the keep-set shape would make the
        final semi-join stream-stream (unsupported without
        watermarks), so the streaming arm left-joins the static
        attribute relations onto the stream directly and filters —
        per micro-batch stream-static joins. The attribute relations
        are a snapshot PINNED at query start (a parquet static side's
        file listing is resolved once, so epoch dirs written later are
        not discovered — the same pinning convention as the drift
        monitors' reference histograms); restart the query to pick up
        re-tags."""
        if docs.isStreaming:
            sel = _tagger_selection(taggers)
            joined = docs
            attr_cols: list[str] = []
            for t, tcols in sel.items():
                rel = self.read(t, prefix=True, cols=tcols)
                ns_id = self._ns(t)._read_manifest()["id_col"]
                if ns_id != id_col:
                    rel = rel.withColumnRenamed(ns_id, id_col)
                attr_cols += [c for c in rel.columns if c != id_col]
                joined = joined.join(rel, id_col, "left")
            kept = joined.filter(F.expr(rule))
            return kept if keep_attrs else kept.drop(*attr_cols)
        joined = self.attributes(docs, taggers, id_col=id_col)
        kept = joined.filter(F.expr(rule))
        if keep_attrs:
            return docs.join(kept, id_col, "inner")
        return docs.join(kept.select(id_col), id_col, "left_semi")

    def mix_report(
        self,
        docs: DataFrame,
        taggers: list[str] | dict[str, list[str] | None],
        rules: dict[str, str],
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Per-rule attrition over ``docs``: for each named rule, how
        many documents fail it (NULL counts as fail), plus the
        ``__all__`` conjunction row — the report a curator reads before
        committing a mix. ONE aggregation job (every counter is a
        conditional sum over the same joined frame, map-side
        combinable), then a tiny unpivot of the single result row.
        Output: (rule, n_pass, n_fail) ordered by rule name."""
        if not rules or "__all__" in rules:
            raise ValueError("rules must be non-empty and not use __all__")
        for n in rules:
            if not re.fullmatch(r"[A-Za-z0-9_.\-]+", n):
                raise ValueError(
                    f"rule name {n!r} must match [A-Za-z0-9_.-]+ (it is "
                    "spliced into a stack() SQL literal)"
                )
        joined = self.attributes(docs, taggers, id_col=id_col)
        named = dict(rules)
        named["__all__"] = " AND ".join(f"({r})" for r in rules.values())
        aggs = []
        for name, expr in named.items():
            aggs.append(
                F.sum(
                    F.when(F.expr(expr), F.lit(1)).otherwise(F.lit(0))
                ).alias(f"p::{name}")
            )
        row = joined.agg(*aggs, F.count(F.lit(1)).alias("p::__n__"))
        pairs = ", ".join(
            f"'{n}', `p::{n}`" for n in sorted(named)
        )
        return (
            row.select(
                F.col("p::__n__").alias("_n"),
                F.expr(
                    f"stack({len(named)}, {pairs}) as (rule, n_pass)"
                ),
            )
            .select(
                "rule",
                F.col("n_pass").cast("long").alias("n_pass"),
                (F.col("_n") - F.col("n_pass")).cast("long").alias("n_fail"),
            )
            .orderBy("rule")
        )

    # -- maintenance --------------------------------------------------

    def compact(self, tagger: str, vacuum: bool = False) -> int:
        """Fold a tagger's committed epoch dirs into one pruned
        ``base-<g>`` generation: within the folded scopes, only each
        id's max-``struct(_ver, attrs)`` row survives (superseded
        versions are dropped — safe even when a NEWER version lives in
        a non-folded dir, since latest-wins at read still prefers it).
        Same grace contract as the dedup stores: folded dirs go on the
        manifest ``retired`` list for one generation so in-flight
        reader plans keep resolving, and the next compaction (or
        ``vacuum=True``) reclaims them."""
        import shutil

        ns = self._ns(tagger)
        man = ns._read_manifest()
        if man is None:
            return 0
        id_col, cols = man["id_col"], man["columns"]
        scopes = _state_scopes(ns.state_path)
        expected = man.get("commit_seq", 0)
        on_disk = set(scopes)
        retired_prev = [s for s in (man.get("retired") or []) if s in on_disk]
        fold = [
            s for s in _fold_candidates(scopes) if s not in set(retired_prev)
        ]
        if len(fold) < 2:
            if retired_prev:
                ns._write_manifest(
                    extra={"retired": []}, expected_seq=expected
                )
                for s in retired_prev:
                    shutil.rmtree(
                        os.path.join(ns.state_path, f"epoch={s}"),
                        ignore_errors=True,
                    )
            return 0
        gen = 1 + max(
            (
                int(s.rpartition("-")[2])
                for s in scopes
                if s.startswith("base-")
            ),
            default=0,
        )
        folded = (
            self.spark.read.parquet(ns.state_path)
            .where(F.expr(_scope_in_list_sql(fold)))
            .groupBy(id_col)
            .agg(
                F.max(
                    F.struct(F.col("_ver"), *[F.col(c) for c in cols])
                ).alias("_s")
            )
            .select(
                F.col(id_col),
                F.col("_s._ver").alias("_ver"),
                *[F.col(f"_s.{c}").alias(c) for c in cols],
            )
        )
        folded.write.mode("overwrite").parquet(
            os.path.join(ns.state_path, f"epoch=base-{gen}")
        )
        ns._write_manifest(
            extra={"retired": [] if vacuum else fold}, expected_seq=expected
        )
        for s in retired_prev + (fold if vacuum else []):
            shutil.rmtree(
                os.path.join(ns.state_path, f"epoch={s}"), ignore_errors=True
            )
        return len(fold)
