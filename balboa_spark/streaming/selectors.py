"""F1-F4 + U3: the selector (tagging) engine and tag-driven routing.

Reference semantics (selector/selector_engine.go:110-159, README.md:117-151):

- A selector RULE observes observations and may ADD TAGS; rows are
  never dropped or mutated otherwise.
- Rules with empty ``ingest`` see every row ("root rules"); rules with
  ``ingest: [t1, t2]`` see only rows carrying one of those tags.
- The engine iterates to a fixpoint with a per-rule visited-set to
  prevent loops (selector_engine.go:93-99).
- Regex rules: mode "select" tags rows whose rrname matches ANY pattern
  (selector_regex.go:84-91,93-107); mode "filter" tags rows matching
  NONE (:67-73,96-99 — the negation).
- Lua rules: arbitrary per-row scripts (selector_lua.go:145-158) — here
  a Column-predicate or Arrow-batched pandas function slot (X2).

Spark restatement: the rule graph is static per config, so the fixpoint
unrolls to a fixed chain of ``withColumn("tags", when(...))`` stages in
topological order; Catalyst collapses adjacent projections, so N rules
cost one scan and zero shuffles. Cyclic configs are rejected at compile
time (the reference's visited-set makes cycles a no-op at runtime; a
static engine can and should refuse them).
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class SelectorRule:
    """One tagging rule (selectors.yaml shape, README.md:117-151)."""

    name: str
    tags: Sequence[str]  # tags this rule adds
    mode: str = "select"  # 'select' | 'filter' | 'predicate' | 'pandas'
    patterns: Sequence[str] = ()  # regexes over rrname (select/filter)
    ingest: Sequence[str] = ()  # gate tags; empty = root rule
    predicate: Callable[[DataFrame], Column] | None = None  # mode='predicate'
    pandas_fn: Callable | None = None  # mode='pandas': pd.Series[str rrname] -> pd.Series[bool]

    def condition(self, df: DataFrame) -> Column:
        """Does this rule fire for a row (ignoring the ingest gate)?"""
        if self.mode in ("select", "filter"):
            if not self.patterns:
                raise ValueError(f"rule {self.name}: regex mode needs patterns")
            for p in self.patterns:
                re.compile(p)  # fail fast on bad regex, like pattern load (:109-124)
            matched = None
            for p in self.patterns:
                m = F.col("rrname").rlike(p)
                matched = m if matched is None else (matched | m)
            return matched if self.mode == "select" else ~matched
        if self.mode == "predicate":
            if self.predicate is None:
                raise ValueError(f"rule {self.name}: predicate mode needs fn")
            return self.predicate(df)
        if self.mode == "pandas":
            if self.pandas_fn is None:
                raise ValueError(f"rule {self.name}: pandas mode needs fn")
            from pyspark.sql.functions import pandas_udf

            fn = pandas_udf(self.pandas_fn, "boolean")
            return fn(F.col("rrname"))
        raise ValueError(f"rule {self.name}: unknown mode {self.mode!r}")


def _toposort(rules: Sequence[SelectorRule]) -> list[SelectorRule]:
    """Order rules so every producer of a gate tag runs before its
    consumers; reject cyclic tag graphs (§7.3 risk register)."""
    produces: dict[str, set[str]] = {r.name: set(r.tags) for r in rules}
    deps: dict[str, set[str]] = {}
    for r in rules:
        need = set(r.ingest)
        deps[r.name] = {
            other.name
            for other in rules
            if other.name != r.name and produces[other.name] & need
        }
    ordered: list[SelectorRule] = []
    done: set[str] = set()
    remaining = {r.name: r for r in rules}
    while remaining:
        ready = [n for n, r in remaining.items() if deps[n] <= done]
        if not ready:
            raise ValueError(f"cyclic selector rule graph: {sorted(remaining)}")
        for n in sorted(ready):
            ordered.append(remaining.pop(n))
            done.add(n)
    return ordered


def compile_selectors(rules: Sequence[SelectorRule]) -> Callable[[DataFrame], DataFrame]:
    """Compile a rule set into one DataFrame -> DataFrame tagging stage."""
    ordered = _toposort(rules)

    def apply(df: DataFrame) -> DataFrame:
        if "tags" not in df.columns:
            df = df.withColumn("tags", F.array().cast("array<string>"))
        for r in ordered:
            cond = r.condition(df)
            if r.ingest:
                gate = F.arrays_overlap(
                    F.col("tags"), F.array(*[F.lit(t) for t in r.ingest])
                )
                cond = gate & cond
            add = F.array(*[F.lit(t) for t in r.tags])
            df = df.withColumn(
                "tags",
                F.when(cond, F.array_distinct(F.array_union(F.col("tags"), add))).otherwise(
                    F.col("tags")
                ),
            )
        return df

    return apply


def route(df: DataFrame, routes: dict[str, Sequence[str]]) -> dict[str, DataFrame]:
    """U3: tag-driven multi-sink fan-out (db/db_remote.go:53-123).

    Each route with tags receives rows carrying ANY of its tags; a route
    with no tags receives everything. Tags are stripped before the sink
    (db_remote.go:103). Property (§2.12 #8): for disjoint single-tag
    routes covering all tags plus no tag-less routes, the union of
    outputs equals the tagged subset of the input.
    """
    out = {}
    for name, tags in routes.items():
        if tags:
            sel = df.filter(
                F.arrays_overlap(F.col("tags"), F.array(*[F.lit(t) for t in tags]))
            )
        else:
            sel = df
        out[name] = sel.drop("tags")
    return out


def _load_pattern_file(path: str) -> list[str]:
    """One-regex-per-line file, empty lines skipped, every line must
    compile — fatal otherwise (selector_regex.go:109-124). Deliberate
    deviation: trailing CR is stripped (the reference splits on bare
    \\n, so a CRLF file there yields patterns with an embedded \\r
    that silently never match — permissive superset here)."""
    with open(path) as f:
        lines = [s.rstrip("\r") for s in f.read().split("\n")]
    lines = [s for s in lines if s != ""]
    for s in lines:
        try:
            re.compile(s)
        except re.error as ex:
            raise ValueError(f"regexp {s!r} does not compile: {ex}") from ex
    return lines


def load_selector_yaml(
    cfg: dict,
    pattern_files: dict[str, Sequence[str]] | None = None,
    scripts: dict[str, Callable] | None = None,
    base_dir: str | None = None,
) -> list[SelectorRule]:
    """Build rules from the reference's selectors.yaml shape — a LIST of
    rules with ``type``, ``mode``, ``regexp`` (list of pattern files),
    ``tags`` and ``ingest`` (selector/selector_engine.go:32-60;
    README.md:129-147).

    ``pattern_files`` maps filename -> list of regex lines; names not
    found there are read from ``base_dir`` (the config file's
    directory) with the reference's one-regex-per-line semantics
    (selector_regex.go:109-124). ``scripts`` maps a ``script`` name to
    a Python callable for type "lua" rules (the X2 scriptable slot):
    a callable taking a pd.Series of rrnames -> boolean Series.
    """
    rules = []
    for spec in cfg.get("selectors", ()):
        name = spec["name"]
        rtype = spec.get("type", "regex")
        if rtype == "regex":
            patterns: list[str] = []
            for fname in spec.get("regexp", ()):
                if pattern_files and fname in pattern_files:
                    patterns.extend(pattern_files[fname])
                elif base_dir is not None:
                    patterns.extend(
                        _load_pattern_file(os.path.join(base_dir, fname))
                    )
            rules.append(
                SelectorRule(
                    name=name,
                    tags=tuple(spec.get("tags", ())),
                    mode=spec.get("mode", "select"),
                    patterns=tuple(patterns),
                    ingest=tuple(spec.get("ingest", ())),
                )
            )
        elif rtype == "lua":
            fn = (scripts or {}).get(spec.get("script", name))
            if fn is None:
                raise ValueError(
                    f"rule {name}: type 'lua' needs a registered script "
                    f"callable (scripts={sorted(scripts or {})})"
                )
            rules.append(
                SelectorRule(
                    name=name,
                    tags=tuple(spec.get("tags", ())),
                    mode="pandas",
                    pandas_fn=fn,
                    ingest=tuple(spec.get("ingest", ())),
                )
            )
        else:
            raise ValueError(f"rule {name}: unknown selector type {rtype!r}")
    return rules
