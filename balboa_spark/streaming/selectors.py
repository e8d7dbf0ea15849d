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
  THREE slots: a Column-predicate, an Arrow-batched pandas function,
  and (when the ``lupa`` package is importable) REAL Lua execution of
  the reference's script contract — ``function process(o)`` over an
  observation exposing ``rcode/rdata/rrtype/rrname/sensor_id/tags/
  add_tag`` (selector_lua.go:116-125, selector.lua:1-24). The Lua
  runtime is created once per Python worker and reused across Arrow
  batches; without lupa the rule raises ImportError at compile (same
  gating convention as pika/PIL elsewhere in this repo).

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


#: Observation fields the Lua contract exposes, in udf argument order.
_LUA_OBS_FIELDS = ("rcode", "rdata", "rrtype", "rrname", "sensor_id")


class LuaObservation:
    """Per-row observation handle with the reference's Lua method surface
    (selector_lua.go:116-125). Tolerant of BOTH Lua call styles: colon
    calls (``o:rrname()``) arrive with the observation itself as the
    first argument, dot calls without — accessors ignore extra args and
    ``add_tag`` takes its tag from the LAST argument.
    """

    __slots__ = ("_f", "_tags", "added", "_table_from")

    def __init__(self, fields, tags, table_from=None):
        # fields: dict of _LUA_OBS_FIELDS -> str ('' for SQL NULL, the
        # reference's strings are non-nil); tags: row's current tags.
        self._f = fields
        self._tags = list(tags)
        self.added: list[str] = []  # insertion-ordered, deduped
        self._table_from = table_from  # lupa runtime.table_from, or None

    def rcode(self, *_a):
        return self._f["rcode"]

    def rdata(self, *_a):
        return self._f["rdata"]

    def rrtype(self, *_a):
        return self._f["rrtype"]

    def rrname(self, *_a):
        return self._f["rrname"]

    def sensor_id(self, *_a):
        return self._f["sensor_id"]

    def tags(self, *_a):
        # selector.lua iterates with ``#tags`` / ``tags[i]``: a real
        # 1-indexed Lua table when running under lupa, a list otherwise.
        t = self._tags + self.added
        return self._table_from(t) if self._table_from is not None else t

    def add_tag(self, *args):
        # Colon call -> (obs, tag); dot call -> (tag,). Empty tags are
        # dropped like observationAddTag (selector_lua.go:108-114).
        tag = args[-1] if args else ""
        if isinstance(tag, LuaObservation) or tag is None:
            return
        tag = str(tag)
        if tag and tag not in self._tags and tag not in self.added:
            self.added.append(tag)


#: Per-worker cache: script text -> (LuaRuntime, process fn). Keyed by
#: the full source so two rules with different scripts never collide.
_LUA_COMPILED: dict[str, tuple] = {}


def _lua_process(script: str):
    """Compile ``script`` with lupa once per worker process; returns
    ``(table_from, process)``. Mirrors InitializeLua
    (selector_lua.go:145-150): run the script, then require a global
    ``process``. Raises ImportError when lupa is absent.
    """
    entry = _LUA_COMPILED.get(script)
    if entry is None:
        try:
            import lupa
        except ImportError as ex:  # pragma: no cover - exercised w/o lupa
            raise ImportError(
                "selector type 'lua' with a real Lua script needs the "
                "optional 'lupa' package (pip install lupa); without it "
                "register a Python callable instead (scripts={...})"
            ) from ex
        rt = lupa.LuaRuntime(
            unpack_returned_tuples=True, register_eval=False
        )
        rt.execute(script)
        process = rt.globals().process
        if process is None:
            raise ValueError("lua selector script must define process(o)")
        entry = (rt.table_from, process)
        _LUA_COMPILED[script] = entry
    return entry


def _added_tags_column(
    script: str | None,
    process_fn: Callable | None,
    df: DataFrame,
    gate: Column | None = None,
) -> Column:
    """array<string> of tags ``process(o)`` added for each row.

    One Arrow-batched pandas UDF; the Lua runtime (or the Python
    process_fn) is resolved once per batch from the per-worker cache,
    then driven per row — the same per-observation cost model as
    ProcessObservation (selector_lua.go:151-158), minus runtime
    re-creation. Missing observation columns surface as ''.

    ``gate`` is evaluated INSIDE the UDF (a when(gate, udf) wrapper
    would not help: ArrowEvalPython extracts and runs the UDF over
    the whole batch before the projection applies). The reference
    engine only calls ProcessObservation on rows whose ingest tags
    match (selector_engine.go:110-128), so a script must neither PAY
    for nor be able to CRASH on rows its gate excludes.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints on purpose: the module-wide `from __future__ import
    # annotations` turns them into strings pandas_udf cannot resolve
    # against a function-local pandas import (defaults to SCALAR)
    @pandas_udf("array<string>")
    def _run(rcode, rdata, rrtype, rrname, sensor_id, tags, gated):
        if process_fn is not None:
            table_from, process = None, process_fn
        else:
            table_from, process = _lua_process(script)
        cols = {
            "rcode": rcode,
            "rdata": rdata,
            "rrtype": rrtype,
            "rrname": rrname,
            "sensor_id": sensor_id,
        }
        out = []
        for i in range(len(rrname)):
            if not bool(gated.iloc[i]):
                out.append([])
                continue
            fields = {
                k: ("" if v.iloc[i] is None else str(v.iloc[i]))
                for k, v in cols.items()
            }
            row_tags = tags.iloc[i]
            obs = LuaObservation(
                fields,
                list(row_tags) if row_tags is not None else [],
                table_from,
            )
            process(obs)
            out.append(obs.added)
        return pd.Series(out)

    args = [
        (F.col(f) if f in df.columns else F.lit(None)).cast("string")
        for f in _LUA_OBS_FIELDS
    ]
    args.append(F.col("tags"))
    args.append((F.lit(True) if gate is None else gate).cast("boolean"))
    return _run(*args)


@dataclass
class SelectorRule:
    """One tagging rule (selectors.yaml shape, README.md:117-151)."""

    name: str
    tags: Sequence[str]  # tags this rule adds (mode 'lua': tags it MAY add)
    mode: str = "select"  # 'select' | 'filter' | 'predicate' | 'pandas' | 'lua'
    patterns: Sequence[str] = ()  # regexes over rrname (select/filter)
    ingest: Sequence[str] = ()  # gate tags; empty = root rule
    predicate: Callable[[DataFrame], Column] | None = None  # mode='predicate'
    pandas_fn: Callable | None = None  # mode='pandas': pd.Series[str rrname] -> pd.Series[bool]
    script: str | None = None  # mode='lua': Lua SOURCE TEXT (needs lupa)
    process_fn: Callable | None = None  # mode='lua': Python process(o) stand-in

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
            gate = (
                F.arrays_overlap(
                    F.col("tags"), F.array(*[F.lit(t) for t in r.ingest])
                )
                if r.ingest
                else None
            )
            if r.mode == "lua":
                # Script rules add DYNAMIC tags (add_tag); the declared
                # ``tags`` list is an ordering contract for the DAG, not
                # an auto-add — the reference's lua selectors only tag
                # through add_tag (selector_lua.go:108-114). Undeclared
                # added tags still land on the row but cannot reliably
                # gate later rules in this statically-ordered engine.
                if r.script is None and r.process_fn is None:
                    raise ValueError(
                        f"rule {r.name}: lua mode needs script or process_fn"
                    )
                added = _added_tags_column(r.script, r.process_fn, df, gate)
                df = df.withColumn(
                    "tags",
                    F.array_distinct(
                        F.array_union(
                            F.col("tags"),
                            F.coalesce(added, F.array().cast("array<string>")),
                        )
                    ),
                )
                continue
            cond = r.condition(df)
            if gate is not None:
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
            # ``script`` is a file name in the reference
            # (selector_lua.go:31-38). Resolution order: a registered
            # entry in ``scripts`` (a Python callable -> the rrname
            # pandas slot for back-compat, a Python process(o) callable
            # via mode 'lua' when marked, or Lua SOURCE TEXT -> the
            # real-Lua slot), else the file under base_dir read as Lua
            # source (requires lupa at run time).
            key = spec.get("script", name)
            val = (scripts or {}).get(key)
            if val is None and base_dir is not None:
                path = os.path.join(base_dir, key)
                if os.path.exists(path):
                    with open(path) as f:
                        val = f.read()
            if val is None:
                raise ValueError(
                    f"rule {name}: type 'lua' needs a registered script "
                    f"or a readable file (scripts={sorted(scripts or {})})"
                )
            if callable(val):
                if getattr(val, "lua_process", False):
                    rules.append(
                        SelectorRule(
                            name=name,
                            tags=tuple(spec.get("tags", ())),
                            mode="lua",
                            process_fn=val,
                            ingest=tuple(spec.get("ingest", ())),
                        )
                    )
                else:
                    rules.append(
                        SelectorRule(
                            name=name,
                            tags=tuple(spec.get("tags", ())),
                            mode="pandas",
                            pandas_fn=val,
                            ingest=tuple(spec.get("ingest", ())),
                        )
                    )
            else:
                rules.append(
                    SelectorRule(
                        name=name,
                        tags=tuple(spec.get("tags", ())),
                        mode="lua",
                        script=str(val),
                        ingest=tuple(spec.get("ingest", ())),
                    )
                )
        else:
            raise ValueError(f"rule {name}: unknown selector type {rtype!r}")
    return rules
