"""Selector engine (F1-F4) + tag routing (U3) tests.

Fixture = the reference's own shipped config (FIXTURES.md §4):
- unwanted_regex.txt: ^.*[.]de$  (mode filter -> tag filtered_tlds on NON-match)
- cobaltstrike_regex.txt: ^.*[a-z]{3}[.]stage[.][0-9]+[.].*$
  (mode select, ingest: [filtered_tlds] -> tag possible_cobaltstrike)
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from balboa_spark.streaming.selectors import (
    SelectorRule,
    compile_selectors,
    load_selector_yaml,
    route,
)

RULES = [
    SelectorRule(
        name="unwanted",
        tags=["filtered_tlds"],
        mode="filter",
        patterns=[r"^.*[.]de$"],
    ),
    SelectorRule(
        name="cobaltstrike",
        tags=["possible_cobaltstrike"],
        mode="select",
        patterns=[r"^.*[a-z]{3}[.]stage[.][0-9]+[.].*$"],
        ingest=["filtered_tlds"],
    ),
]


def obs(spark, *rrnames):
    ts = dt.datetime(2020, 1, 1)
    rows = [(1, "NOERROR", "1.2.3.4", "A", n, "s1", ts, ts, []) for n in rrnames]
    return spark.createDataFrame(
        rows,
        "count long, rcode string, rdata string, rrtype string, rrname string,"
        " sensor_id string, ts_start timestamp, ts_end timestamp, tags array<string>",
    )


def test_reference_selector_composition(spark):
    """README.md:149-150: non-.de rows get filtered_tlds; of those, the
    CobaltStrike pattern additionally gets possible_cobaltstrike."""
    df = obs(
        spark,
        "web.de",                      # .de -> no tags
        "example.com",                 # non-.de -> filtered_tlds
        "xyzabc.stage.123.evil.com",   # non-.de + CS pattern -> both tags
        "abc.stage.1.x.de",            # .de -> no tags (gate blocks CS rule)
    )
    tagged = compile_selectors(RULES)(df)
    got = {r.rrname: sorted(r.tags) for r in tagged.collect()}
    assert got["web.de"] == []
    assert got["example.com"] == ["filtered_tlds"]
    assert got["xyzabc.stage.123.evil.com"] == ["filtered_tlds", "possible_cobaltstrike"]
    assert got["abc.stage.1.x.de"] == []


def test_rows_never_dropped(spark):
    df = obs(spark, "a.de", "b.com", "c.org")
    assert compile_selectors(RULES)(df).count() == 3


def test_cycle_rejected():
    cyc = [
        SelectorRule(name="a", tags=["t1"], mode="select", patterns=["x"], ingest=["t2"]),
        SelectorRule(name="b", tags=["t2"], mode="select", patterns=["x"], ingest=["t1"]),
    ]
    with pytest.raises(ValueError, match="cyclic"):
        compile_selectors(cyc)


def test_predicate_and_pandas_rules(spark):
    """X2: the scriptable (Lua-equivalent) selector slot."""
    import pandas as pd

    rules = [
        SelectorRule(
            name="long_names",
            tags=["long"],
            mode="predicate",
            predicate=lambda df: F.length("rrname") > 10,
        ),
        SelectorRule(
            name="has_digit",
            tags=["digit"],
            mode="pandas",
            pandas_fn=lambda s: s.str.contains(r"\d"),
        ),
    ]
    df = obs(spark, "short.de", "a-quite-long-name.com", "x1.de")
    got = {r.rrname: sorted(r.tags) for r in compile_selectors(rules)(df).collect()}
    assert got["short.de"] == []
    assert got["a-quite-long-name.com"] == ["long"]
    assert got["x1.de"] == ["digit"]


def test_routing_partition_property(spark):
    """§2.12 #8: disjoint-tag routes union back to the input."""
    df = obs(spark, "web.de", "example.com", "xyzabc.stage.123.evil.com")
    tagged = compile_selectors(RULES)(df).cache()
    routes = route(
        tagged,
        {
            "catch_all": [],
            "cs_sink": ["possible_cobaltstrike"],
            "tld_sink": ["filtered_tlds"],
        },
    )
    assert routes["catch_all"].count() == 3
    assert routes["cs_sink"].count() == 1
    assert routes["tld_sink"].count() == 2  # CS row carries both tags
    assert "tags" not in routes["cs_sink"].columns  # stripped before sink


def test_yaml_loader():
    """The reference's own selectors.yaml shape verbatim
    (README.md:129-147): a list of rules with regexp file lists."""
    import yaml

    cfg = yaml.safe_load(
        """
selectors:
  - name: Filter Unwanted TLDs
    type: regex
    mode: filter
    regexp:
      - unwanted_regex.txt
    tags:
      - filtered_tlds
  - name: CobaltStrike Regex
    type: regex
    mode: select
    regexp:
      - cobaltstrike_regex.txt
    ingest:
      - filtered_tlds
    tags:
      - possible_cobaltstrike
"""
    )
    files = {
        "unwanted_regex.txt": [r"^.*[.]de$"],
        "cobaltstrike_regex.txt": [r"^.*[a-z]{3}[.]stage[.][0-9]+[.].*$"],
    }
    rules = load_selector_yaml(cfg, files)
    assert {r.name for r in rules} == {"Filter Unwanted TLDs", "CobaltStrike Regex"}
    cs = next(r for r in rules if r.name == "CobaltStrike Regex")
    assert cs.ingest == ("filtered_tlds",)
    assert cs.mode == "select" and cs.patterns


def test_yaml_loader_reads_pattern_files_from_disk(tmp_path):
    """regexp entries name one-regex-per-line files resolved against
    the config directory, empty lines skipped, non-compiling lines
    fatal (selector_regex.go:109-124)."""
    import pytest
    import yaml

    (tmp_path / "unwanted_regex.txt").write_text("^.*[.]de$\n\n^.*[.]test$\n")
    cfg = yaml.safe_load(
        """
selectors:
  - name: Filter Unwanted TLDs
    type: regex
    mode: filter
    regexp:
      - unwanted_regex.txt
    tags: [filtered_tlds]
"""
    )
    (rule,) = load_selector_yaml(cfg, base_dir=str(tmp_path))
    assert rule.patterns == ("^.*[.]de$", "^.*[.]test$")

    (tmp_path / "bad.txt").write_text("([unclosed\n")
    cfg["selectors"][0]["regexp"] = ["bad.txt"]
    with pytest.raises(ValueError, match="does not compile"):
        load_selector_yaml(cfg, base_dir=str(tmp_path))


def test_yaml_loader_lua_slot(spark):
    """type: lua binds a registered script callable (X2)."""
    cfg = {
        "selectors": [
            {"name": "digits", "type": "lua", "script": "has_digit", "tags": ["digit"]}
        ]
    }
    rules = load_selector_yaml(cfg, scripts={"has_digit": lambda s: s.str.contains(r"\d")})
    df = obs(spark, "x1.de", "plain.de")
    got = {r.rrname: sorted(r.tags) for r in compile_selectors(rules)(df).collect()}
    assert got == {"x1.de": ["digit"], "plain.de": []}


def test_domain_suffixes_and_blocklist_match(spark):
    """Wildcard indicator semantics: an entry matches the exact name
    and every subdomain; multiple matching entries alert separately;
    short names yield only themselves."""
    from pyspark.sql import functions as F

    from balboa_spark.functions.strings import domain_suffixes
    from balboa_spark.operators.query import blocklist_match

    sfx = (
        spark.range(1)
        .select(domain_suffixes(F.lit("a.b.evil.example")).alias("s"))
        .collect()[0]["s"]
    )
    assert sfx == ["a.b.evil.example", "b.evil.example", "evil.example"]
    assert (
        spark.range(1)
        .select(domain_suffixes(F.lit("example")).alias("s"))
        .collect()[0]["s"]
    ) == ["example"]

    obs = spark.createDataFrame(
        [
            ("c2.evil.example", 3),
            ("evil.example", 1),       # exact match
            ("sub.c2.evil.example", 2),
            ("benign.example", 5),
        ],
        "rrname string, count long",
    )
    bl = spark.createDataFrame(
        [("evil.example",), ("c2.evil.example",)], "domain string"
    )
    got = sorted(
        (r["rrname"], r["domain"])
        for r in blocklist_match(obs, bl).collect()
    )
    assert got == [
        ("c2.evil.example", "c2.evil.example"),
        ("c2.evil.example", "evil.example"),
        ("evil.example", "evil.example"),
        ("sub.c2.evil.example", "c2.evil.example"),
        ("sub.c2.evil.example", "evil.example"),
    ]


# --- X2 real-Lua slot (selector_lua.go:116-158, selector.lua:1-24) ----------


def test_lua_observation_call_styles():
    """Colon calls arrive with the observation as arg 1; dot calls
    don't — both must work, and add_tag dedupes/drops empties."""
    from balboa_spark.streaming.selectors import LuaObservation

    o = LuaObservation(
        {"rcode": "NOERROR", "rdata": "1.2.3.4", "rrtype": "A",
         "rrname": "x.de", "sensor_id": "s1"},
        ["seed"],
    )
    assert o.rrname() == "x.de"  # dot style
    assert o.rrname(o) == "x.de"  # colon style (extra self)
    assert o.rcode(o) == "NOERROR" and o.sensor_id() == "s1"
    o.add_tag(o, "foo")  # colon style
    o.add_tag("foo")  # dup ignored
    o.add_tag("")  # empty ignored (selector_lua.go:110)
    o.add_tag(o, "seed")  # already present on the row
    o.add_tag("bar")
    assert o.added == ["foo", "bar"]
    assert o.tags() == ["seed", "foo", "bar"]


def test_lua_rule_python_process_fn(spark):
    """mode='lua' with a Python process(o) stand-in: dynamic add_tag
    tags land on the row, the ingest gate holds, and a missing
    observation column surfaces as '' (not a crash)."""
    from balboa_spark.streaming.selectors import SelectorRule, compile_selectors

    def proc(o):
        if o.rrname().endswith(".de"):
            o.add_tag("de")
            if o.rcode() == "NOERROR":
                o.add_tag("de_ok")

    def downstream(o):
        o.add_tag("routed:" + o.rrname())

    rules = [
        SelectorRule(name="lua_root", tags=["de", "de_ok"], mode="lua",
                     process_fn=proc),
        SelectorRule(name="lua_gated", tags=[], mode="lua",
                     process_fn=downstream, ingest=["de_ok"]),
    ]
    df = obs(spark, "a.de", "b.com")
    got = {r.rrname: sorted(r.tags) for r in compile_selectors(rules)(df).collect()}
    assert got == {"a.de": ["de", "de_ok", "routed:a.de"], "b.com": []}

    # missing rcode column -> '' per the contract
    def wants_rcode(o):
        o.add_tag("rc=" + (o.rcode() or "<empty>"))

    df2 = spark.createDataFrame([("x.de",)], "rrname string")
    out = compile_selectors(
        [SelectorRule(name="m", tags=[], mode="lua", process_fn=wants_rcode)]
    )(df2).collect()
    assert sorted(out[0].tags) == ["rc=<empty>"]


def test_lua_rule_real_lua(spark):
    """Real Lua via lupa: the reference's example contract verbatim —
    colon method calls, #tags/tags[i] table iteration, add_tag
    (selector.lua:1-24). Skips cleanly when lupa is absent."""
    pytest.importorskip("lupa")
    from balboa_spark.streaming.selectors import SelectorRule, compile_selectors

    script = """
    function process(o)
        local tags = o:tags()
        local n = #tags
        if string.find(o:rrname(), "%.de$") then
            o:add_tag("lua_de")
            o:add_tag("seen_" .. n .. "_tags")
        end
        if o:rcode() == "NOERROR" and o:rrtype() == "A" then
            o:add_tag("a_ok")
        end
    end
    """
    rules = [SelectorRule(name="real", tags=[], mode="lua", script=script)]
    df = obs(spark, "a.de", "b.com")
    got = {r.rrname: sorted(r.tags) for r in compile_selectors(rules)(df).collect()}
    assert got == {"a.de": ["a_ok", "lua_de", "seen_0_tags"], "b.com": ["a_ok"]}


def test_lua_rule_without_lupa_raises(spark):
    """A real-Lua rule without lupa fails loudly at action time with
    the install hint, not silently."""
    try:
        import lupa  # noqa: F401

        pytest.skip("lupa installed; the gated error path is moot")
    except ImportError:
        pass
    from balboa_spark.streaming.selectors import SelectorRule, compile_selectors

    rules = [SelectorRule(name="r", tags=[], mode="lua",
                          script="function process(o) end")]
    df = obs(spark, "a.de")
    with pytest.raises(Exception, match="lupa"):
        compile_selectors(rules)(df).collect()


def test_yaml_loader_lua_source_and_file(tmp_path, spark):
    """type: lua resolution order — registered Lua SOURCE TEXT or a
    script FILE under base_dir both land on mode='lua'; a registered
    callable marked lua_process lands on process_fn; a plain callable
    keeps the legacy rrname-pandas slot."""
    from balboa_spark.streaming.selectors import load_selector_yaml

    (tmp_path / "sel.lua").write_text("function process(o) end\n")
    cfg = {
        "selectors": [
            {"name": "from_file", "type": "lua", "script": "sel.lua"},
            {"name": "from_text", "type": "lua", "script": "inline"},
            {"name": "from_proc", "type": "lua", "script": "pyproc"},
            {"name": "legacy", "type": "lua", "script": "plain"},
        ]
    }

    def pyproc(o):
        o.add_tag("t")

    pyproc.lua_process = True
    scripts = {
        "inline": "function process(o) o:add_tag('x') end",
        "pyproc": pyproc,
        "plain": lambda s: s.str.contains("a"),
    }
    rules = {r.name: r for r in load_selector_yaml(cfg, scripts=scripts,
                                                   base_dir=str(tmp_path))}
    assert rules["from_file"].mode == "lua"
    assert "process" in rules["from_file"].script
    assert rules["from_text"].mode == "lua"
    assert rules["from_proc"].mode == "lua"
    assert rules["from_proc"].process_fn is pyproc
    assert rules["legacy"].mode == "pandas"


def test_lua_rule_gate_blocks_script_execution(spark):
    """The ingest gate must prevent the script from RUNNING on
    excluded rows, not just discard its output — the reference only
    calls ProcessObservation on matching rows
    (selector_engine.go:110-128), so a script that would crash on an
    ungated row must not kill the job."""
    from balboa_spark.streaming.selectors import SelectorRule, compile_selectors

    def bomb(o):
        if not o.rrname().endswith(".de"):
            raise RuntimeError("script ran on ungated row")
        o.add_tag("ok")

    rules = [
        SelectorRule(name="root", tags=["de"], mode="select",
                     patterns=[r"\.de$"]),
        SelectorRule(name="gated", tags=[], mode="lua", process_fn=bomb,
                     ingest=["de"]),
    ]
    df = obs(spark, "a.de", "b.com")
    got = {r.rrname: sorted(r.tags) for r in compile_selectors(rules)(df).collect()}
    assert got == {"a.de": ["de", "ok"], "b.com": []}
