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
