"""URL scalar functions (functions/url.py): part extraction and the
registrable-domain heuristic, with engine parity (Spark Column vs the
DuckDB SQL generators) as the correctness bar."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from balboa_spark.functions import url as U

URLS = [
    "https://www.Example.co.uk/a/b?x=1#frag",
    "http://sub.site.com/path",
    "https://user:pw@host.org:8443/p?q=2",
    "ftp://192.168.0.1/file",
    "https://single",
    "not a url",
    "https://a.b.c.com.au/",
    "https://www.gov.uk",
    "https://x.com/p#frag\n",  # un-stripped crawl URI: trailing newline
    None,
]
PARTS = ["scheme", "host", "port", "path", "query", "fragment"]


def test_parts_and_domain_with_engine_parity(spark):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(URLS)], "i long, u string"
    )
    sel = (
        [F.col("i")]
        + [U.url_part(F.col("u"), p).alias(p) for p in PARTS]
        + [U.registered_domain(F.col("u")).alias("dom")]
    )
    got = {
        r["i"]: tuple(r[p] for p in PARTS) + (r["dom"],)
        for r in df.select(*sel).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", list(enumerate(URLS)))
    cols = ", ".join(U.url_part_sql("u", p) + f" AS {p}" for p in PARTS)
    want = {
        row[0]: tuple(row[1:])
        for row in con.sql(
            f"SELECT i, {cols}, {U.registered_domain_sql('u')} AS dom FROM t"
        ).fetchall()
    }
    assert got == want
    # semantic spot checks (heuristic branches)
    assert got[0] == (
        "https", "www.example.co.uk", "", "/a/b", "x=1", "frag", "example.co.uk"
    )
    assert got[2][1:3] == ("host.org", "8443")
    assert got[3][-1] == "192.168.0.1"  # IP passes through whole
    assert got[6][-1] == "c.com.au"  # second-level registry -> 3 labels
    assert got[7][-1] == "gov.uk"  # www-stripped 2-label host kept whole
    assert got[8][4:6] == ("", "frag")  # fragment stops at the newline
    assert got[9][-1] is None  # null in, null out


def test_unknown_part_raises(spark):
    with pytest.raises(ValueError):
        U.url_part(F.col("u"), "nope")
    with pytest.raises(ValueError):
        U.url_part_sql("u", "nope")


def test_engine_parity_fuzz(spark):
    """Random URL-ish strings through both engines — parts AND
    registered_domain must agree on arbitrary junk, not just
    well-formed URLs."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    frag = st.sampled_from([
        "https://", "http://", "ftp://", "www.", "a.", "b", ".co.uk",
        ".com", ":8080", "/path", "?q=1", "#frag", "@user", "..", ":",
        "192.168.0.1", "", "x", "näme",
    ])
    u = st.lists(frag, max_size=8).map("".join)

    @settings(
        max_examples=4, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(urls=st.lists(u, min_size=1, max_size=25))
    def check(urls):
        df = spark.createDataFrame(list(enumerate(urls)), "i long, u string")
        sel = (
            [F.col("i")]
            + [U.url_part(F.col("u"), p).alias(p) for p in PARTS]
            + [U.registered_domain(F.col("u")).alias("dom")]
        )
        got = {
            r["i"]: tuple(r[p] for p in PARTS) + (r["dom"],)
            for r in df.select(*sel).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t (i BIGINT, u VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?,?)", list(enumerate(urls)))
        cols = ", ".join(U.url_part_sql("u", p) + f" AS {p}" for p in PARTS)
        want = {
            row[0]: tuple(row[1:])
            for row in con.sql(
                f"SELECT i, {cols}, {U.registered_domain_sql('u')} AS dom FROM t"
            ).fetchall()
        }
        assert got == want

    check()
