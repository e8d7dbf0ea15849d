"""HTML -> text extraction (operators/text.py html_to_text): the
crawl-pipeline step between a raw WARC payload and the documents
table. Correctness bar: the Spark regexp_replace chain and the DuckDB
replay (html_to_text_sql) produce IDENTICAL strings — the shared-
constants oracle contract the driver query relies on."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from balboa_spark.operators.text import html_to_text, html_to_text_sql

CASES = [
    "<html><head><title>T</title><style>p{color:red}</style></head>"
    "<body><h1>Head</h1><p>one &amp; two</p>"
    "<script>var x=1<2;</script></body></html>",
    "<p>a</p>\n\n\n<p>b</p>",
    "plain text, no markup",
    '<div class="x"><ul><li>i1</li><li>i2</li></ul></div>',
    "&amp;lt; decodes once: &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;!",
    "<SCRIPT>upper case</SCRIPT>kept<BR/>next",
    "<!-- comment --><table><tr><td>c1</td><td>c2</td></tr></table>",
    "  \t leading and trailing \n\n\n\n ",
    "<pre>code  spacing</pre>after",
    "",
    "\x0bvertical tab edges\x0b",  # Java \s matches \x0b, RE2's does not —
    # the strip rules must use an explicit class to stay engine-equal
]


def test_cases_and_engine_parity(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "i long, h string")
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE c (i BIGINT, h VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(CASES)))
    oracle = {
        i: t
        for i, t in con.sql(
            f"SELECT i, {html_to_text_sql('h')} AS t FROM c"
        ).fetchall()
    }
    assert got == oracle
    # spot-check the semantics themselves, not just parity
    assert got[0] == "T\n\nHead\n\none & two"
    assert got[1] == "a\n\nb"
    assert got[2] == "plain text, no markup"
    assert got[4] == "&lt; decodes once: <tag> \"q\" 's' !"
    assert got[5] == "kept\nnext"
    assert got[6] == "c1\n\nc2"  # adjacent block tags cap at one blank line
    assert got[7] == "leading and trailing"
    assert got[9] == ""


def test_composes_with_wet_source(spark, tmp_path):
    """The intended chain: WARC/WET record payload -> html_to_text ->
    documents-shaped rows."""
    from balboa_spark.sources import wet

    html = "<html><body><h1>Page</h1><p>body text</p></body></html>"
    (tmp_path / "x.wet").write_bytes(wet.wet_bytes([("<id>", "http://u", html)]))
    docs = (
        wet.read_wet(spark, str(tmp_path))
        .select(
            F.col("record_id").alias("doc_id"),
            html_to_text(F.col("text")).alias("text"),
        )
        .collect()
    )
    assert docs[0]["text"] == "Page\n\nbody text"


def test_pure_codegen_no_python(spark):
    """The chain must stay JVM-side: no ArrowEvalPython/BatchEvalPython
    in the plan (it is regexp_replace all the way down)."""
    df = spark.createDataFrame([("<p>x</p>",)], "h string")
    plan = (
        df.select(html_to_text(F.col("h")).alias("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_engine_parity_fuzz(spark):
    """Random tag-soup batches through BOTH engines: the rule chain
    must agree byte-for-byte on arbitrary fragments, not just the
    curated cases (each example is one Spark job over a 25-string
    batch, so the fuzz stays cheap)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    frag = st.sampled_from([
        "<p>", "</p>", "<div class='x'>", "<script>", "</script>", "<br/>",
        "&amp;", "&lt;", "&nbsp;", "<!--", "-->", "plain", "täxt", " ",
        "\n", "\t", "<h1>", "</h1>", "<weird", ">", "<STYLE>", "</style>",
    ])
    doc = st.lists(frag, max_size=12).map("".join)

    @settings(
        max_examples=4, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(docs=st.lists(doc, min_size=1, max_size=25))
    def check(docs):
        df = spark.createDataFrame(list(enumerate(docs)), "i long, h string")
        got = {
            r["i"]: r["t"]
            for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE c (i BIGINT, h VARCHAR)")
        con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(docs)))
        want = dict(
            con.sql(f"SELECT i, {html_to_text_sql('h')} FROM c").fetchall()
        )
        assert got == want

    check()


# ---------------------------------------------------------------------------
# extract_main_content: block-level boilerplate gate
# ---------------------------------------------------------------------------


def _mc(spark, page, **kw):
    from balboa_spark.operators.text import extract_main_content

    df = spark.createDataFrame([(1, page)], "id long, html string")
    return df.select(
        extract_main_content(F.col("html"), **kw).alias("t")
    ).first()["t"]


def test_main_content_drops_chrome_keeps_article(spark):
    page = (
        '<html><body><div><a href="/">Home</a> <a href="/a">About</a></div>'
        "<p>The long article body has enough characters to pass the gate "
        'and an inline <a href="/d">link</a> that is fine.</p>'
        "<p>short</p>"
        '<div><a href="/p">Privacy</a> <a href="/t">Terms</a></div>'
        "<script>var x = '<p>not content</p>';</script></body></html>"
    )
    got = _mc(spark, page)
    assert got.startswith("The long article body")
    assert "Home" not in got and "Privacy" not in got
    assert "short" not in got and "not content" not in got
    assert "link" in got  # inline anchor text survives in content


def test_main_content_density_and_length_gates(spark):
    # a long but fully-link block must drop (density), and lowering
    # min_block_chars admits a shorter block
    linky = "<div><a>" + "x" * 200 + "</a></div><p>tiny but real</p>"
    assert _mc(spark, linky) == ""
    assert _mc(spark, linky, min_block_chars=5) == "tiny but real"
    # empty page / all-chrome page -> empty string, not null
    assert _mc(spark, "<div><a href='/'>nav</a></div>") == ""


def test_main_content_matches_duckdb(spark):
    import duckdb

    from balboa_spark.operators.text import extract_main_content_sql

    pages = [
        '<body><div><a href="/">Home</a></div><p>'
        + ("word " * 30)
        + '</p><div><a href="/t">Terms of service</a></div></body>',
        "<p>Entities &amp; &lt;tags&gt; inside a sufficiently long "
        "article block stay decoded exactly like html_to_text.</p>",
        "",
    ]
    con = duckdb.connect()
    for page in pages:
        got = _mc(spark, page)
        want = con.execute(
            "SELECT " + extract_main_content_sql("html")
            + " AS t FROM (SELECT ? AS html)",
            [page],
        ).fetchone()[0]
        assert got == want, page
