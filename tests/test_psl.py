"""PSL-backed registrable domain (functions/psl.py): the published
checkPublicSuffix semantics (longest match, wildcard, exception) with
three-way parity — Column codegen arm vs DuckDB SQL twin vs the
broadcast-join arm — plus the full-file loader."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from balboa_spark.functions import psl as P

# (url, expected registrable domain) — drawn from the published
# checkPublicSuffix vectors where our pinned snapshot carries the
# rule; hosts that ARE a public suffix pass through whole (documented
# deviation, keeps domain grouping total).
CASES = [
    ("http://www.example.com/x", "example.com"),
    ("https://b.example.co.uk", "example.co.uk"),
    ("https://a.b.example.co.uk", "example.co.uk"),
    ("http://www.ck/", "www.ck"),  # exception !www.ck
    ("http://some.www.ck/", "www.ck"),
    ("http://foo.bar.ck/", "foo.bar.ck"),  # wildcard *.ck
    ("http://city.kawasaki.jp/", "city.kawasaki.jp"),  # exception
    ("http://bar.foo.kawasaki.jp/", "bar.foo.kawasaki.jp"),  # wildcard
    ("http://example.tokyo.jp/", "example.tokyo.jp"),
    ("http://192.168.0.1/x", "192.168.0.1"),  # IP passthrough
    ("http://localhost/", "localhost"),  # single label passthrough
    ("https://x.y.z.sch.uk/", "y.z.sch.uk"),  # *.sch.uk
    ("https://sub.example.com.au/", "example.com.au"),
    ("HTTPS://WWW.EXAMPLE.COM./", "example.com"),  # case + trailing dot
    ("bare-host.co.nz", "bare-host.co.nz"),  # host-only input
    (None, None),
    # r9: registries outside the r8 ~230-rule subset, now pinned —
    # PRIVATE-section hosters and the explicit registries that
    # replaced the retired *.fj / *.gu wildcards upstream.
    ("https://user.github.io/proj", "user.github.io"),
    ("https://a.b.user.github.io/", "user.github.io"),
    ("http://myblog.blogspot.com/post", "myblog.blogspot.com"),
    ("https://bucket.s3.amazonaws.com/key", "bucket.s3.amazonaws.com"),
    (
        "http://ec2-1-2-3-4.us-west-2.compute.amazonaws.com/",
        "ec2-1-2-3-4.us-west-2.compute.amazonaws.com",
    ),  # *.compute.amazonaws.com wildcard
    ("https://app.netlify.app/", "app.netlify.app"),
    ("https://edge.workers.dev/", "edge.workers.dev"),
    ("https://www.usp.ac.fj/", "usp.ac.fj"),  # explicit ac.fj, not *.fj
    ("http://shop.com.gu/", "shop.com.gu"),  # explicit com.gu, not *.gu
]


def test_column_arm_and_sql_twin_parity(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i long, u string"
    )
    got = {
        r["i"]: r["dom"]
        for r in df.select(
            "i", P.registered_domain_psl(F.col("u")).alias("dom")
        ).collect()
    }
    for i, (u, exp) in enumerate(CASES):
        assert got[i] == exp, (u, got[i], exp)

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, u VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, u) for i, (u, _) in enumerate(CASES)]
    )
    sql = f"SELECT i, {P.registered_domain_psl_sql('u')} AS dom FROM t"
    for i, dom in con.execute(sql).fetchall():
        assert dom == got[i], (CASES[i][0], dom, got[i])


def test_broadcast_join_arm_parity(spark):
    """Join arm matches the vectors INCLUDING the null row (r9: nulls
    previously fell out of the explode and vanished)."""
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i long, u string"
    )
    rules = P.psl_rules_df(spark)
    rows = P.with_registered_domain_psl(df, "u", rules).collect()
    assert len(rows) == len(CASES)
    got = {r["i"]: r["domain"] for r in rows}
    for i, (u, exp) in enumerate(CASES):
        assert got[i] == exp, (u, got[i], exp)


def test_join_arm_keeps_duplicate_rows(spark):
    """Fully-duplicate input rows each produce an output row (r9: the
    groupBy previously keyed on *df.columns and merged them)."""
    df = spark.createDataFrame(
        [("https://a.example.co.uk/",)] * 3 + [(None,)] * 2, "u string"
    )
    out = P.with_registered_domain_psl(df, "u", P.psl_rules_df(spark))
    doms = [r["domain"] for r in out.collect()]
    assert sorted(doms, key=lambda d: (d is None, d)) == [
        "example.co.uk", "example.co.uk", "example.co.uk", None, None,
    ]


def test_join_vs_column_arm_property(spark):
    """Property: on randomized rule subsets and randomized hosts, the
    broadcast-join arm equals the Column arm row-for-row (nulls and
    duplicates included)."""
    import random

    rng = random.Random(0xB41B0A)
    for trial in range(3):
        rules = tuple(
            sorted(rng.sample(P.PSL_SNAPSHOT, k=len(P.PSL_SNAPSHOT) // 2))
        )
        # the raw half-sample is used as-is: an orphaned '!x.y' whose
        # '*.y' fell out of the sample is legal PSL input and both
        # arms must still agree on it
        labels_pool = ["a", "bb", "ck", "uk", "co", "x9", "jp", "kawasaki"]
        hosts = [
            ".".join(rng.choices(labels_pool, k=rng.randint(1, 5)))
            for _ in range(40)
        ] + [None, "192.168.0.1", "a.b.ck", "www.ck", "x.co.uk"]
        hosts += [hosts[2], hosts[2]]  # duplicates
        df = spark.createDataFrame(
            [(i, h) for i, h in enumerate(hosts)], "i long, u string"
        )
        col_arm = {
            r["i"]: r["d"]
            for r in df.select(
                "i",
                P.registered_domain_psl(F.col("u"), rules=rules).alias("d"),
            ).collect()
        }
        join_arm = {
            r["i"]: r["domain"]
            for r in P.with_registered_domain_psl(
                df, "u", P.psl_rules_df(spark, rules)
            ).collect()
        }
        assert join_arm == col_arm, trial


def test_load_psl_rules_roundtrip(spark, tmp_path):
    """A user-supplied PSL file (comments, blanks, wildcard,
    exception) parses and drives both arms identically."""
    f = tmp_path / "psl.dat"
    f.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "com\n"
        "co.uk\n"
        "*.ck\n"
        "!www.ck\n"
        "\n"
        "// ===END===\n"
    )
    rules = P.load_psl_rules(str(f))
    assert rules == ("com", "co.uk", "*.ck", "!www.ck")
    df = spark.createDataFrame(
        [("https://a.b.co.uk/",), ("http://x.foo.ck/",), ("http://www.ck/",)],
        "u string",
    )
    col = {
        r["u"]: r["d"]
        for r in df.select(
            "u", P.registered_domain_psl(F.col("u"), rules=rules).alias("d")
        ).collect()
    }
    assert col["https://a.b.co.uk/"] == "b.co.uk"
    assert col["http://x.foo.ck/"] == "x.foo.ck"
    assert col["http://www.ck/"] == "www.ck"
    join = {
        r["u"]: r["domain"]
        for r in P.with_registered_domain_psl(
            df, "u", P.psl_rules_df(spark, rules)
        ).collect()
    }
    assert join == col


def test_unlisted_registry_differs_from_heuristic(spark):
    """The case the heuristic gets wrong: a second-level registry
    outside its 18-entry list (gob.mx is in PSL_SNAPSHOT, not in
    SECOND_LEVEL_SUFFIXES) — PSL groups by the 3-label registrable
    name, the heuristic truncates to 2 labels."""
    from balboa_spark.functions.url import registered_domain

    df = spark.createDataFrame([("https://portal.cdmx.gob.mx/",)], "u string")
    r = df.select(
        P.registered_domain_psl(F.col("u")).alias("psl"),
        registered_domain(F.col("u")).alias("heur"),
    ).collect()[0]
    assert r["psl"] == "cdmx.gob.mx"
    assert r["heur"] == "gob.mx"


def test_domain_ops_psl_arm(spark):
    """domain_profile/domain_cap route through the PSL key by
    default; psl=False keeps the heuristic key."""
    from balboa_spark.operators import corpus

    rows = [
        (1, "https://a.x.gob.mx/1", "w w w"),
        (2, "https://b.x.gob.mx/2", "w w"),
        (3, "https://c.y.gob.mx/3", "w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    prof = {
        r["domain"]: r["n_docs"]
        for r in corpus.domain_profile(df).collect()
    }
    assert prof == {"x.gob.mx": 2, "y.gob.mx": 1}
    heur = {
        r["domain"]: r["n_docs"]
        for r in corpus.domain_profile(df, psl=False).collect()
    }
    assert heur == {"gob.mx": 3}
    capped = corpus.domain_cap(df, cap=1)
    assert capped.count() == 2  # one per PSL domain
    assert corpus.domain_cap(df, cap=1, psl=False).count() == 1


FULL_LIST_VECTORS = [
    # 12 registries OUTSIDE the 280-rule snapshot (r10 done-criterion:
    # they resolve correctly BY DEFAULT), spanning ICANN 2-label,
    # ICANN 3-label, wildcard, and PRIVATE-section rules.
    ("https://shop.foo.com.ac/x", "foo.com.ac"),          # ICANN com.ac
    ("https://a.b.nom.ad", "b.nom.ad"),                   # ICANN nom.ad
    ("https://fly.crew.aero/", "fly.crew.aero"),          # ICANN .aero 2-label
    ("https://www.dept.sth.ac.at", "dept.sth.ac.at"),     # ICANN 3-label
    ("https://x.catholic.edu.au", "x.catholic.edu.au"),   # ICANN 3-label
    ("https://portal.health.qld.gov.au", "health.qld.gov.au"),  # ICANN 3-label
    ("https://a.algo.nom.br/p", "a.algo.nom.br"),         # wildcard *.nom.br
    ("https://app.lb1.elb.amazonaws.com", "app.lb1.elb.amazonaws.com"),  # wildcard PRIVATE *.elb.amazonaws.com
    ("https://media.cdn77.akamaized.net", "cdn77.akamaized.net"),  # PRIVATE akamaized.net
    ("https://b.s3.eu-central-1.amazonaws.com", "b.s3.eu-central-1.amazonaws.com"),  # PRIVATE s3 4-label
    ("https://x.img.akamaihd.net", "img.akamaihd.net"),   # PRIVATE akamaihd.net
    ("https://one.two.akamai-staging.net", "two.akamai-staging.net"),  # PRIVATE
]


def test_full_list_default_vectors(spark):
    """psl_staged_domain resolves registries OUTSIDE the snapshot
    correctly with NO rules argument — the full pinned published list
    is the default (r10). The same hosts through the snapshot-default
    pure-Column arm mis-group (proving the vectors actually exercise
    rules beyond the snapshot)."""
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(FULL_LIST_VECTORS)], "i long, u string"
    )
    got = {
        r["i"]: r["d"]
        for r in P.psl_staged_domain(df, "u", out_col="d").collect()
    }
    for i, (u, want) in enumerate(FULL_LIST_VECTORS):
        assert got[i] == want, f"{u}: got {got[i]!r}, want {want!r}"
    # control: the snapshot misses at least 10 of these registries
    snap = {
        r["i"]: r["d"]
        for r in df.select(
            F.col("i"), P.registered_domain_psl(F.col("u")).alias("d")
        ).collect()
    }
    missed = sum(
        1 for i, (_, want) in enumerate(FULL_LIST_VECTORS) if snap[i] != want
    )
    assert missed >= 10, f"vectors too snapshot-covered: only {missed} differ"


def test_domain_ops_use_full_list_by_default(spark):
    """domain_profile/domain_cap group by full-list registrable names
    (com.ac is not in the snapshot)."""
    from balboa_spark.operators import corpus

    rows = [
        (1, "https://a.foo.com.ac/1", "w w w"),
        (2, "https://b.foo.com.ac/2", "w w"),
        (3, "https://c.bar.com.ac/3", "w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    prof = {
        r["domain"]: r["n_docs"] for r in corpus.domain_profile(df).collect()
    }
    assert prof == {"foo.com.ac": 2, "bar.com.ac": 1}
    capped = corpus.domain_cap(df, cap=1)
    assert capped.count() == 2  # one per registrable domain


def test_staged_arm_equals_join_arm_on_full_list(spark):
    """Cross-arm agreement ON THE FULL LIST: staged-projection Column
    arm == broadcast-join arm row-for-row (incl. NULL and an IP)."""
    hosts = [u for u, _ in FULL_LIST_VECTORS] + [None, "192.168.0.1", "localhost"]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "i long, u string"
    )
    full = P.full_psl_rules()
    staged = {
        r["i"]: r["d"]
        for r in P.psl_staged_domain(df, "u", rules=full, out_col="d").collect()
    }
    joined = {
        r["i"]: r["d"]
        for r in P.with_registered_domain_psl(
            df, "u", P.psl_rules_df(spark, full), out_col="d"
        ).collect()
    }
    assert staged == joined


def test_staged_arm_temp_collision_rejected(spark):
    df = spark.createDataFrame([(1, "a.co.uk")], "i long, __psl_host string")
    df = df.withColumnRenamed("i", "u")  # keep a url col named u? no — use __psl_host as data col
    import pytest

    with pytest.raises(ValueError, match="__psl_host"):
        P.psl_staged_domain(df, "u", out_col="d")


def test_staged_sql_vs_column_arm_property(spark):
    """Property: on randomized rule subsets — including rules with
    SQL-hostile characters — the staged arm's JVM-parsed SQL probe
    string (r10 `_ps_len_sql_for`) equals the pure-Column arm
    row-for-row. Targets the literal-escaping and precedence of the
    SQL renderer specifically."""
    import random

    rng = random.Random(0x5A51)
    hostile = ("o'neill.xx", "*.o'neill.xx", "back\\slash.yy")
    for trial in range(3):
        rules = tuple(
            sorted(rng.sample(P.PSL_SNAPSHOT, k=len(P.PSL_SNAPSHOT) // 3))
            + list(hostile)
        )
        labels_pool = [
            "a", "bb", "ck", "uk", "co", "jp", "o'neill", "xx",
            "back\\slash", "yy", "kawasaki",
        ]
        hosts = [
            ".".join(rng.choices(labels_pool, k=rng.randint(1, 5)))
            for _ in range(40)
        ] + [None, "10.0.0.7", "w.o'neill.xx", "a.back\\slash.yy"]
        df = spark.createDataFrame(
            [(i, h) for i, h in enumerate(hosts)], "i long, u string"
        )
        col_arm = {
            r["i"]: r["d"]
            for r in df.select(
                "i",
                P.registered_domain_psl(F.col("u"), rules=rules).alias("d"),
            ).collect()
        }
        staged = {
            r["i"]: r["d"]
            for r in P.psl_staged_domain(df, "u", rules=rules, out_col="d")
            .select("i", "d")
            .collect()
        }
        assert staged == col_arm, trial
