"""Controlled PSL arm A/B (VERDICT r9 task #4): same session, same
JVM, same data — attribute the pipeline_crawl 1.48s->3.00s drift.

Arms, over the exact psl_domain_key workload (documents -> synth url
-> domain key -> groupBy count) at sf0.1:

  a. r8 per-depth array_contains scan (git 34853a7), snapshot rules
  b. r9 isin/InSet probe (current default), snapshot rules
  c. isin/InSet probe, FULL pinned published list (9,506 rules)
  d. broadcast-join arm, snapshot rules
  e. broadcast-join arm, FULL list

Each arm: N passes, min + median reported. Run:
    python scripts/psl_ab.py [passes]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf type hints)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def r8_ps_len_expr(labels, n, normal, wild, exc):
    """The r8 arm verbatim (git 34853a7): per-rule literal arrays
    scanned with array_contains — linear in rules-per-depth."""
    from pyspark.sql import functions as F

    candidates = [F.lit(1)]
    for k, vals in normal.items():
        arr = F.array(*[F.lit(v) for v in sorted(vals)])
        candidates.append(
            F.when((n >= k) & F.array_contains(arr, _last_k(labels, k)), k).otherwise(0)
        )
    for k, bases in wild.items():
        arr = F.array(*[F.lit(v) for v in sorted(bases)])
        candidates.append(
            F.when((n >= k + 1) & F.array_contains(arr, _last_k(labels, k)), k + 1).otherwise(0)
        )
    ps_len = F.greatest(*candidates) if len(candidates) > 1 else candidates[0]
    for k, vals in exc.items():
        arr = F.array(*[F.lit(v) for v in sorted(vals)])
        ps_len = F.when((n >= k) & F.array_contains(arr, _last_k(labels, k)), k - 1).otherwise(ps_len)
    return ps_len


def _last_k(labels, k):
    from pyspark.sql import functions as F

    return F.concat_ws(".", F.slice(labels, -k, k))


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from pyspark.sql import functions as F

    from balboa_spark.entry_queries_corpus import _synth_url_col
    from balboa_spark.functions import psl
    from balboa_spark.session import get_spark, load_tables

    spark = get_spark("psl-ab")
    load_tables(spark, SF_DIR, names=("documents",))
    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    urls = (
        spark.table("documents")
        .repartition(n_cpus)
        .select(_synth_url_col().alias("url"))
    )
    urls.persist().count()  # pin the input so every arm reads identical bytes

    full_rules = psl.load_psl_rules(
        os.path.join(REPO, "balboa_spark", "data", "public_suffix_list.dat")
    )

    def col_arm(ps_fn, rules):
        normal, wild, exc = psl.parse_rules(rules)
        host = psl.host_of(F.col("url"))
        labels = F.split(host, r"\.")
        n = F.size(labels)
        is_ip = host.rlike(r"^[0-9.]+$")
        ps_len = ps_fn(labels, n, normal, wild, exc)
        reg_len = F.least(ps_len + 1, n)
        dom = (
            F.when(F.col("url").isNull(), F.lit(None).cast("string"))
            .when(is_ip | (n <= 1), host)
            .otherwise(F.concat_ws(".", F.slice(labels, -reg_len, reg_len)))
        )
        return urls.select(dom.alias("d")).groupBy("d").count()

    def join_arm(rules):
        rdf = psl.psl_rules_df(spark, rules)
        out = psl.with_registered_domain_psl(urls, "url", rdf, out_col="d")
        return out.groupBy("d").count()

    def staged_arm(rules):
        return (
            psl.psl_staged_domain(urls, "url", rules=rules, out_col="d")
            .groupBy("d")
            .count()
        )

    arms = {
        "a_r8_array_contains_snapshot": lambda: col_arm(r8_ps_len_expr, psl.PSL_SNAPSHOT),
        "b_r9_inset_snapshot": lambda: col_arm(psl._ps_len_expr, psl.PSL_SNAPSHOT),
        "c_inset_full_list": lambda: col_arm(psl._ps_len_expr, full_rules),
        "d_join_snapshot": lambda: join_arm(psl.PSL_SNAPSHOT),
        "e_join_full_list": lambda: join_arm(full_rules),
        # r10 default: staged projections + one JVM-parsed SQL probe
        # string (NB: each timed pass REBUILDS the query, so this arm
        # measures build+exec like a real caller — the r10 regression
        # was exactly a per-build cost the old warm-up hid)
        "f_staged_sql_full_list": lambda: staged_arm(None),
        "g_staged_sql_snapshot": lambda: staged_arm(psl.PSL_SNAPSHOT),
    }

    # warm-up (untimed): one run of each arm pays codegen/broadcast once
    for fn in arms.values():
        fn().write.mode("overwrite").format("noop").save()

    out = {}
    for name, fn in arms.items():
        ts = []
        for _ in range(passes):
            t0 = time.time()
            fn().write.mode("overwrite").format("noop").save()
            ts.append(round(time.time() - t0, 3))
        out[name] = {"min": min(ts), "median": round(statistics.median(ts), 3), "all": ts}
        print(f"[psl-ab] {name}: min={out[name]['min']}s median={out[name]['median']}s {ts}",
              file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
