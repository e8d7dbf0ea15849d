"""sf0.1 -> sf1.0 empirical scale probe (VERDICT r7/r8/r9 order).

Times the six scale-suspect queries at sf0.1 (driver data) and sf1.0
(scripts/make_scaledata.py output, 10x rows) in ONE session and prints
per-item ratios. A shuffle-bound ~linear operator should land near
10x (sub-linear where the sf0.1 run was dominated by fixed overhead —
Spark job launch, Python worker spin-up — which at these sizes is a
large fraction of wall time); anything well ABOVE ~12x is flagged
super-linear.

Run: python scripts/scale_probe.py [passes]    (default 2, min taken)
Output: one JSON line {"items": {name: {"sf0.1": s, "sf1": s,
"ratio": r, "flag": bool}}} plus a markdown table on stderr for
PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-global: pandas_udf type hints resolve here

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scaledata", "sf1")

ITEMS = [
    "pipeline_pretrain",
    "corpus_span_dedup",
    "customer_fuzzy_pairs",
    "corpus_passage_cdc",
    "dedup_semantic",
    "pipeline_crawl",
]


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    names = sys.argv[2:] or ITEMS

    import __spark_entry__ as entry
    from balboa_spark.session import get_spark

    spark = get_spark("scale-probe")
    qs = entry.queries()

    # warm-up: pay JVM codegen / Arrow worker spawn once, untimed
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).select(_warm("id")).write.mode("overwrite").format("noop").save()

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        return round(best, 3)

    out: dict[str, dict] = {}
    for name in names:
        a = run(name, SF01)
        b = run(name, SF1)
        ratio = round(b / a, 2) if a > 0 else None
        out[name] = {"sf0.1": a, "sf1": b, "ratio": ratio, "flag": bool(ratio and ratio > 12)}
        print(f"[probe] {name}: sf0.1={a}s sf1={b}s ratio={ratio}x"
              + (" SUPER-LINEAR" if out[name]["flag"] else ""), file=sys.stderr)

    print(json.dumps({"items": out}))
    print("\n| item | sf0.1 (s) | sf1.0 (s) | ratio |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for n, v in out.items():
        print(f"| {n} | {v['sf0.1']} | {v['sf1']} | {v['ratio']}x |", file=sys.stderr)


if __name__ == "__main__":
    main()
