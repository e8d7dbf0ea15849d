"""Capture `.explain("formatted")` for declared driver queries into
plans/r17/<query>_<tag>.txt — the optimization round's evidence files
(the judge checks plan claims against these, not a live Spark).

Usage: python scripts/capture_plans.py <tag> <query_name> [...]
       (tag is `before` or `after`)

Each file holds the FORMATTED physical plan plus a one-line summary
(count of Exchange / BroadcastHashJoin / SortMergeJoin /
BatchEvalPython / ArrowEvalPython nodes) so plan-shape diffs are
greppable.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, "plans", os.environ.get("PLANS_ROUND", "r17"))

MARKERS = (
    "Exchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "WholeStageCodegen",
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries = mod.queries()

    from balboa_spark.session import get_spark, load_tables

    spark = get_spark("capture-plans")
    load_tables(spark, SF_DIR)

    for name in names:
        if name not in queries:
            print(f"SKIP {name}: not a declared query", file=sys.stderr)
            continue
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        counts = {
            m: len(re.findall(rf"\b{m}\b", plan)) for m in MARKERS
        }
        summary = ", ".join(f"{m}={c}" for m, c in counts.items() if c)
        out = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(out, "w") as fh:
            fh.write(f"# {name} [{tag}] sf_dir={SF_DIR}\n# {summary}\n\n")
            fh.write(plan)
        print(f"{name}: {summary} -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
