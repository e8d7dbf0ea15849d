"""Order-n LM key-width probe (r11; VERDICT r10 stretch #8).

The ngram LM docstring claims growing n changes shuffle KEY WIDTH, not
the number of shuffles or joins (operators/lm.py). This measures that
claim on the documents table: for n in {2, 3, 5}, time the full
ngram_lm_perplexity pass and measure the gram-count relation the
shuffles actually carry — distinct gram types, mean context-key width
in bytes, and the summed distinct-key payload (the map-side-combined
shuffle's upper bound; raw instance-key bytes are also reported as the
no-combine bound).

Run: python scripts/lm_order_probe.py [sf_dir]   (default sf0.1)
Output: one JSON line + a markdown table on stderr for PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from balboa_spark.operators import lm
    from balboa_spark.operators.text import tokens
    from balboa_spark.session import get_spark, load_tables

    spark = get_spark("lm-order-probe")
    docs = load_tables(spark, SF_DIR, names=("documents",))["documents"]

    # warm-up: pay JVM codegen + scan-cache once, untimed (scale_probe
    # convention) so the first timed order isn't charged for spin-up
    lm.ngram_lm_perplexity(docs, n=2).write.mode("overwrite").format(
        "noop"
    ).save()

    out: dict[str, dict] = {}
    for n in (2, 3, 5):
        t0 = time.time()
        lm.ngram_lm_perplexity(docs, n=n).write.mode("overwrite").format(
            "noop"
        ).save()
        wall = round(time.time() - t0, 3)

        # the gram relation the two count shuffles carry (same extraction
        # expression as ngram_lm_perplexity)
        expr = (
            f"transform(sequence(1, size(tk) - {n - 1}), i -> struct("
            f"array_join(slice(tk, i, {n - 1}), ' ') AS ctx, "
            f"tk[i + {n - 2}] AS w))"
        )
        g = (
            docs.select(tokens(F.col("text")).alias("tk"))
            .where(F.size("tk") >= n)
            .select(F.explode(F.expr(expr)).alias("g"))
            .select("g.ctx", "g.w")
        )
        key_bytes = F.octet_length("ctx") + F.octet_length("w")
        inst = g.agg(
            F.count(F.lit(1)).alias("instances"),
            F.sum(key_bytes).alias("instance_key_bytes"),
        ).collect()[0]
        typ = (
            g.groupBy("ctx", "w")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.count(F.lit(1)).alias("types"),
                F.sum(key_bytes).alias("type_key_bytes"),
                F.avg(key_bytes).alias("avg_key_bytes"),
            )
            .collect()[0]
        )
        out[f"n={n}"] = {
            "wall_s": wall,
            "gram_instances": inst["instances"],
            "gram_types": typ["types"],
            "avg_key_bytes": round(typ["avg_key_bytes"], 1),
            "type_key_mb": round(typ["type_key_bytes"] / 1e6, 2),
            "instance_key_mb": round(inst["instance_key_bytes"] / 1e6, 2),
        }
        print(f"[probe] n={n}: {out[f'n={n}']}", file=sys.stderr)

    print(json.dumps({"sf_dir": SF_DIR, "orders": out}))
    print(
        "\n| n | wall (s) | gram types | avg key (B) | distinct-key payload"
        " (MB) | instance-key payload (MB) |",
        file=sys.stderr,
    )
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for k, v in out.items():
        print(
            f"| {k} | {v['wall_s']} | {v['gram_types']} |"
            f" {v['avg_key_bytes']} | {v['type_key_mb']} |"
            f" {v['instance_key_mb']} |",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
