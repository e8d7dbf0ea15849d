"""LM count-store append-vs-retrain probe at two corpus sizes (r10).

The BigramCountStore claim: keeping a deployed LM fresh from a stream
costs O(batch) per epoch (fold the batch's own counts, land one epoch
dir), while the naive alternative retrains on the FULL corpus every
refresh — O(corpus). This probe makes the divergence empirical: build
the store from the documents table at sf0.1 and at sf1 (10x), then
time ONE 1%-slice append against each, a full retrain at each size,
and the merge-on-read model fold.

Run: python scripts/lm_store_probe.py   (needs .scaledata/sf1 from
scripts/make_scaledata.py). Prints a JSON line + markdown rows for
PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scaledata", "sf1")


def main() -> None:
    from pyspark.sql import functions as F

    from balboa_spark.operators import lm
    from balboa_spark.session import get_spark, load_tables

    spark = get_spark("lm-store-probe")
    out = {}
    for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
        n = docs.count()
        path = tempfile.mkdtemp(prefix=f"lmstore_probe_{label.replace('.', '')}_")
        store = lm.BigramCountStore(spark, path)

        t0 = time.time()
        store.process_batch(docs, epoch_id=0)
        build_s = round(time.time() - t0, 2)

        slice_df = docs.where(F.col("doc_id") % 100 == 0)  # ~1%
        t0 = time.time()
        store.process_batch(slice_df, epoch_id=1)
        append_s = round(time.time() - t0, 2)

        t0 = time.time()
        model = lm.train_bigram_lm(docs)  # the naive refresh
        model.c12.write.mode("overwrite").format("noop").save()
        retrain_s = round(time.time() - t0, 2)

        t0 = time.time()
        store.model().c12.write.mode("overwrite").format("noop").save()
        fold_s = round(time.time() - t0, 2)

        out[label] = {
            "docs": n,
            "build_full": build_s,
            "append_1pct": append_s,
            "retrain_full": retrain_s,
            "model_fold": fold_s,
        }
        print(
            f"[probe] {label}: docs={n} build={build_s}s "
            f"append_1pct={append_s}s retrain={retrain_s}s fold={fold_s}s",
            file=sys.stderr,
        )

    print(json.dumps(out))
    print("\n| corpus | docs | 1% append (s) | full retrain (s) | model fold (s) |",
          file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for label, r in out.items():
        print(
            f"| {label} | {r['docs']} | {r['append_1pct']} "
            f"| {r['retrain_full']} | {r['model_fold']} |",
            file=sys.stderr,
        )


def order5_sustained() -> None:
    """r12 stretch probe: NgramCountStore at n=5 (the order users
    actually run for CCNet filtering) under SUSTAINED append — 20
    1%-batches against a 20% seed, size trigger armed
    (max_live_epochs=6). Records per-append wall, merged-read fold
    wall, and the live-epoch count after each batch: the append curve
    must stay flat (O(batch)) and the fold cost must stay inside a
    bounded envelope because compaction keeps the live dir count
    capped."""
    from pyspark.sql import functions as F

    from balboa_spark.operators import lm
    from balboa_spark.session import get_spark, load_tables

    spark = get_spark("lm-store-probe5")
    docs = load_tables(spark, SF01, names=("documents",))["documents"]
    path = tempfile.mkdtemp(prefix="lmstore_probe_n5_")
    store = lm.NgramCountStore(spark, path, n=5)

    t0 = time.time()
    store.process_batch(docs.where(F.col("doc_id") % 5 == 0), epoch_id=0)
    seed_s = round(time.time() - t0, 2)
    print(f"[probe5] seed 20%: {seed_s}s", file=sys.stderr)

    rows = []
    for e in range(1, 21):
        batch = docs.where(F.col("doc_id") % 100 == e)
        t0 = time.time()
        store.process_batch(batch, epoch_id=e, max_live_epochs=6)
        append_s = round(time.time() - t0, 2)
        t0 = time.time()
        store.counts().write.mode("overwrite").format("noop").save()
        fold_s = round(time.time() - t0, 2)
        live = len(store._manifest()["live"])
        rows.append(
            {"epoch": e, "append_s": append_s, "fold_s": fold_s, "live": live}
        )
        print(
            f"[probe5] epoch {e}: append={append_s}s fold={fold_s}s live={live}",
            file=sys.stderr,
        )
    print(json.dumps({"seed_s": seed_s, "epochs": rows}))
    a = [r["append_s"] for r in rows]
    f = [r["fold_s"] for r in rows]
    print(
        f"\nappend first5={sum(a[:5])/5:.2f}s last5={sum(a[-5:])/5:.2f}s | "
        f"fold first5={sum(f[:5])/5:.2f}s last5={sum(f[-5:])/5:.2f}s | "
        f"max live={max(r['live'] for r in rows)}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "order5":
        order5_sustained()
    else:
        main()
