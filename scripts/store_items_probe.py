"""Isolated timing probe for the ObservationStore bench items
(store_build / merge_batch / delta_ingest) — the write-path trio the
r16 optimization round touches. Replicates bench.py's bodies, warmup,
and min-of-N estimator in a dedicated session so a change to
layout.py can be A/B-measured without a 10-minute full bench.

Run: python scripts/store_items_probe.py [passes]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from balboa_spark.entry_queries import RRNAME_SUBJECT
    from balboa_spark.hostcanary import host_canary
    from balboa_spark.obsmap import OBS_SQL
    from balboa_spark.operators.aggregate import aggregate
    from balboa_spark.operators.query import Query
    from balboa_spark.plans.layout import ObservationStore
    from balboa_spark.session import get_spark, load_tables

    spark = get_spark("store-items-probe")
    load_tables(spark, SF_DIR)
    obs = spark.sql(OBS_SQL)
    for t in ["events"]:
        spark.table(t).count()
    aggregate(obs).write.mode("overwrite").format("noop").save()  # warm

    results: dict[str, list[float]] = {}
    for p in range(passes):
        c = host_canary()
        tmp = tempfile.mkdtemp(prefix="store_probe_")
        store = ObservationStore(spark, os.path.join(tmp, "store"), num_buckets=8)

        t0 = time.time()
        store.write(aggregate(obs))
        results.setdefault("store_build", []).append(time.time() - t0)

        t0 = time.time()
        store.merge(obs.filter(F.col("event_id") % 100 == 0))
        results.setdefault("merge_batch", []).append(time.time() - t0)

        t0 = time.time()
        for i in range(1, 5):
            store.append_delta(obs.filter(F.col("event_id") % 100 == i))
        store.query(Query(rrname=RRNAME_SUBJECT)).write.mode(
            "overwrite"
        ).format("noop").save()
        store.compact()
        results.setdefault("delta_ingest", []).append(time.time() - t0)

        print(f"pass {p}: canary={c:.3f} " + " ".join(
            f"{k}={v[-1]:.3f}" for k, v in results.items()))
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    print("MIN: " + " ".join(f"{k}={min(v):.3f}" for k, v in results.items()))
    spark.stop()


if __name__ == "__main__":
    main()
