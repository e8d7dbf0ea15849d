"""Delta-vs-merge write-path probe at two store sizes (r10).

The LSM design claim: merge() re-folds every bucket a batch touches
(all of them, for uniform keys), so its per-batch cost grows with the
STORE; append_delta() is O(batch). This probe makes the divergence
empirical: build the observation store at sf0.1 and at sf1 (10x), then
time ONE 1%-slice merge and ONE 1%-slice append against each.

Run: python scripts/delta_vs_merge_probe.py   (needs .scaledata/sf1
from scripts/make_scaledata.py). Prints a JSON line + markdown rows
for PERF.md.
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

    from balboa_spark.obsmap import OBS_SQL
    from balboa_spark.operators.aggregate import aggregate
    from balboa_spark.plans.layout import ObservationStore
    from balboa_spark.session import get_spark, load_tables

    spark = get_spark("delta-vs-merge-probe")
    out = {}
    for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        load_tables(spark, sf_dir, names=("events",))
        obs = spark.sql(OBS_SQL)
        obs.persist().count()
        batch = obs.filter(F.col("event_id") % 100 == 1)
        tmp = tempfile.mkdtemp(prefix=f"delta_probe_{label}_")
        store = ObservationStore(spark, os.path.join(tmp, "s"), num_buckets=8)
        store.write(aggregate(obs))
        # warm both paths once on a throwaway twin so first-touch
        # codegen does not land on either timed number
        twin = ObservationStore(spark, os.path.join(tmp, "w"), num_buckets=8)
        twin.write(aggregate(batch))
        twin.merge(batch)
        twin.append_delta(batch, epoch_id=0)
        t0 = time.time()
        store.merge(batch)
        t_merge = round(time.time() - t0, 3)
        t0 = time.time()
        store.append_delta(batch, epoch_id=0)
        t_append = round(time.time() - t0, 3)
        out[label] = {
            "store_rows": store.forward().count(),
            "merge_1pct_s": t_merge,
            "append_1pct_s": t_append,
        }
        obs.unpersist()
        print(
            f"| {label} | {out[label]['store_rows']} | {t_merge} | {t_append} |",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
