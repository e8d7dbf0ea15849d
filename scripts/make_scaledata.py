"""Build a deterministic sf1.0 scale-probe dataset from the driver's sf0.1.

The driver only ships sf{0.001,0.01,0.1} and its testdata tree is
read-only, but the verdicts (r7/r8/r9) order an empirical scale probe
above sf0.1. This script 10x-replicates the sf0.1 tables into
``/root/repo/.scaledata/sf1`` (gitignored) with deterministic,
Spark-side perturbation chosen so the WORKLOAD CHARACTERISTICS scale
~linearly instead of degenerating:

- ``documents``: replica r>0 salts every 4th word with a per-replica
  suffix. That breaks w-shingle overlap ACROSS replicas (so MinHash /
  span / CDC dedup buckets don't become 10x denser, which would turn a
  linear probe into an artificial quadratic blow-up) while preserving
  the dup/near-dup structure WITHIN each replica — per-replica dup
  rate is exactly sf0.1's.
- ``embeddings``: per-replica deterministic jitter (sin of id/dim/r)
  large enough to pull cross-replica cosine below the dedup threshold,
  small enough to keep within-replica neighbor structure.
- ``customer`` / ``supplier``: keys offset per replica; names of r>0
  prefixed with a 4+-char token so cross-replica pairs fall outside
  the lev<=2 fuzzy gate (again: density stays constant, volume 10x).
- ``orders`` / ``lineitem`` / ``events``: keys offset consistently
  (o_orderkey <-> l_orderkey, o_custkey <-> c_custkey) so joins stay
  FK-valid; lineitem lands at ~6M rows.
- ``region nation part``: copied as-is (dims; l_partkey stays valid).

Run: python scripts/make_scaledata.py [sf_multiple] (default 10)
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".scaledata", "sf1")

DOC_OFF = 10_000_000
VEC_OFF = 10_000_000
CUST_OFF = 10_000_000
SUPP_OFF = 1_000_000
ORD_OFF = 100_000_000
EVT_OFF = 100_000_000
USER_OFF = 10_000_000


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import functions as F

    from balboa_spark.session import get_spark, _read_parquet_norm

    spark = get_spark("make-scaledata")
    os.makedirs(DST, exist_ok=True)

    def src(name):
        # _read_parquet_norm: events.ts is TIMESTAMP(NANOS) in the
        # driver files; normalize to TimestampType BEFORE rewriting so
        # the sf1 copy stores standard TIMESTAMP(MICROS) that every
        # read path (and DuckDB) handles identically.
        return _read_parquet_norm(spark, os.path.join(SRC, f"{name}.parquet"))

    def write(df, name, n_files=8):
        out = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(out):
            shutil.rmtree(out)
        # n_files output splits: the driver's one-row-group files force
        # single-task scans; at sf1 we want the scan itself parallel.
        df.repartition(n_files).write.mode("overwrite").parquet(out)
        print(f"[scaledata] {name}: {spark.read.parquet(out).count()} rows")

    def replicate(name, per_replica):
        parts = [per_replica(src(name), r) for r in range(reps)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    # --- documents ---------------------------------------------------
    def doc_rep(df, r):
        if r == 0:
            return df
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda x, i: F.when(i % 4 == 0, F.concat(x, F.lit(f"r{r}"))).otherwise(x),
            ),
            " ",
        )
        return df.select(
            (F.col("doc_id") + F.lit(r * DOC_OFF)).alias("doc_id"),
            salted.alias("text"),
            "lang",
            "source",
            F.length(salted).alias("n_chars"),
        )

    write(replicate("documents", doc_rep), "documents")

    # --- embeddings --------------------------------------------------
    def emb_rep(df, r):
        if r == 0:
            return df
        jit = F.transform(
            F.col("embedding"),
            lambda x, i: (
                x
                + 0.15
                * F.sin(
                    F.col("vec_id").cast("double") * 0.7
                    + i.cast("double") * 1.3
                    + F.lit(float(r) * 2.1)
                )
            ).cast("float"),
        )
        return df.select(
            (F.col("vec_id") + F.lit(r * VEC_OFF)).alias("vec_id"),
            jit.alias("embedding"),
            "label",
        )

    write(replicate("embeddings", emb_rep), "embeddings")

    # --- customer / supplier ----------------------------------------
    def cust_rep(df, r):
        if r == 0:
            return df
        return df.select(
            (F.col("c_custkey") + F.lit(r * CUST_OFF)).alias("c_custkey"),
            F.concat(F.lit(f"Rx{r}q "), F.col("c_name")).alias("c_name"),
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        )

    write(replicate("customer", cust_rep), "customer")

    def supp_rep(df, r):
        if r == 0:
            return df
        return df.select(
            (F.col("s_suppkey") + F.lit(r * SUPP_OFF)).alias("s_suppkey"),
            F.concat(F.lit(f"Rx{r}q "), F.col("s_name")).alias("s_name"),
            "s_nationkey",
            "s_acctbal",
        )

    write(replicate("supplier", supp_rep), "supplier")

    # --- orders / lineitem / events (FK-consistent offsets) ----------
    def ord_rep(df, r):
        if r == 0:
            return df
        cols = [c for c in df.columns if c not in ("o_orderkey", "o_custkey")]
        return df.select(
            (F.col("o_orderkey") + F.lit(r * ORD_OFF)).alias("o_orderkey"),
            (F.col("o_custkey") + F.lit(r * CUST_OFF)).alias("o_custkey"),
            *cols,
        )

    write(replicate("orders", ord_rep), "orders")

    def li_rep(df, r):
        if r == 0:
            return df
        cols = [c for c in df.columns if c != "l_orderkey"]
        return df.select(
            (F.col("l_orderkey") + F.lit(r * ORD_OFF)).alias("l_orderkey"), *cols
        )

    write(replicate("lineitem", li_rep), "lineitem", n_files=16)

    def evt_rep(df, r):
        if r == 0:
            return df
        cols = [c for c in df.columns if c not in ("event_id", "user_id")]
        return df.select(
            (F.col("event_id") + F.lit(r * EVT_OFF)).alias("event_id"),
            (F.col("user_id") + F.lit(r * USER_OFF)).alias("user_id"),
            *cols,
        )

    write(replicate("events", evt_rep), "events", n_files=16)

    # --- small dims: copy as-is --------------------------------------
    for name in ("region", "nation", "part"):
        out = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(out):
            os.remove(out) if os.path.isfile(out) else shutil.rmtree(out)
        shutil.copyfile(os.path.join(SRC, f"{name}.parquet"), out)
        print(f"[scaledata] {name}: copied")

    print(f"[scaledata] done -> {DST}")


if __name__ == "__main__":
    main()
