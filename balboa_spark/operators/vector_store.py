"""Persisted ANN index: the 100 TB path for similarity search.

``lsh_bucketed_topk`` (similarity.py) computes bucket codes on the fly
— right for ad-hoc queries, but at scale the codes should be computed
once at write time and the query should touch only its probe buckets.
This store persists the classic inverted-list (IVF-file) layout:

- ``main/``: the vector table, hash-bucketed on the id column (point
  gathers prune to one bucket).
- ``index/``: one row per (table-coded LSH bucket, vec id), partitioned
  by ``code`` — a query with L tables x Hamming<=2 probes reads ~370 of
  L*2^b partitions and never scans the corpus.

Query = partition-pruned index read -> distinct candidate ids -> join
back to ``main`` (AQE broadcasts when the candidate set is small, which
is exactly the clustered-data case) -> exact cosine re-rank top-k.

The LSH parameters are frozen into a manifest at write time; queries
read them back so index and probes always agree.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from balboa_spark.operators.similarity import (
    _probe_codes,
    lsh_bucket_codes,
    topk_brute,
)

MANIFEST = "manifest.json"


class VectorStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        num_tables: int = 10,
        num_planes: int = 8,
        seed: str = "balboa",
        num_id_buckets: int = 8,
    ):
        self.spark = spark
        self.path = path
        self.num_tables = num_tables
        self.num_planes = num_planes
        self.seed = seed
        self.num_id_buckets = num_id_buckets

    def write(self, df: DataFrame, dim: int, vec_col: str = "embedding", id_col: str = "vec_id") -> None:
        codes = lsh_bucket_codes(vec_col, dim, self.num_tables, self.num_planes, self.seed)
        with_codes = df.withColumn("_bs", codes)
        (
            with_codes.drop("_bs")
            .withColumn("id_bucket", F.pmod(F.hash(F.col(id_col)), F.lit(self.num_id_buckets)))
            .repartition("id_bucket")
            .write.mode("overwrite")
            .partitionBy("id_bucket")
            .parquet(os.path.join(self.path, "main"))
        )
        (
            with_codes.select(F.col(id_col), F.explode("_bs").alias("code"))
            .repartition("code")
            .write.mode("overwrite")
            .partitionBy("code")
            .parquet(os.path.join(self.path, "index"))
        )
        with open(os.path.join(self.path, MANIFEST), "w") as f:
            json.dump(
                {
                    "dim": dim,
                    "num_tables": self.num_tables,
                    "num_planes": self.num_planes,
                    "seed": self.seed,
                    "vec_col": vec_col,
                    "id_col": id_col,
                    "num_id_buckets": self.num_id_buckets,
                },
                f,
            )

    def _load_manifest(self) -> dict:
        with open(os.path.join(self.path, MANIFEST)) as f:
            return json.load(f)

    def candidates(self, query_vec: list[float], probe_hamming: int = 2) -> DataFrame:
        """Partition-pruned candidate rows for a query vector."""
        man = self._load_manifest()
        probes = _probe_codes(
            query_vec, man["num_tables"], man["num_planes"], probe_hamming, man["seed"]
        )
        index = self.spark.read.parquet(os.path.join(self.path, "index"))
        ids = index.filter(F.col("code").isin(probes)).select(man["id_col"]).distinct()
        main = self.spark.read.parquet(os.path.join(self.path, "main"))
        return main.join(ids, man["id_col"]).drop("id_bucket")

    def topk(self, query_vec: list[float], k: int = 10, probe_hamming: int = 2) -> DataFrame:
        man = self._load_manifest()
        return topk_brute(
            self.candidates(query_vec, probe_hamming),
            query_vec,
            k,
            man["vec_col"],
            man["id_col"],
        )
