"""Dual sorted/bucketed storage layout + index-selection query planner.

The reference stores every aggregate twice in one RocksDB keyspace:
forward keys ``o\\x1f<rrname>\\x1f<sensor_id>\\x1f<rrtype>\\x1f<rdata>``
(rocksdb-impl.c:772-783) and inverted index keys
``i\\x1f<rdata>\\x1f<sensor_id>\\x1f<rrname>\\x1f<rrtype>`` (:789-800);
the Cassandra schema spells the same design as two clustering orders
(doc/cassandra_schema.txt:6-40). Lexicographic key order gives prefix
seeks with early termination (:293-294,345-354).

Columnar restatement: two Parquet copies of the aggregate table,
- ``by_rrname/`` hash-bucketed on rrname (directory partition
  ``bucket=NN``) and sorted within files by the forward key order;
- ``by_rdata/`` bucketed on rdata, sorted by the inverted key order.

A point lookup then (a) prunes to ONE bucket directory via the
partition filter, and (b) skips row groups inside it via Parquet
min/max on the leading sort column — the columnar analog of prefix
seek + early break. Unlike the reference's inverted keys (empty
values, requiring a second point-get per hit, :542-565), the inverted
copy carries full values: columnar storage makes the duplication cheap
(zstd over sorted columns) and removes the double lookup.

Scale: bucket count is a constructor knob — 8 for local tests, 4096 at
100 TB so a bucket is ~25 GB and a point query touches 1/4096 of the
data. Writes repartition by the bucket expression so each task writes
exactly one file per bucket (no small-file explosion).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from balboa_spark.operators.aggregate import aggregate, merge_increment
from balboa_spark.operators.query import DEFAULT_LIMIT, Query
from balboa_spark.schemas import INVERTED_KEY, OBSERVATION_KEY

MANIFEST = "manifest.json"


def _bucket(col: str, n: int):
    return F.pmod(F.hash(F.col(col)), F.lit(n)).alias("bucket")


class ObservationStore:
    """The persistent `observations` dataset with dual sorted layouts."""

    def __init__(self, spark: SparkSession, path: str, num_buckets: int = 8):
        self.spark = spark
        self.path = path
        self.num_buckets = num_buckets

    # -- write side ---------------------------------------------------------

    def write(self, agg_df: DataFrame, mode: str = "overwrite") -> None:
        """Write both layouts + manifest from an aggregate DataFrame."""
        self._write_layout(agg_df, "by_rrname", "rrname", OBSERVATION_KEY, mode)
        self._write_layout(agg_df, "by_rdata", "rdata", INVERTED_KEY, mode)
        manifest = {
            "num_buckets": self.num_buckets,
            "layouts": {"by_rrname": list(OBSERVATION_KEY), "by_rdata": list(INVERTED_KEY)},
            "written_at": int(time.time()),
        }
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, MANIFEST), "w") as f:
            json.dump(manifest, f)

    def _write_layout(self, df: DataFrame, name: str, key: str, order, mode: str) -> None:
        out = os.path.join(self.path, name)
        (
            df.withColumn("bucket", _bucket(key, self.num_buckets))
            .repartition("bucket")
            .sortWithinPartitions(*order)
            .write.mode(mode)
            .partitionBy("bucket")
            .parquet(out)
        )

    def merge(self, new_obs: DataFrame) -> None:
        """A2/T1: fold a new input-observation batch into the store.

        Plain-Parquet MERGE analog: re-aggregate (stored ∪ new) and
        rewrite. Only buckets containing touched keys actually change
        content; with Delta/Iceberg on the classpath this becomes a
        transactional MERGE INTO on the same key (see streaming/ingest).
        """
        merged = merge_increment(self.forward(), new_obs)
        # write to temp then swap, so a failed write never corrupts the store
        tmp = ObservationStore(self.spark, self.path + ".tmp", self.num_buckets)
        tmp.write(merged)
        for name in ("by_rrname", "by_rdata", MANIFEST):
            dst = os.path.join(self.path, name)
            if os.path.exists(dst):
                shutil.rmtree(dst) if os.path.isdir(dst) else os.remove(dst)
            shutil.move(os.path.join(tmp.path, name), dst)
        shutil.rmtree(tmp.path, ignore_errors=True)

    # -- read side ----------------------------------------------------------

    def _read_layout(self, name: str) -> DataFrame:
        from pyspark.sql.utils import AnalysisException

        from balboa_spark.schemas import OBSERVATION

        try:
            return self.spark.read.parquet(os.path.join(self.path, name))
        except AnalysisException:
            # an empty aggregate writes no parquet files; surface an
            # empty table, not a schema-inference error
            df = self.spark.createDataFrame([], OBSERVATION)
            return df.withColumn("bucket", F.lit(0))

    def forward(self) -> DataFrame:
        return self._read_layout("by_rrname").drop("bucket")

    def inverted(self) -> DataFrame:
        return self._read_layout("by_rdata").drop("bucket")

    def query(self, q: Query) -> DataFrame:
        """Q3 dispatch (rocksdb-impl.c:622-630): route to the layout
        whose bucket partition the driving predicate prunes."""
        q.validate()
        if q.rrname is not None:
            base = self._read_layout("by_rrname")
            df = base.filter(
                (F.col("bucket") == F.pmod(F.hash(F.lit(q.rrname)), F.lit(self.num_buckets)))
                & (F.col("rrname") == q.rrname)
            )
            if q.rdata is not None:
                df = df.filter(F.col("rdata") == q.rdata)
        else:
            base = self._read_layout("by_rdata")
            df = base.filter(
                (F.col("bucket") == F.pmod(F.hash(F.lit(q.rdata)), F.lit(self.num_buckets)))
                & (F.col("rdata") == q.rdata)
            )
        if q.rrtype is not None:
            df = df.filter(F.col("rrtype") == q.rrtype)
        if q.sensor_id is not None:
            df = df.filter(F.col("sensor_id") == q.sensor_id)
        return df.drop("bucket").orderBy(*OBSERVATION_KEY).limit(q.limit)

    # -- maintenance jobs (Q5-Q7, S6) --------------------------------------

    def dump(self, out_path: str) -> None:
        """Q5: full export of the forward table (rocksdb-impl.c:664-759)."""
        self.forward().orderBy(*OBSERVATION_KEY).write.mode("overwrite").parquet(out_path)

    def jsonize(self, out_path: str) -> None:
        """Q7: dump as NDJSON (balboa-backend-console main.c:96-135).
        Timestamps as unix seconds, matching the COF wire shape
        (observation/observation.go:26-37)."""
        (
            self.forward()
            .select(
                "rrname",
                "rrtype",
                "rdata",
                "sensor_id",
                "count",
                F.unix_timestamp("first_seen").alias("time_first"),
                F.unix_timestamp("last_seen").alias("time_last"),
            )
            .write.mode("overwrite")
            .json(out_path)
        )

    def replay(self, dump_path: str) -> None:
        """S6: re-ingest a dump through the merge pipeline
        (backend/README.md:100-123)."""
        dumped = self.spark.read.parquet(dump_path)
        as_input = dumped.select(
            *OBSERVATION_KEY,
            F.col("count"),
            F.col("first_seen").alias("ts_start"),
            F.col("last_seen").alias("ts_end"),
        )
        self.merge(as_input)

    def backup(self, backup_path: str) -> None:
        """Q6: snapshot copy (rocksdb-impl.c:632-662). Parquet files are
        immutable once written, so a directory copy is a valid snapshot."""
        shutil.copytree(self.path, backup_path, dirs_exist_ok=True)
