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

Consistency + incremental growth (the embedding-pipeline steady state
is "a new batch of vectors lands every hour", not "rebuild the
index"): the store adopts the same generation-flip model as
ObservationStore (plans/layout.py) —

- every write/upsert lands in a fresh ``gen-<n>/`` directory and the
  only commit point is the atomic ``manifest.json`` rename, so a
  crash mid-write leaves the previous generation fully readable and
  ``main`` and ``index`` can never disagree;
- ``upsert`` rewrites ONLY the id buckets the batch's ids hash into
  and the code partitions the batch touches — including the OLD codes
  of replaced vectors, recomputed from their stored embeddings so
  stale index entries are dropped — and hard-links every untouched
  partition from the previous generation. Cost scales with the batch
  (plus the bounded code fan-out, <= L*2^planes partitions), never
  with the index size. Driver state: two collect_sets bounded by
  num_id_buckets + the code space.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from balboa_spark.operators.similarity import (
    _probe_codes,
    lsh_bucket_codes,
    topk_brute,
)
from balboa_spark.plans.genstore import (
    flip_manifest,
    link_tree as _link_tree,
    vacuum_generations,
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

    # -- manifest / generation plumbing (mirrors plans/layout.py) -----

    def _manifest(self) -> dict | None:
        try:
            with open(os.path.join(self.path, MANIFEST)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _load_manifest(self) -> dict:
        man = self._manifest()
        if man is None:
            raise FileNotFoundError(f"no vector store at {self.path}")
        if "generation" not in man:
            raise ValueError(
                f"vector store at {self.path} uses the pre-generation "
                "layout (no 'generation' in manifest); rebuild it with "
                "write() — there is no in-place migration"
            )
        return man

    def _gen_dir(self, gen: int) -> str:
        return os.path.join(self.path, f"gen-{gen}")

    def _flip_manifest(self, man: dict, expected_seq: int | None = None) -> None:
        flip_manifest(self.path, man, MANIFEST, expected_seq=expected_seq)

    def _commit(
        self,
        gen: int,
        dim: int,
        vec_col: str,
        id_col: str,
        frozen: dict | None = None,
        expected_seq: int = 0,
    ) -> None:
        """``frozen`` (a prior manifest) wins over the constructor's
        parameters: an upsert through a store handle constructed with
        different defaults must carry the WRITE-TIME contract forward,
        not silently rewrite it. ``expected_seq`` is the commit_seq
        from this mutation's initial manifest read (lost-update CAS,
        genstore.flip_manifest)."""
        src = frozen or {}
        self._flip_manifest(
            {
                "generation": gen,
                "dim": dim,
                "num_tables": src.get("num_tables", self.num_tables),
                "num_planes": src.get("num_planes", self.num_planes),
                "seed": src.get("seed", self.seed),
                "vec_col": vec_col,
                "id_col": id_col,
                "num_id_buckets": src.get(
                    "num_id_buckets", self.num_id_buckets
                ),
                "written_at": int(time.time()),
            },
            expected_seq=expected_seq,
        )
        self._vacuum(keep_last=2)

    def _vacuum(self, keep_last: int) -> None:
        man = self._manifest()
        if man is None:
            return
        vacuum_generations(self.path, man["generation"], keep_last)

    def _codes(self, vec_col: str, dim: int, man: dict | None = None):
        """LSH codes under the manifest's frozen parameters when given
        (every read/upsert of an existing store), else the
        constructor's (the initial write)."""
        src = man or {}
        return lsh_bucket_codes(
            vec_col,
            dim,
            src.get("num_tables", self.num_tables),
            src.get("num_planes", self.num_planes),
            src.get("seed", self.seed),
        )

    def _id_bucket(self, id_col: str, man: dict | None = None):
        n = (man or {}).get("num_id_buckets", self.num_id_buckets)
        return F.pmod(F.hash(F.col(id_col)), F.lit(n))

    def _write_partitions(
        self, gen_dir: str, main: DataFrame, index: DataFrame
    ) -> None:
        (
            main.repartition("id_bucket")
            .write.mode("overwrite")
            .partitionBy("id_bucket")
            .parquet(os.path.join(gen_dir, "main"))
        )
        (
            index.repartition("code")
            .write.mode("overwrite")
            .partitionBy("code")
            .parquet(os.path.join(gen_dir, "index"))
        )

    # -- public API ---------------------------------------------------

    def write(
        self,
        df: DataFrame,
        dim: int,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> None:
        """Full (re)build as a fresh generation + manifest flip."""
        man = self._manifest()
        gen = man["generation"] + 1 if man else 0
        with_codes = df.withColumn("_bs", self._codes(vec_col, dim))
        main = with_codes.drop("_bs").withColumn(
            "id_bucket", self._id_bucket(id_col)
        )
        index = with_codes.select(
            F.col(id_col), F.explode("_bs").alias("code")
        )
        self._write_partitions(self._gen_dir(gen), main, index)
        self._commit(
            gen, dim, vec_col, id_col,
            expected_seq=(man or {}).get("commit_seq", 0),
        )

    def upsert(self, batch: DataFrame) -> None:
        """Fold a batch of new-or-replaced vectors into the index.

        Selective rewrite: only the batch's id buckets and the union
        of (old codes of replaced ids, new codes of the batch) are
        re-materialized; every other partition hard-links from the
        previous generation. Within-batch duplicate ids keep an
        arbitrary single row (dropDuplicates), matching last-write
        semantics of a keyed store.
        """
        man = self._load_manifest()
        dim, vec_col, id_col = man["dim"], man["vec_col"], man["id_col"]
        gen, old_gen_dir = man["generation"] + 1, self._gen_dir(man["generation"])

        stored = self.spark.read.parquet(os.path.join(old_gen_dir, "main"))
        # align the batch to the stored row schema (raises clearly on a
        # missing column) so the unions below cannot drift. ALL hashing
        # below uses the MANIFEST's frozen parameters (`man`), never
        # the constructor's: a handle opened with different defaults
        # must still hash into the partitions the store was written
        # with, or replaced rows would be missed and stale index
        # entries survive. Persisted so the two collect jobs and the
        # final writes evaluate the LSH pandas_udf once, not three
        # times (the dominant per-batch cost in a streaming loop).
        batch = (
            batch.select([c for c in stored.columns if c != "id_bucket"])
            .dropDuplicates([id_col])
            .withColumn("_bs", self._codes(vec_col, dim, man))
            .persist()
        )
        try:
            # touched id buckets (bounded by num_id_buckets) in one job
            touched_buckets = sorted(
                batch.agg(
                    F.collect_set(self._id_bucket(id_col, man)).alias("b")
                ).collect()[0]["b"]
            )
            stored_touched = stored.filter(
                F.col("id_bucket").isin(touched_buckets)
            )
            replaced = stored_touched.join(
                batch.select(id_col), id_col, "left_semi"
            )
            # touched code partitions: the batch's new codes PLUS the
            # old codes of replaced vectors (recomputed from stored
            # embeddings — cheaper than persisting codes in main, and
            # exact because the manifest froze the LSH parameters). One
            # job, driver state bounded by the L*2^planes code space.
            code_sets = (
                batch.select(F.explode("_bs").alias("c"))
                .unionByName(
                    replaced.select(
                        F.explode(self._codes(vec_col, dim, man)).alias("c")
                    )
                )
                .agg(F.collect_set("c").alias("cs"))
                .collect()[0]["cs"]
            )
            touched_codes = sorted(code_sets)

            new_main = stored_touched.join(
                batch.select(id_col), id_col, "left_anti"
            ).unionByName(
                batch.drop("_bs").withColumn(
                    "id_bucket", self._id_bucket(id_col, man)
                )
            )
            old_index = self.spark.read.parquet(
                os.path.join(old_gen_dir, "index")
            )
            new_index = (
                old_index.filter(F.col("code").isin(touched_codes))
                .join(batch.select(id_col), id_col, "left_anti")
                .unionByName(
                    batch.select(F.col(id_col), F.explode("_bs").alias("code"))
                )
            )

            gen_dir = self._gen_dir(gen)
            self._write_partitions(gen_dir, new_main, new_index)
        finally:
            batch.unpersist()
        # hard-link untouched partitions from the previous generation
        for sub, touched, prefix in (
            ("main", {f"id_bucket={b}" for b in touched_buckets}, "id_bucket="),
            ("index", {f"code={c}" for c in touched_codes}, "code="),
        ):
            old_sub = os.path.join(old_gen_dir, sub)
            new_sub = os.path.join(gen_dir, sub)
            if os.path.isdir(old_sub):
                for entry in os.listdir(old_sub):
                    if entry.startswith(prefix) and entry not in touched:
                        _link_tree(
                            os.path.join(old_sub, entry),
                            os.path.join(new_sub, entry),
                        )
        self._commit(
            gen, dim, vec_col, id_col, frozen=man,
            expected_seq=man.get("commit_seq", 0),
        )

    def generations(self) -> list[int]:
        """Committed, retained generations, oldest first — immutable
        snapshots, so a ``generation=`` read is time travel within
        the vacuum horizon (same contract as
        ObservationStore.generations)."""
        man = self._manifest()
        if man is None or not os.path.isdir(self.path):
            return []
        return sorted(
            g
            for e in os.listdir(self.path)
            if e.startswith("gen-") and e[4:].isdigit()
            and (g := int(e[4:])) <= man["generation"]
        )

    def _resolve_gen(self, man: dict, generation: int | None) -> int:
        if generation is None:
            return man["generation"]
        if generation not in self.generations():
            raise ValueError(
                f"generation {generation} is not retained "
                f"(available: {self.generations()})"
            )
        return generation

    def main(self, generation: int | None = None) -> DataFrame:
        man = self._load_manifest()
        gen = self._resolve_gen(man, generation)
        return self.spark.read.parquet(
            os.path.join(self._gen_dir(gen), "main")
        )

    def candidates(
        self,
        query_vec: list[float],
        probe_hamming: int = 2,
        generation: int | None = None,
    ) -> DataFrame:
        """Partition-pruned candidate rows for a query vector. The
        LSH parameters are frozen in the manifest across ALL
        generations (upsert re-freezes them), so probes computed
        today are valid against any retained snapshot."""
        man = self._load_manifest()
        gen = self._resolve_gen(man, generation)
        probes = _probe_codes(
            query_vec, man["num_tables"], man["num_planes"], probe_hamming, man["seed"]
        )
        index = self.spark.read.parquet(
            os.path.join(self._gen_dir(gen), "index")
        )
        ids = index.filter(F.col("code").isin(probes)).select(man["id_col"]).distinct()
        return self.main(gen).join(ids, man["id_col"]).drop("id_bucket")

    def topk(
        self,
        query_vec: list[float],
        k: int = 10,
        probe_hamming: int = 2,
        generation: int | None = None,
    ) -> DataFrame:
        man = self._load_manifest()
        return topk_brute(
            self.candidates(query_vec, probe_hamming, generation=generation),
            query_vec,
            k,
            man["vec_col"],
            man["id_col"],
        )

    def topk_filtered(
        self,
        query_vec: list[float],
        where,
        k: int = 10,
        probe_hamming: int = 2,
    ) -> DataFrame:
        """Metadata-filtered ANN top-k: ``where`` is a Column predicate
        over the columns stored in ``main`` (the store keeps every
        input column, so any metadata written with the vectors is
        filterable).

        Strategy — the classic filtered-ANN hybrid: POST-FILTER the
        partition-pruned ANN candidates first (cheap, approximate,
        right when the predicate is unselective); if the filtered
        candidate set cannot fill ``k`` (a selective predicate thins
        the probe buckets — the filtered-ANN recall cliff), ESCALATE
        to the exact PRE-FILTER path: brute-force cosine over
        ``main().filter(where)``, correct at any selectivity with
        cost = one scan of the filtered relation. The escalation is
        decided by an exact count of the (pruned, small) filtered
        candidate relation — the same size-gate pattern as the
        connected-components driver arm."""
        man = self._load_manifest()
        cand = self.candidates(query_vec, probe_hamming).filter(where)
        if cand.count() >= k:
            return topk_brute(
                cand, query_vec, k, man["vec_col"], man["id_col"]
            )
        return topk_brute(
            self.main().filter(where).drop("id_bucket"),
            query_vec,
            k,
            man["vec_col"],
            man["id_col"],
        )
