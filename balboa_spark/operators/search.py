"""Ranked keyword retrieval over a document corpus: BM25.

Okapi BM25 (Robertson & Spärck Jones; the Lucene-style
``ln(1 + (N - df + 0.5)/(df + 0.5))`` positive IDF variant) — the
standard lexical ranking function a corpus pipeline needs for
query-based corpus exploration, hard-negative mining, and
contamination triage (which training docs would RANK for an eval
question, not just share an 8-gram with it — the scoring complement
of corpus.contamination_ngrams).

Scale shape: the only corpus-wide work is one scan producing
(doc length, query-term hits) per document. Tokens are filtered to
the query terms BEFORE the explode, so the posting relation that
shuffles is |matching (doc, term) pairs| — query-sized, not
corpus-sized. The df table (<= |query| rows) and the N/avgdl
single-row aggregate broadcast back; the final top-k is
orderBy+limit = TakeOrdered (per-partition heaps, no global sort).
A repeated-query deployment would persist the (doc, term, f, dl)
postings the same way VectorStore persists codes; this operator is
the ad-hoc path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from balboa_spark.operators.text import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query terms.

    Output: (id, n_terms, score) — n_terms = how many distinct query
    terms the document matched; score rounded to 4 decimals;
    deterministic order (score desc, id).

    Storage lifetime: an internal ``persist()`` dedupes the corpus
    tokenize across the plan's subtrees; the cached blocks release
    when the returned plan is garbage-collected (ContextCleaner), not
    at action completion. A long-lived session issuing many ad-hoc
    queries should drop references promptly (or use
    :class:`PostingsIndex`, which is the repeated-query design);
    per-batch streaming callers should prefer the index.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qarr = F.array(*[F.lit(w.lower()) for w in query_terms])
    t = tokens(F.col(text_col))
    # persist(): st feeds both the N/avgdl aggregate and the posting
    # explode — separate subtrees that would each re-tokenize the
    # corpus without it. persist (not localCheckpoint) keeps the plan
    # LAZY and the lineage intact (recomputable after executor loss —
    # checkpoint blocks are not), and both consumers land in the ONE
    # final query, which caches on first use. Blocks release when the
    # plan is garbage-collected (ContextCleaner).
    # NULL text is a zero-length document (dl=0, still counted in N)
    # — the same contract PostingsIndex pins in its manifest stats;
    # without the coalesce, size(NULL)=NULL silently drops NULL docs
    # from avgdl but not from N, skewing every score
    st = df.select(
        F.col(id_col),
        F.coalesce(F.size(t), F.lit(0)).alias("_dl"),
        F.coalesce(
            F.filter(t, lambda x: F.array_contains(qarr, x)),
            F.array().cast("array<string>"),
        ).alias("_qt"),
    ).persist()
    stats = st.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    tf = (
        st.select(F.col(id_col), "_dl", F.explode("_qt").alias("_term"))
        .groupBy(id_col, "_dl", "_term")
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    dft = tf.groupBy("_term").agg(F.count_distinct(F.col(id_col)).alias("_df"))
    idf = F.log(
        (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1
    )
    norm = F.col("_f") + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
    contrib = idf * F.col("_f") * (k1 + 1) / norm
    return (
        tf.join(F.broadcast(dft), "_term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum(contrib), 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


class PostingsIndex:
    """Persisted BM25 postings — the repeated-query deployment of
    :func:`bm25_topk` (which re-tokenizes the corpus per query).

    Layout mirrors VectorStore's inverted lists:

    - ``postings/``: one row per (term, doc, term-frequency, doc
      length), partitioned by ``tb`` = the term's 2-hex-char md5
      bucket — a query with Q terms reads at most Q of 256
      partitions and never scans the corpus;
    - ``terms/``: (term, df) document frequencies, same partitioning;
    - ``manifest.json``: N, avgdl, and the BM25 constants frozen at
      build time so queries and index always agree.

    Build cost = ONE corpus tokenize (the checkpointed posting
    relation feeds postings, df, and the length stats; N itself is a
    tokenize-free count), amortized over all future queries; a query
    is a partition-pruned scan + a <=Q-row broadcast + TakeOrdered.

    Consistency: builds land in a fresh ``gen-<n>/`` directory and
    commit by atomically renaming the manifest (the same model as
    VectorStore / ObservationStore) — a crash mid-rebuild leaves the
    previous index fully readable, and a concurrent query can never
    score new postings with old stats.
    """

    MANIFEST = "manifest.json"

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path

    def _term_bucket(self, term):
        return F.substring(F.md5(term), 1, 2)

    def _read_buckets(self, gen_dir: str, sub: str, buckets) -> DataFrame:
        """Partition-pruned read of ``postings/`` or ``terms/``
        limited to the given tb buckets, selecting partition
        DIRECTORIES driver-side (exact pruning, independent of filter
        pushdown) and re-casting tb to its canonical 2-hex-char
        string form. The cast matters: a generation whose bucket
        values happen to be all digit-only would have tb
        partition-type-INFERRED as int (``tb=07`` -> 7), and an
        upsert that unioned and rewrote that would emit ``tb=7``
        directories that string pruning filters silently miss."""
        import os

        base = os.path.join(gen_dir, sub)
        canon = F.lpad(F.col("tb").cast("string"), 2, "0")
        paths = [
            os.path.join(base, f"tb={b}")
            for b in sorted(set(buckets))
            if os.path.isdir(os.path.join(base, f"tb={b}"))
        ]
        if not paths:
            # none of the probe buckets exist in this generation —
            # an empty relation with the real schema. A generation
            # built from an EMPTY corpus leaves no parquet footers at
            # all (a zero-row partitioned write emits no part files),
            # so schema inference from ``base`` would raise; the
            # manifest records the id type for exactly this fallback.
            from pyspark.errors import AnalysisException

            try:
                return (
                    self.spark.read.parquet(base)
                    .withColumn("tb", canon)
                    .filter(F.lit(False))
                )
            except AnalysisException:
                return self._empty_relation(sub)
        return (
            self.spark.read.option("basePath", base)
            .parquet(*paths)
            .withColumn("tb", canon)
        )

    def _empty_relation(self, sub: str) -> DataFrame:
        """Zero-row ``postings``/``terms`` relation with the literal
        schema (id type from the manifest) — used when a generation
        holds no parquet footers to infer from."""
        man = self._manifest()
        id_type = man.get("id_type", "bigint")
        if sub == "postings":
            ddl = f"{man['id_col']} {id_type}, dl int, term string, f bigint, tb string"
        else:
            ddl = "term string, df bigint, tb string"
        return self.spark.createDataFrame([], ddl)

    def _manifest(self) -> dict:
        import json
        import os

        with open(os.path.join(self.path, self.MANIFEST)) as fh:
            return json.load(fh)

    def build(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        k1: float = BM25_K1,
        b: float = BM25_B,
    ) -> None:
        import json
        import os

        try:
            man0 = self._manifest()
            gen = man0["generation"] + 1
            expected_seq = man0.get("commit_seq", 0)
        except FileNotFoundError:
            gen = 0
            expected_seq = 0
        gen_dir = os.path.join(self.path, f"gen-{gen}")

        t = tokens(F.col(text_col))
        flat = (
            df.select(F.col(id_col), F.size(t).alias("dl"), F.explode(t).alias("term"))
            .groupBy(id_col, "dl", "term")
            .agg(F.count(F.lit(1)).alias("f"))
            .localCheckpoint(eager=True)  # feeds postings, terms, dl stats
        )
        (
            flat.withColumn("tb", self._term_bucket(F.col("term")))
            .repartition("tb")
            .write.mode("overwrite")
            .partitionBy("tb")
            .parquet(os.path.join(gen_dir, "postings"))
        )
        (
            flat.groupBy("term")
            .agg(F.count_distinct(F.col(id_col)).alias("df"))
            .withColumn("tb", self._term_bucket(F.col("term")))
            .repartition("tb")
            .write.mode("overwrite")
            .partitionBy("tb")
            .parquet(os.path.join(gen_dir, "terms"))
        )
        # avgdl over ALL docs: zero-token docs are absent from flat
        # but contribute dl=0 to the sum, so sum(per-doc dl from the
        # checkpoint) / count(input) is exact — no second tokenize
        n = df.count()
        sum_dl = (
            flat.dropDuplicates([id_col]).agg(F.sum("dl")).collect()[0][0] or 0
        )
        self._flip_manifest(
            {
                "generation": gen,
                "n": n,
                "sum_dl": sum_dl,
                "avgdl": sum_dl / n if n else 0.0,
                "k1": k1,
                "b": b,
                "id_col": id_col,
                "id_type": df.schema[id_col].dataType.simpleString(),
            },
            expected_seq=expected_seq,
        )

    def _flip_manifest(self, man: dict, expected_seq: int | None = None) -> None:
        import json
        import os

        from balboa_spark.plans.genstore import flip_manifest, vacuum_generations

        # per-generation stats snapshot INSIDE the gen dir (written
        # before the flip): scoring an older retained generation needs
        # ITS n/avgdl, not the current manifest's — stats and postings
        # must travel together or a time-travel query would mix
        # snapshots. The manifest rename stays the only commit point.
        gen_dir = os.path.join(self.path, f"gen-{man['generation']}")
        os.makedirs(gen_dir, exist_ok=True)
        stats = {k: man[k] for k in ("n", "sum_dl", "avgdl")}
        with open(os.path.join(gen_dir, "stats.json"), "w") as fh:
            json.dump(stats, fh)
        flip_manifest(self.path, man, self.MANIFEST, expected_seq=expected_seq)
        vacuum_generations(self.path, man["generation"], keep_last=2)

    def generations(self) -> list[int]:
        """Committed, retained generations, oldest first (immutable —
        ``topk(generation=n)`` is a snapshot read within the vacuum
        horizon, scored with that generation's own frozen stats)."""
        import os

        try:
            cur = self._manifest()["generation"]
        except FileNotFoundError:
            return []
        return sorted(
            g
            for e in os.listdir(self.path)
            if e.startswith("gen-") and e[4:].isdigit()
            and (g := int(e[4:])) <= cur
        )

    def _gen_stats(self, man: dict, generation: int | None) -> tuple[int, dict]:
        import json
        import os

        if generation is None:
            return man["generation"], man
        if generation not in self.generations():
            raise ValueError(
                f"generation {generation} is not retained "
                f"(available: {self.generations()})"
            )
        p = os.path.join(self.path, f"gen-{generation}", "stats.json")
        try:
            with open(p) as fh:
                stats = json.load(fh)
        except FileNotFoundError as e:
            raise ValueError(
                f"generation {generation} predates per-generation "
                "stats; only the current generation is scoreable"
            ) from e
        return generation, {**man, **stats}

    def upsert(
        self, batch: DataFrame, text_col: str = "text",
        epoch_id: int | None = None, stream_id: str = "default",
    ) -> None:
        """Append a batch of NEW documents incrementally (the
        streaming-corpus steady state): only the term buckets the
        batch's vocabulary hashes into are rewritten (old postings
        unioned with the batch's, per-term df summed); every other
        partition hard-links from the previous generation, and the
        corpus stats update from the batch's totals alone. Commit =
        the same atomic manifest flip as build.

        APPEND-ONLY by contract, and ENFORCED cheaply: the batch ids
        are semi-joined against the touched buckets' old postings
        (a relation this upsert reads anyway) and any overlap raises
        before the new generation is written. The check is partial by
        design — it sees only the buckets the batch's vocabulary
        hashes into — but a re-submitted document shares terms with
        its stored copy, so the realistic violation (same text, same
        id) always collides there. Replacing an id would otherwise
        leave its old postings in place and double-count df and
        n/sum_dl, permanently skewing every future score (use a
        rebuild for corrections) — the textual twin of
        VectorStore.upsert's replace semantics, minus replace
        (vectors are self-describing; postings are not).
        """
        import os

        from balboa_spark.plans.genstore import link_tree as _link_tree

        man = self._manifest()
        # Replay-after-commit gate (r10): with epoch_id passed (the
        # foreachBatch contract), an epoch at or below the stream's
        # committed high-water mark is a no-op on replay — without it
        # the append-only check below would raise on the batch's own
        # (committed) postings. The mark is PER STREAM (and <=, not
        # ==): foreachBatch epoch counters are per-StreamingQuery, so
        # a second feeder's epoch 0 must not be dropped as a "replay"
        # of the first feeder's, and a replay several epochs back
        # (multi-sink foreachBatch retry) must still be a no-op —
        # the same contract as ObservationStore._commit.
        last_epochs = dict(man.get("last_epochs") or {})
        if not last_epochs and man.get("last_epoch") is not None:
            last_epochs["default"] = man["last_epoch"]  # legacy field
        last = last_epochs.get(stream_id)
        if epoch_id is not None and last is not None and int(epoch_id) <= last:
            return
        id_col = man["id_col"]
        gen = man["generation"] + 1
        old_gen_dir = os.path.join(self.path, f"gen-{man['generation']}")
        gen_dir = os.path.join(self.path, f"gen-{gen}")
        # Torn-batch self-heal (r10): a crash between writing gen_dir
        # and the manifest flip leaves an UNCOMMITTED gen_dir (the
        # manifest still points below it). A replay must not trip over
        # it — parquet overwrite would cope, but link_tree hard-links
        # would hit FileExistsError on the leftovers — so clear it:
        # everything above the committed generation is garbage by
        # definition of the manifest being the one commit point.
        if os.path.isdir(gen_dir):
            import shutil

            shutil.rmtree(gen_dir)

        t = tokens(F.col(text_col))
        flat = (
            batch.select(
                F.col(id_col), F.size(t).alias("dl"), F.explode(t).alias("term")
            )
            .groupBy(id_col, "dl", "term")
            .agg(F.count(F.lit(1)).alias("f"))
            .withColumn("tb", self._term_bucket(F.col("term")))
            .localCheckpoint(eager=True)
        )
        touched = sorted(
            flat.agg(F.collect_set("tb").alias("t")).collect()[0]["t"]
        )

        old_post = self._read_buckets(old_gen_dir, "postings", touched)
        overlap = (
            old_post.join(
                flat.select(id_col).distinct(), id_col, "left_semi"
            )
            .select(id_col)
            .distinct()
            .count()
        )
        if overlap:
            raise ValueError(
                f"PostingsIndex.upsert is append-only: {overlap} batch "
                "document ids already have postings in the index; "
                "rebuild to replace documents"
            )
        (
            old_post.unionByName(flat)
            .repartition("tb")
            .write.mode("overwrite")
            .partitionBy("tb")
            .parquet(os.path.join(gen_dir, "postings"))
        )
        batch_df = flat.groupBy("term", "tb").agg(
            F.count_distinct(F.col(id_col)).alias("_bdf")
        )
        old_terms = self._read_buckets(old_gen_dir, "terms", touched)
        (
            old_terms.join(batch_df, ["term", "tb"], "full_outer")
            .select(
                "term",
                "tb",
                (
                    F.coalesce(F.col("df"), F.lit(0))
                    + F.coalesce(F.col("_bdf"), F.lit(0))
                ).alias("df"),
            )
            .repartition("tb")
            .write.mode("overwrite")
            .partitionBy("tb")
            .parquet(os.path.join(gen_dir, "terms"))
        )
        for sub in ("postings", "terms"):
            old_sub = os.path.join(old_gen_dir, sub)
            new_sub = os.path.join(gen_dir, sub)
            keep = {f"tb={b}" for b in touched}
            if os.path.isdir(old_sub):
                for entry in os.listdir(old_sub):
                    if entry.startswith("tb=") and entry not in keep:
                        _link_tree(
                            os.path.join(old_sub, entry),
                            os.path.join(new_sub, entry),
                        )

        batch_n = batch.count()
        batch_dl = (
            flat.dropDuplicates([id_col]).agg(F.sum("dl")).collect()[0][0] or 0
        )
        n = man["n"] + batch_n
        sum_dl = man.get("sum_dl", man["avgdl"] * man["n"]) + batch_dl
        flip = {
            **man,
            "generation": gen,
            "n": n,
            "sum_dl": sum_dl,
            "avgdl": sum_dl / n if n else 0.0,
        }
        if epoch_id is not None:
            last_epochs[stream_id] = int(epoch_id)
            flip["last_epochs"] = last_epochs
            flip.pop("last_epoch", None)
        self._flip_manifest(flip, expected_seq=man.get("commit_seq", 0))

    def topk(
        self,
        query_terms: Sequence[str],
        k: int = 20,
        generation: int | None = None,
    ) -> DataFrame:
        import hashlib
        import os

        if not query_terms:
            # parity with bm25_topk: a missing query is an error, not
            # an empty result set
            raise ValueError("query_terms must be non-empty")
        gen, man = self._gen_stats(self._manifest(), generation)
        id_col, k1, b = man["id_col"], man["k1"], man["b"]
        gen_dir = os.path.join(self.path, f"gen-{gen}")
        terms = sorted({w.lower() for w in query_terms})
        # partition pruning: the probe buckets are computable driver-
        # side (pure md5), so the scans carry tb IN (...) filters
        buckets = sorted({hashlib.md5(w.encode()).hexdigest()[:2] for w in terms})
        post = self._read_buckets(gen_dir, "postings", buckets).filter(
            F.col("term").isin(terms)
        )
        dft = (
            self._read_buckets(gen_dir, "terms", buckets)
            .filter(F.col("term").isin(terms))
            .select("term", "df")
        )
        idf = F.log((man["n"] - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
        norm = F.col("f") + k1 * (1 - b + b * F.col("dl") / man["avgdl"])
        contrib = idf * F.col("f") * (k1 + 1) / norm
        return (
            post.join(F.broadcast(dft), "term")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_terms"),
                F.round(F.sum(contrib), 4).alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k)
        )


def rrf_fuse(
    lists: Sequence[DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal rank fusion of top-k retrieval lists (Cormack,
    Clarke & Buettcher 2009: "Reciprocal Rank Fusion outperforms
    Condorcet and individual rank learning methods"): each input is a
    (id, score) top-k list; rank within each list by (score desc, id
    asc) and fuse as ``rrf = sum_l 1/(k + rank_l)`` — absent from a
    list contributes nothing. The standard hybrid-retrieval combiner
    (BM25 list + embedding-ANN list -> one ranking) with ``k=60`` the
    paper's constant.

    Plan note: the per-list rank is a row_number over an UNPARTITIONED
    window — deliberate and safe here, because the inputs are top-k
    lists by contract (k rows, already reduced by TakeOrdered/LIMIT
    upstream), so the single partition holds k rows, not data-scale.
    The fusion joins are id-keyed over k-sized relations. Output:
    (id, rrf_score) ordered (rrf_score desc, id), rounded to 9dp for
    cross-engine hash stability."""
    from pyspark.sql import Window

    if not lists:
        raise ValueError("rrf_fuse needs >= 1 input list")
    fused = None
    score_cols = []
    for i, df in enumerate(lists):
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        part = (
            df.select(id_col, score_col)
            .withColumn("_r", F.row_number().over(w))
            .select(
                F.col(id_col),
                (F.lit(1.0) / (F.lit(int(k)) + F.col("_r"))).alias(
                    f"_s{i}"
                ),
            )
        )
        score_cols.append(f"_s{i}")
        fused = part if fused is None else fused.join(
            part, id_col, "full_outer"
        )
    total = None
    for c in score_cols:
        term = F.coalesce(F.col(c), F.lit(0.0))
        total = term if total is None else total + term
    out = fused.select(
        F.col(id_col), F.round(total, 9).alias("rrf_score")
    ).orderBy(F.desc("rrf_score"), F.asc(id_col))
    return out.limit(int(topk)) if topk is not None else out
