"""Deduplication operators for training-data pipelines.

Five families, each with a scale story for 100 TB:

- exact: hash-groupBy on a normalized fingerprint. One shuffle on the
  16-byte digest; skew-free (hashes are uniform).
- MinHash + LSH: H md5-seeded min-hashes over word shingles; banded
  signatures bucket-joined so only same-bucket docs are compared —
  candidate generation is a shuffle on (band, band_hash), never a
  cross join.
- SimHash: 32-bit parity fingerprint; near-dup = small Hamming
  distance. Bucket on the top bits to avoid the cross join.
- n-gram Jaccard: inverted-index self-join on shared shingles with a
  document-frequency cap (stop-shingle removal) to bound fan-out, then
  exact Jaccard from intersection counts.
- embedding cosine: see similarity.py.

Everything is md5-based so the DuckDB oracle reproduces values exactly
(md5 hex strings compare identically everywhere; min() over them is a
valid uniform min-hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from balboa_spark.operators.text import _shingles, fingerprint, tokens


# -- exact ------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group docs by normalized-text fingerprint: (fp, n_docs, keep_id).
    Downstream keeps ``keep_id`` per group (min id = deterministic)."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per identical normalized text."""
    w_fp = df.withColumn("fp", fingerprint(F.col(text_col)))
    keep = exact_dedup_groups(df, text_col, id_col).select("fp", "keep_id")
    return (
        w_fp.join(F.broadcast(keep), ["fp"])  # keep-set is tiny relative to corpus? no —
        # same cardinality as groups; at scale use a semi-join instead:
        .filter(F.col(id_col) == F.col("keep_id"))
        .drop("fp", "keep_id")
    )


# -- MinHash ----------------------------------------------------------------

def minhash_signature(text: Column, num_hashes: int = 16, k: int = 3) -> Column:
    """Array of ``num_hashes`` min-hashes: element h = min over word
    k-shingles of md5('h<h>|' + shingle). md5 output is uniform, so the
    lexicographic min is a proper MinHash; using seeded prefixes makes
    the H functions independent."""
    sh = _shingles(tokens(text), k)

    # NB: the lambda must take exactly ONE parameter — PySpark treats a
    # two-parameter lambda (incl. bound defaults) as (element, index).
    def seeded(h: int):
        prefix = F.lit(f"h{h}|")
        return lambda s: F.md5(F.concat(prefix, s))

    return F.array(
        *[
            F.array_min(F.transform(sh, seeded(h))).alias(f"mh{h}")
            for h in range(num_hashes)
        ]
    )


def minhash_bands(sig: Column, num_bands: int, rows_per_band: int) -> Column:
    """Band digests: band b = md5 of its ``rows_per_band`` signature
    slots joined — equal band digest <=> equal slot values."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[F.get(sig, b * rows_per_band + r) for r in range(rows_per_band)]
                )
            )
            for b in range(num_bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    num_bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing >= 1 LSH band.

    Plan shape: project signatures (no shuffle) -> explode bands ->
    shuffle on (band_idx, band_hash) -> per-bucket self-join ->
    distinct pairs. No cross join anywhere; bucket sizes are bounded
    because a band collision already implies high similarity.
    """
    rows_per_band = num_hashes // num_bands
    sig = minhash_signature(F.col(text_col), num_hashes, k)
    bands = (
        df.filter(F.size(tokens(F.col(text_col))) >= k)
        .select(F.col(id_col).alias("id"), minhash_bands(sig, num_bands, rows_per_band).alias("bands"))
        .select("id", F.posexplode("bands").alias("band_idx", "band_hash"))
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


# -- SimHash ----------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(text: Column) -> Column:
    """32-bit SimHash: bit j is the majority vote over tokens of bit j
    of the token's hash. Token-hash bit j = parity of the ascii code of
    hex digit j of md5(token) — cheap, deterministic, and expressible
    identically in the DuckDB oracle."""
    toks = tokens(text)
    n = F.size(toks).cast("long")

    # one-parameter lambda per bit (see minhash_signature note)
    def bit_pred(j: int):
        return lambda t: F.ascii(F.substring(F.md5(t), j + 1, 1)) % 2 == 1

    bits = []
    for j in range(SIMHASH_BITS):
        ones = F.size(F.filter(toks, bit_pred(j))).cast("long")
        bits.append(F.when(ones * 2 >= n, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long")))
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return F.when(n > 0, total).otherwise(F.lit(None).cast("long"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    prefix_bits: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Scale path: docs are bucketed on the top ``prefix_bits`` bits
    (near-dups collide there with high probability when distance is
    small), so the quadratic compare runs per-bucket, not globally.
    """
    sh = df.select(
        F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sh")
    ).filter(F.col("sh").isNotNull())
    pref = F.floor(F.col("sh") / F.lit(2 ** (SIMHASH_BITS - prefix_bits)))
    sh = sh.withColumn("pref", pref)
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(b, (F.col("a.pref") == F.col("b.pref")) & (F.col("a.id") < F.col("b.id")))
        .filter(ham <= max_hamming)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
    )


# -- n-gram Jaccard ---------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Exact Jaccard over distinct word k-shingle sets, computed via an
    inverted-index self-join (pairs sharing >= 1 shingle), then
    intersection/union from group counts.

    ``max_doc_freq`` drops stop-shingles appearing in more than that
    many docs — at 100 TB this caps the worst-case fan-out of the
    self-join (a shingle in 1M docs would otherwise yield 10^12 pairs);
    dropped shingles can only lower recall for pairs already below the
    threshold when corpus-frequent boilerplate is excluded.
    """
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(_shingles(tokens(F.col(text_col)), k))).alias("s"),
        )
        .distinct()
    )
    # stop-shingle cap
    freq_ok = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_")).filter(
        F.col("df_") <= max_doc_freq
    )
    sh = sh.join(F.broadcast(freq_ok.select("s")), "s")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    jac = (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return jac.select("id_a", "id_b", "jaccard")
