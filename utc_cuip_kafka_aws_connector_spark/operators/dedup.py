"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard (SURVEY §2.B "LLM-data-pipeline operators").

Scale design: everything is expressed with higher-order array
functions + equi-joins, so the only shuffles are (a) the group-by on
the dedup key and (b) the band-bucket join -- both hash-partitioned
and AQE-skew-splittable. No cross joins, no Python in the hot path.

The MinHash math follows the standard Broder construction
(shingle -> H independent min-hashes -> b bands of r rows); banding
parameters are arguments, tuned so P(candidate) ~ 1-(1-s^r)^b.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact dedup on content hash: keeps the lowest id per md5(text).

    groupBy(hash) -> min(id) is the partial-aggregating formulation:
    at 100 TB the map-side combine collapses duplicates before the
    shuffle, unlike a window row_number which must sort every group.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the lowercased text (built-in
    transform/slice -- no explode, stays one row per document)."""
    w = F.split(F.lower(F.col(text_col)), r"\s+")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        )
    )


def minhash_signature(shingle_col: str, num_hashes: int = 64) -> Column:
    """H-wide MinHash signature: sig[j] = min over shingles of
    xxhash64(j, shingle). Nested higher-order functions -- one pass,
    JVM-side, ~H*|shingles| hashes per doc."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda j: F.array_min(F.transform(F.col(shingle_col), lambda s: F.xxhash64(j, s))),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding + exact Jaccard
    verification of candidates.

    Plan shape: per-doc signature (no shuffle) -> explode to b band
    rows -> self equi-join on (band, band_hash) -> join shingle sets
    back -> exact Jaccard filter. Candidate volume, not corpus size,
    drives the join cost -- the property that makes this work at 100 TB.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands

    docs = df.select(
        F.col(id_col).alias("doc"),
        shingles(text_col, shingle_n).alias("sh"),
    ).withColumn("sig", minhash_signature("sh", num_hashes))

    band_rows = docs.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda k: F.hash(F.slice("sig", k * r + 1, r)),
            )
        ).alias("band", "band_hash"),
    )

    a = band_rows.select(F.col("doc").alias("doc_a"), "band", "band_hash")
    b = band_rows.select(F.col("doc").alias("doc_b"), "band", "band_hash")
    cand = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    sh_a = docs.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    jacc = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b"))
    )
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str = "text", bits: int = 64) -> DataFrame:
    """SimHash fingerprint: per token, xxhash64 contributes +-1 to each
    bit position; the sign vector packs into a single long. Hamming
    distance between fingerprints approximates token-multiset cosine.
    """
    # SQL-lambda form: the Python F.shiftright wrapper only takes a
    # literal shift amount, but the SQL function accepts a column.
    packed = F.expr(
        f"""
        aggregate(
          transform(sequence(0, {bits - 1}), j ->
            aggregate(split(lower({text_col}), '\\\\s+'), 0, (acc, t) ->
              acc + CASE WHEN shiftright(xxhash64(t), j) & 1 = 1 THEN 1 ELSE -1 END)),
          CAST(0 AS BIGINT),
          (acc, v) -> shiftleft(acc, 1) | CASE WHEN v > 0 THEN 1 ELSE 0 END)
        """
    )
    return df.select(F.col(id_col), packed.alias("simhash64"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted shingle
    index (explode -> self equi-join on shingle -> count co-occurrences
    -> |A∩B| / (|A|+|B|-|A∩B|)). Exact, but candidate generation cost
    scales with shingle collision volume -- prefer minhash_lsh_pairs
    beyond small corpora; this is the verification-grade oracle.
    """
    docs = df.select(F.col(id_col).alias("doc"), shingles(text_col, shingle_n).alias("sh"))
    sizes = docs.select("doc", F.size("sh").alias("n_sh"))
    inv = docs.select("doc", F.explode("sh").alias("s"))
    co = (
        inv.alias("x")
        .join(inv.alias("y"), "s")
        .filter(F.col("x.doc") < F.col("y.doc"))
        .groupBy(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jacc = F.col("n_common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        co.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
