"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard (SURVEY §2.B "LLM-data-pipeline operators").

Scale design:
- Shingling + MinHash signatures + SimHash are computed in ONE
  Arrow-batched ``mapInPandas`` pass (vectorized numpy). Built-in
  higher-order functions can express the same math, but they evaluate
  interpreted (~micro-seconds per element) -- at 100 TB that is
  30 ms/doc of expression-tree walking vs ~0.2 ms/doc in numpy. The
  UDF emits compact long arrays; everything relational downstream
  (band-bucket joins, Jaccard verification, group-bys) stays JVM-side.
- The only shuffles are the band-bucket equi-join and the group-bys --
  hash-partitioned, AQE-skew-splittable. No cross joins anywhere:
  candidate volume, not corpus size^2, drives cost.

The MinHash math is the standard Broder construction
(shingle -> H independent min-hashes via an affine family mod a
Mersenne prime -> b bands of r rows); banding parameters are
arguments, tuned so P(candidate) ~ 1-(1-s^r)^b.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P = np.uint64((1 << 61) - 1)  # Mersenne prime for the affine family
_C = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _word_hash(word: str) -> int:
    return int.from_bytes(hashlib.blake2b(word.encode(), digest_size=8).digest(), "big")


def _combine_shingles(wh: np.ndarray, n: int) -> np.ndarray:
    """Distinct polynomial combines of n consecutive word hashes
    (whole doc if < n words). Vectorized; deterministic."""
    if len(wh) < n:
        acc = np.uint64(0)
        for h in wh:
            acc = acc * _C + h
        return np.array([acc], dtype=np.uint64)
    g = np.zeros(len(wh) - n + 1, dtype=np.uint64)
    for j in range(n):
        g = g * _C + wh[j : len(wh) - n + 1 + j]
    return np.unique(g)


def _minhash_params(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(12345)
    a = rng.randint(1, (1 << 61) - 1, size=num_hashes).astype(np.uint64) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, size=num_hashes).astype(np.uint64)
    return a, b


def sketch_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    simhash_bits: int = 64,
) -> DataFrame:
    """One vectorized pass per Arrow batch producing, per document:
    ``sh``   distinct shingle hashes (array<long>, for exact Jaccard),
    ``sig``  MinHash signature        (array<long>),
    ``simhash64``  SimHash fingerprint (long).

    Input is repartitioned first so the CPU-bound sketching spreads
    over all cores even when the scan is a single small file.
    """
    a, b = _minhash_params(num_hashes)
    bit_w = np.arange(simhash_bits, dtype=np.uint64)

    pack_w = (np.uint64(1) << bit_w).astype(np.uint64)

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sh_out, sig_out, sim_out = [], [], []
            for text in pdf[text_col].astype(str):
                # hash each word once; shingles and simhash share it
                wh = np.array(
                    [_word_hash(w) for w in text.lower().split()] or [0], dtype=np.uint64
                )
                s = _combine_shingles(wh, shingle_n)
                sh_out.append(s.view(np.int64))
                # affine family mod Mersenne prime, vectorized (H x |s|)
                vals = (np.outer(a, s % _P) + b[:, None]) % _P
                sig_out.append(vals.min(axis=1).view(np.int64))
                # simhash: per-bit +-1 votes, vectorized packing
                bits = (wh[:, None] >> bit_w[None, :]) & np.uint64(1)
                votes = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
                sim_out.append((pack_w[votes > 0].sum(dtype=np.uint64)).astype(np.int64))
            yield pd.DataFrame(
                {"doc": pdf[id_col], "sh": sh_out, "sig": sig_out, "simhash64": sim_out}
            )

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(n_parts)
        .mapInPandas(sketch, schema="doc long, sh array<long>, sig array<long>, simhash64 long")
    )


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


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding + exact-Jaccard
    verification of candidates (sketches from ``sketch_documents``;
    band hashing, self equi-join, and verification are JVM-side)."""
    assert num_hashes % bands == 0
    r = num_hashes // bands

    # The sketch frame feeds three plan branches (band rows + both
    # verification joins); cache it so the expensive pass over the raw
    # text runs once. It is ~1 KB/doc -- negligible vs the corpus.
    docs = sketch_documents(df, id_col, text_col, shingle_n, num_hashes).cache()

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
    """SimHash fingerprint: per token, a 64-bit hash contributes +-1 to
    each bit position; the sign vector packs into a single long.
    Hamming distance between fingerprints approximates token-multiset
    cosine. Computed in the shared vectorized sketch pass."""
    return sketch_documents(df, id_col, text_col, simhash_bits=bits).select(
        F.col("doc").alias(id_col), "simhash64"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted shingle
    index (explode -> self equi-join on shingle -> count co-occurrences
    -> |A∩B| / (|A|+|B|-|A∩B|)). Exact, but candidate generation cost
    scales with shingle collision volume; ``max_df`` drops
    stop-shingles (document frequency > max_df) from the *index* only
    -- Jaccard is still computed over full shingle sets, so precision
    is exact and recall loss is confined to pairs sharing only
    ultra-common shingles. Prefer minhash_lsh_pairs beyond small
    corpora; this is the verification-grade ground truth.
    """
    docs = sketch_documents(df, id_col, text_col, shingle_n).select("doc", "sh").cache()
    sizes = docs.select("doc", F.size("sh").alias("n_sh"))
    inv = docs.select("doc", F.explode("sh").alias("s"))
    if max_df is not None:
        rare = inv.groupBy("s").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df)
        inv = inv.join(rare.select("s"), "s", "left_semi")
    co = (
        inv.alias("x")
        .join(inv.alias("y"), "s")
        .filter(F.col("x.doc") < F.col("y.doc"))
        .groupBy(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .agg(F.count("*").alias("n_common_indexed"))
    )
    sh_a = docs.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    jacc = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b"))
    )
    return (
        co.select("doc_a", "doc_b")
        .join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
