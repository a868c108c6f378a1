"""DSIR — Data Selection via Importance Resampling (Xie et al.
2023, arXiv:2302.03169): pick raw-corpus documents that look like a
target domain, by importance weights under two hashed n-gram bag
models.

The public recipe, re-expressed as three DataFrame plans:

1. **Features** (``hashed_ngram_features``): word unigrams +
   bigrams hashed into ``n_buckets`` (the paper's 10k-bucket hashing
   trick) — explode + ``xxhash64``/``pmod``, one groupBy per doc.
   Vocabulary is never collected; collisions are part of the model
   on BOTH sides, so they cancel to first order.
2. **Fit** (``dsir_fit``): bucket distributions of the TARGET
   (in-domain sample) and the RAW corpus, Laplace-smoothed; the
   model is one ``(bucket, log_ratio)`` table of exactly
   ``n_buckets`` rows — KBs, always broadcastable.
3. **Weights + resample** (``dsir_weights``, ``dsir_resample``):
   ``log w(x) = sum_b c_b(x) * (log p_target(b) - log p_raw(b))``
   via one explode + broadcast join + per-doc sum; then sampling
   WITHOUT replacement proportional to ``softmax(log w)`` by the
   Gumbel top-k trick (Vieira 2014): key = ``log w + Gumbel(0,1)``,
   take the global top k. The Gumbel draw is a deterministic
   function of ``(id_col, seed)`` through xxhash64, so selection is
   reproducible run-to-run and layout-independent — the same
   engine-portable-draw discipline as operators/sampling.py's
   hash sampler.

Scale story at 100 TB: the corpus-sized stages are one explode ->
map-side-combined groupBy (features) and one broadcast join + sum
(weights); the model is O(n_buckets). The resample is a global
top-k — TakeOrderedAndProject, per-partition heaps of k, no full
sort, no collect. Skewed hot buckets are bounded by the build side
being unique-keyed per bucket.

Float caveat: per-doc weight sums are double adds in shuffle order
— tolerance-stable (1e-9 differential in tests/test_dsir.py), same
contract as operators/nbquality.py.

Reference basis: SURVEY §2.D training-data-pipeline scope (the
reference repo has no selection surface); built from the public
paper + the hashing-trick/Gumbel-top-k literature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.arrayops import (
    sliding_grams,
)
from utc_cuip_kafka_aws_connector_spark.operators.text import words


def _ngram_buckets(text_col: str, n_buckets: int, n_max: int) -> Column:
    """Array of hashed n-gram buckets (orders 1..n_max) for a text
    column — built with JVM array ops, no explode yet."""
    toks = F.filter(words(text_col), lambda w: w != F.lit(""))
    grams = []
    for n in range(1, n_max + 1):
        # arrayops.sliding_grams: n == 1 is the identity, short docs
        # yield [] — and the zip shape avoids re-running the
        # tokenize chain once per gram position (r14 re-evaluation
        # note in operators/arrayops.py)
        grams.append(sliding_grams(toks, n, " "))
    allg = F.concat(*grams) if len(grams) > 1 else grams[0]
    return F.transform(
        allg, lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets))
    )


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    n_max: int = 2,
) -> DataFrame:
    """Per-document hashed n-gram counts: ``(id_col, bucket,
    cnt)``. One explode + map-side-combined groupBy."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if n_max < 1:
        raise ValueError(f"n_max must be >= 1, got {n_max}")
    return (
        df.select(
            F.col(id_col),
            F.explode(_ngram_buckets(text_col, n_buckets, n_max)).alias(
                "bucket"
            ),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10_000,
    n_max: int = 2,
    alpha: float = 1.0,
) -> DataFrame:
    """The importance model: ``(bucket, log_ratio)`` over ALL
    ``n_buckets`` buckets (never-seen buckets get the smoothed
    ratio, so weighting is total). ``log_ratio = log p_target(b) -
    log p_raw(b)`` with Laplace-``alpha`` smoothing on both sides.
    Two corpus histograms + one n_buckets-sized outer join."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")

    def hist(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(
                F.explode(
                    _ngram_buckets(text_col, n_buckets, n_max)
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    spark = target.sparkSession
    full = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    t, r = hist(target, "t_cnt"), hist(raw, "r_cnt")
    joined = (
        full.join(t, on="bucket", how="left")
        .join(r, on="bucket", how="left")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
        )
    )
    # totals via a window-free cross join of two scalar aggregates
    totals = joined.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("r_cnt").alias("r_tot")
    )
    a = F.lit(float(alpha))
    b = F.lit(float(alpha) * n_buckets)
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            (F.log(F.col("t_cnt") + a) - F.log(F.col("t_tot") + b))
            - (F.log(F.col("r_cnt") + a) - F.log(F.col("r_tot") + b))
        ).alias("log_ratio"),
    )


def dsir_weights(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    n_max: int = 2,
) -> DataFrame:
    """Per-document log importance weight: ``(id_col, log_weight)``.
    ``n_buckets``/``n_max`` MUST match ``dsir_fit``'s (the feature
    space is the contract between the two). Empty documents weigh
    0 (no evidence either way)."""
    feats = hashed_ngram_features(df, text_col, id_col, n_buckets, n_max)
    scored = feats.join(F.broadcast(model), on="bucket", how="inner")
    sums = scored.groupBy(id_col).agg(
        F.sum(F.col("cnt") * F.col("log_ratio")).alias("log_weight")
    )
    return (
        df.select(id_col)
        .join(sums, on=id_col, how="left")
        .select(
            id_col, F.coalesce("log_weight", F.lit(0.0)).alias("log_weight")
        )
    )


def dsir_resample(
    weighted: DataFrame,
    k: int,
    seed: int = 0,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
) -> DataFrame:
    """k documents sampled WITHOUT replacement proportional to
    ``softmax(log_weight)`` — the Gumbel top-k trick: each row's key
    is ``log_weight + Gumbel(0,1)`` and the global k largest keys
    are exactly such a sample. The Gumbel variate derives from
    ``xxhash64(id, seed)`` mapped to (0,1) — reproducible and
    layout-independent; a new seed is a fresh draw. Returns the
    selected rows of ``weighted`` plus the ``gumbel_key`` column
    (global top-k: TakeOrderedAndProject, no full sort)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # 53-bit mantissa-exact uniform in (0,1): (h + 0.5) / 2^53
    h = F.pmod(
        F.xxhash64(F.col(id_col), F.lit(int(seed))), F.lit(1 << 53)
    )
    u = (h + F.lit(0.5)) / F.lit(float(1 << 53))
    key = F.col(weight_col) - F.log(-F.log(u))
    return (
        weighted.withColumn("gumbel_key", key)
        .orderBy(F.col("gumbel_key").desc())
        .limit(k)
    )


def dsir_select(
    target: DataFrame,
    raw: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    n_max: int = 2,
    alpha: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """The composed pipeline: fit on (target, raw), weight raw,
    resample k — returns ``(id_col, log_weight, gumbel_key)``."""
    model = dsir_fit(target, raw, text_col, n_buckets, n_max, alpha)
    weighted = dsir_weights(raw, model, text_col, id_col, n_buckets, n_max)
    return dsir_resample(weighted, k, seed, id_col)
