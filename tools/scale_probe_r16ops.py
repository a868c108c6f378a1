"""sf1-equivalent scale probe for the r16 late-session operators
(the scale_probe_sf1.py recipe: no sf1 fixture exists, so the corpus
is synthesized at sf1's scale from sf0.1 — each document replicated
10x under shifted doc_ids with a distinct word prepended per replica,
~50k docs / ~15M chars).

Probes (each timed to a materialized count, best-of-2 warm):
  diversity       ngram_diversity approx, ns=(1,2,3) — the explode
                  path; one scan, gram rows ~3x corpus tokens
  kll             kll_sketch per lang + p50/p95/p99 query — the
                  mapInPandas partial + applyInPandas merge shape
  reservoir       weighted_sample_n, 1000 per lang stratum — the
                  single-window draw
  retention       retention_curve grouped with token weights — the
                  one-aggregation histogram path
  prefpairs       best_rest over doc_id%5000 prompts — the
                  per-prompt window shape at ~10 responses/prompt
  conversations   flags+stats+fingerprint over synthesized turn
                  lists — the scan-local HOF tier

Prints one line per probe; paste the table into BENCH_NOTES.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.session import get_spark


def timed(label, fn, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:<28s} {best:7.2f}s  (rows={n})")


def main():
    spark = get_spark(app_name="scale_probe_r16ops")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = spark.range(10).select(F.col("id").alias("rep"))
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
            F.concat(
                F.lit("rep"), F.col("rep").cast("string"), F.lit(" "),
                F.col("text"),
            ).alias("text"),
            "lang",
        )
        .persist()
    )
    n = big.count()
    print(f"synthesized corpus: {n} docs")

    from utc_cuip_kafka_aws_connector_spark.operators.diversity import (
        ngram_diversity,
    )

    timed(
        "diversity approx n=1,2,3",
        lambda: ngram_diversity(
            big, ns=(1, 2, 3), group_col="lang", method="approx"
        ).count(),
    )

    from utc_cuip_kafka_aws_connector_spark.operators.kll import (
        kll_quantiles,
        kll_sketch,
    )

    with_len = big.withColumn("len", F.length("text").cast("double"))
    timed(
        "kll sketch+quantiles",
        lambda: kll_quantiles(
            kll_sketch(with_len, ["lang"], "len", k=256),
            [0.5, 0.95, 0.99],
            keys=["lang"],
        ).count(),
    )

    from utc_cuip_kafka_aws_connector_spark.operators.reservoir import (
        weighted_sample_n,
    )

    weighted = big.withColumn(
        "w", F.length("text").cast("double") + 1.0
    )
    timed(
        "reservoir 1000/stratum",
        lambda: weighted_sample_n(
            weighted, 1000, "doc_id", "w", strata_col="lang"
        ).count(),
    )

    from utc_cuip_kafka_aws_connector_spark.operators.retention import (
        retention_curve,
    )

    scored = big.withColumn(
        "score", F.length("text") / F.lit(600.0)
    ).withColumn(
        "toks", F.size(F.split(F.trim("text"), r"\s+")).cast("double")
    )
    timed(
        "retention 50pt grouped",
        lambda: retention_curve(
            scored, "score", 0.0, 1.5, n_points=50,
            weight_col="toks", group_col="lang",
        ).count(),
    )

    from utc_cuip_kafka_aws_connector_spark.operators.prefpairs import (
        preference_pairs,
    )

    responses = big.select(
        (F.col("doc_id") % 5000).alias("prompt_id"),
        F.col("doc_id").alias("response_id"),
        (F.length("text").cast("double")).alias("score"),
    )
    timed(
        "prefpairs best_rest",
        lambda: preference_pairs(
            responses, strategy="best_rest", max_pairs_per_prompt=4
        ).count(),
    )

    from utc_cuip_kafka_aws_connector_spark.operators.conversations import (
        conversation_fingerprint,
        conversation_flags,
        conversation_stats,
    )

    convs = big.select(
        F.col("doc_id").alias("conv_id"),
        F.transform(
            F.slice(F.split("text", r"\. "), 1, 8),
            lambda s, i: F.struct(
                F.when(i % 2 == 0, F.lit("user"))
                .otherwise(F.lit("assistant"))
                .alias("role"),
                s.alias("content"),
            ),
        ).alias("turns"),
    )
    timed(
        "conversation tier",
        lambda: conversation_fingerprint(
            conversation_stats(conversation_flags(convs))
        )
        .filter("cv_valid OR NOT cv_valid")
        .count(),
    )

    big.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
