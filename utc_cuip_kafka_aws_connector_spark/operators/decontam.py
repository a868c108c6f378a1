"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

The standard LLM-curation step (reference has no analog; north-star
extension like the rest of operators/): before training, every doc in
the training corpus is checked for n-gram overlap against the eval
benchmarks so contaminated docs can be dropped or down-weighted.

Scale design (the asymmetry IS the design): eval benchmarks are
megabytes while the training corpus is the 100 TB side, so the
distinct eval n-gram set is broadcast and the train side is touched
exactly once -- n-gram generation is scan-local (higher-order
functions, no Python, no shuffle), the contamination join is a
broadcast hash join, and the only shuffle is the final per-doc
aggregate over MATCHED rows only (a tiny fraction of the corpus).
Nothing in the plan is proportional to train x eval.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.arrayops import (
    sliding_grams,
)


def word_ngrams(text_col: str, n: int) -> Column:
    """Distinct word n-grams of lower(text), split on single spaces
    with empties dropped -- the exact tokenization the DuckDB oracles
    mirror (string_split + list_filter). Scan-local Catalyst
    expressions only."""
    # coalesce BEFORE split: the pre-r14 when/otherwise guard turned
    # null text into [] as a side effect (null condition -> otherwise
    # branch); sliding_grams propagates null, so make the null->empty
    # contract explicit (review r14)
    ws = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda w: w != F.lit(""),
    )
    # arrayops.sliding_grams: short docs yield [] natively, and the
    # zip shape avoids re-splitting the text once per gram position
    # (r14 re-evaluation note in operators/arrayops.py)
    return F.array_distinct(sliding_grams(ws, n, " "))


def _gram_sets(df: DataFrame, id_col: str, text_col: str, n: int, n_parts: int | None) -> DataFrame:
    """(id, grams) with grams = distinct word n-grams. Generation runs
    through ``pyspark.ml.feature.NGram`` -- a compiled Scala kernel,
    measured ~4x faster than the equivalent interpreted higher-order
    expression (HOFs are excluded from codegen). The input is
    repartitioned first: n-gram generation is the CPU-bound stage, and
    a small upstream file count (one local parquet file = one
    partition) must not serialize it -- at cluster scale the shuffle
    of raw text is trivially amortized by the fan-out it buys."""
    from pyspark.ml.feature import NGram

    if n_parts is None:
        n_parts = df.sparkSession.sparkContext.defaultParallelism
    # Fan out ONLY when the scan is actually narrower than the target
    # parallelism (one local parquet file = one partition would
    # serialize the CPU-bound n-gram stage). When the source already
    # carries >= n_parts splits — every real corpus at scale — the
    # round-robin repartition is a pure corpus-sized shuffle of raw
    # text and is skipped (guide §2.4: remove shuffles outright).
    # Row-level results are partitioning-independent here: generation
    # is per-row and every downstream aggregate is orderless.
    if df.rdd.getNumPartitions() < n_parts:
        df = df.repartition(n_parts)
    # coalesce BEFORE split: NGram's Scala kernel NPEs on a null
    # token array, and eval-side inputs are read raw (never
    # quality-filtered), so one null-text benchmark row would kill
    # the whole decontam stage (review r14 — the same null->[]
    # contract as word_ngrams)
    ws = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "),
            lambda w: w != F.lit(""),
        ).alias("ws"),
    )
    out = NGram(n=n, inputCol="ws", outputCol="grams").transform(ws)
    return out.select(id_col, F.array_distinct("grams").alias("grams"))


def ngram_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_parts: int | None = None,
) -> DataFrame:
    """Per-train-doc contamination report against ``eval_df``:

    ``(id_col, n_ngrams, n_contaminated, contamination, n_eval_docs)``

    where ``contamination`` = fraction of the doc's distinct n-grams
    that appear anywhere in the eval set and ``n_eval_docs`` = how
    many distinct eval docs it overlaps. Only contaminated docs are
    returned (clean docs join nothing); callers drop or threshold.

    The eval (n-gram, eval_id) pairs are explicitly broadcast: eval
    sets are benchmark-sized, the train side is the corpus.
    """
    tr = _gram_sets(train, id_col, text_col, n, n_parts).withColumn(
        "n_ngrams", F.size("grams")
    )
    ev = (
        _gram_sets(eval_df, id_col, text_col, n, n_parts)
        .select(F.col(id_col).alias("eval_id"), F.explode("grams").alias("gram"))
        .distinct()
    )
    return (
        tr.select(id_col, "n_ngrams", F.explode("grams").alias("gram"))
        .join(F.broadcast(ev), "gram")
        .groupBy(id_col, "n_ngrams")
        .agg(
            F.count_distinct("gram").alias("n_contaminated"),
            F.count_distinct("eval_id").alias("n_eval_docs"),
        )
        .withColumn(
            "contamination",
            F.col("n_contaminated").cast("double") / F.col("n_ngrams"),
        )
        .select(id_col, "n_ngrams", "n_contaminated", "contamination", "n_eval_docs")
    )
