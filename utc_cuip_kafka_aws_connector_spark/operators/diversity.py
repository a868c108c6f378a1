"""Corpus n-gram diversity — the synthetic-data health metric
(distinct-n, Li et al. 2016 "A Diversity-Promoting Objective
Function for Neural Conversation Models"; the standard mode-collapse
detector for model-generated corpora: distinct n-gram ratios fall as
generations repeat themselves, long before exact dedup fires).

Per (group, n): ``total_grams``, ``distinct_grams``, and
``distinct_ratio`` = distinct/total, for each requested n in one
call. Uses the shared ``arrayops.sliding_grams`` kernel (the
arrays_zip shape — no HOF re-evaluation trap) over whitespace
tokens, lowercased so that casing variation does not inflate
diversity.

Scale shape: ONE corpus scan total — every requested n's gram array
is built scan-locally in the same projection and flattened into a
single (n, gram_hash) explode (a union of per-n branches would
re-scan the corpus once per n: Spark does not share scans across
union arms); the counting step is the choice:

- ``method="approx"`` (default — the 100 TB path): HLL
  ``approx_count_distinct`` per (group, n), one map-side-combined
  aggregate, shuffle = O(groups x n_values x sketch), never a gram
  row. ~2% relative error at the default precision.
- ``method="exact"``: ``count_distinct`` — the shuffle carries the
  DISTINCT GRAM SET per group (at corpus scale that is itself a
  heavy table); for tests, audits, and bounded slices.

Gram space is hashed to 64-bit (xxhash64) BEFORE counting in both
paths, so the exchanged rows are fixed-width longs, not strings; at
corpus scale the ~5e-20 per-pair collision odds are far below the
approx path's error and irrelevant to trend monitoring (stated
honestly rather than pretending string-exactness the approx path
never had).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.arrayops import (
    sliding_grams,
    ws_tokens,
)

_METHODS = ("approx", "exact")

def ngram_diversity(
    df: DataFrame,
    ns: tuple[int, ...] = (1, 2, 3),
    text_col: str = "text",
    group_col: str | None = None,
    method: str = "approx",
    rsd: float = 0.02,
) -> DataFrame:
    """(group?, n, total_grams, distinct_grams, distinct_ratio) —
    one row per (group, n). Documents shorter than ``n`` tokens
    contribute no ``n``-grams (the sliding_grams convention); NULL
    texts are empty; NULL groups are dropped. ``rsd`` is the approx
    path's target relative standard deviation."""
    if not ns or any(int(n) < 1 for n in ns):
        raise ValueError(f"ns must be non-empty, each >= 1: {ns}")
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, got {method!r}")
    keys = [group_col] if group_col else []

    base = df
    if group_col:
        base = base.filter(F.col(group_col).isNotNull())
    toks = ws_tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))

    def surface(n: int):
        return F.transform(
            sliding_grams(toks, n),
            lambda g: F.struct(
                F.lit(n).alias("n"), F.xxhash64(g).alias("__g")
            ),
        )

    all_surfaces = F.flatten(
        F.array(*[surface(n) for n in sorted({int(n) for n in ns})])
    )
    all_grams = base.select(
        *keys, F.explode(all_surfaces).alias("__s")
    ).select(*keys, F.col("__s.n").alias("n"), F.col("__s.__g").alias("__g"))

    distinct = (
        F.approx_count_distinct("__g", rsd=rsd)
        if method == "approx"
        else F.count_distinct("__g")
    )
    # a (group, n) slice with zero grams (every doc shorter than n)
    # is simply absent: nothing exploded, nothing to rate
    agg = all_grams.groupBy(*keys, "n").agg(
        F.count(F.lit(1)).alias("total_grams"),
        distinct.alias("distinct_grams"),
    )
    return agg.select(
        *keys,
        "n",
        "total_grams",
        "distinct_grams",
        (F.col("distinct_grams") / F.col("total_grams")).alias(
            "distinct_ratio"
        ),
    )
