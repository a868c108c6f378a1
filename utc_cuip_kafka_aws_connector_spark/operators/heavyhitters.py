"""Heavy-hitter detection with bounded state: distributed
Misra-Gries summaries + an exact verification pass.

Why not just ``groupBy(col).count().orderBy(...).limit(k)``? That
baseline shuffles ONE ROW PER DISTINCT KEY — at 100 TB a
near-unique column (url, session id) makes the "diagnostic" as
expensive as the job it is diagnosing. The Misra-Gries summary
(Misra & Gries 1982, in the batch-compress form of Agarwal et al.
2013's mergeable summaries) caps the state at ``k`` counters per
partition, so the shuffle moves <= k+1 rows per partition regardless
of cardinality, with the classic guarantee: a value's summed summary
weight under-estimates its true frequency by at most n/(k+1), so
every value with true frequency > n/k has POSITIVE merged weight —
no false negatives. Because per-partition decrements differ, merged
weight does NOT rank reliably, so candidate selection uses the
bound, not a top-k: everything with merged weight >
n/(k*(k+1)) survives (any true heavy hitter clears that by
freq - n/(k+1) > n/k - n/(k+1) = n/(k*(k+1))), and since weights sum
to <= n there are at most k*(k+1) such values — driver-small for
any sane k. A final exact count over just those candidates (an
``isin`` filter the scan can push down) removes both the
under-estimate and the false positives.

This is the decision input for the skew toolkit: feed a join key
through ``heavy_hitters`` and any key whose frequency exceeds a few
times the per-task row budget belongs in ``operators/skew.py::
salted_join`` (or confirms AQE's skew split will engage);
``suggest_salt_buckets`` mechanizes exactly that.

Nulls: excluded (dropped before counting, and n counts non-null
rows) — null join keys never match anyway, so they are skew the
join will not suffer.

Plan shape: one mapInPandas sweep (Arrow-batched pandas
value_counts + counter compress per batch — no per-row Python), a
(k+1)-rows-per-partition shuffle to merge, one pushed-down filtered
count pass over the candidates.

Reference basis: the reference repo (389 pandas lines, run.py:27-56)
has no profiling surface; public-algorithm implementation for
SURVEY §2.D scale tooling.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_compress(counts: dict, k: int) -> dict:
    """Keep <= k counters by decrementing every counter by the
    (k+1)-th largest count and dropping the non-positive — the batch
    Misra-Gries step. Total decrement applied to any single value
    across a partition's compresses is <= (partition rows)/(k+1)."""
    if len(counts) <= k:
        return counts
    cut = sorted(counts.values(), reverse=True)[k]
    return {v: c - cut for v, c in counts.items() if c > cut}


def mg_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: (value, weight, n_part)
    with <= k+1 rows per partition (a weight-0 placeholder carries
    ``n_part`` when every counter was evicted). ``weight`` lower-
    bounds the partition-local frequency by at most
    (partition rows)/(k+1); ``n_part`` is the partition's non-null
    row count, emitted on the first row only so ``sum(n_part)``
    recovers n without a second scan of the input."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        total = 0
        for pdf in batches:
            s = pdf[col].dropna()
            total += len(s)
            for value, c in s.value_counts().items():
                counts[value] = counts.get(value, 0) + int(c)
            counts = _mg_compress(counts, k)
        if total:
            items = list(counts.items()) or [(None, 0)]
            yield pd.DataFrame(
                {
                    col: [v for v, _ in items],
                    "weight": [w for _, w in items],
                    "n_part": [total] + [0] * (len(items) - 1),
                }
            )

    field = df.schema[col].dataType.simpleString()
    return df.select(col).mapInPandas(
        summarize, schema=f"`{col}` {field}, weight long, n_part long"
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 64,
    min_fraction: float | None = None,
) -> DataFrame:
    """Exact (value, freq) of every non-null value with frequency >
    max(n/k, n*min_fraction), identical to what the full
    ``groupBy(col).count()`` would produce for the same threshold
    (tests pin the equivalence) but with k-bounded shuffle state.

    ``min_fraction`` only tightens the REPORTING threshold; the
    detection guarantee is fixed at n/k by ``k``."""
    summ = mg_summaries(df, col, k).persist()
    try:
        n = summ.agg(F.sum("n_part")).first()[0] or 0
        if n == 0:
            return summ.select(col, F.col("weight").alias("freq")).limit(0)
        candidates = [
            r[0]
            for r in summ.groupBy(col)
            .agg(F.sum("weight").alias("weight"))
            .filter(F.col(col).isNotNull())
            .filter(F.col("weight") > F.lit(n / (k * (k + 1))))
            .select(col)
            .collect()
        ]
    finally:
        summ.unpersist()
    threshold = n / k
    if min_fraction is not None:
        threshold = max(threshold, n * min_fraction)
    if not candidates:
        return df.select(col, F.lit(0).cast("long").alias("freq")).limit(0)
    return (
        df.filter(F.col(col).isin(candidates))
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > F.lit(threshold))
        .orderBy(F.desc("freq"), F.asc(col))
    )


def suggest_salt_buckets(
    df: DataFrame,
    col: str,
    rows_per_task: int,
    k: int = 64,
) -> int:
    """Salt-bucket count for ``skew.salted_join``: the hottest key's
    exact frequency divided by the per-task row budget (rounded up,
    min 1 — 1 means "not skewed, don't salt"). Driver-small: reads
    one row of the heavy-hitter table."""
    if rows_per_task < 1:
        raise ValueError(f"rows_per_task must be >= 1, got {rows_per_task}")
    top = heavy_hitters(df, col, k=k).limit(1).collect()
    if not top:
        return 1
    return max(1, -(-top[0].freq // rows_per_task))
