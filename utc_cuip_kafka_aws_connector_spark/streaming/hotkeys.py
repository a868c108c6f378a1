"""Streaming heavy hitters: an always-current Misra-Gries sketch over
an unbounded key stream, with bounded state.

``operators/heavyhitters.py`` answers the batch question (exact
verify pass included); this is its streaming counterpart for the
ingest path — "which keys are hot RIGHT NOW" feeding skew salting
(q88) and back-pressure decisions without ever storing the key
stream. Same public algorithm (Misra-Gries 1982; the mergeable-
summaries treatment of Agarwal et al. 2013), run incrementally:

1. stateless: each row is hash-routed to one of ``n_buckets``
   partitions of the VALUE space (``pmod(xxhash64(col))`` — a value
   lives in exactly one bucket, so bucket-local frequency == global
   frequency).
2. stateful: ``applyInPandasWithState`` per bucket holds <= k MG
   counters plus the bucket's total row count and accumulated
   decrement ("deficit"). Every micro-batch folds its rows in
   (vectorized value_counts, the batch MG compress) and emits the
   bucket's CURRENT summary rows stamped with a monotone ``seq`` —
   update-mode output, so the newest ``seq`` per bucket is the live
   sketch.
3. ``current_hot_keys``: batch reduction over the materialized
   output — keep each bucket's newest snapshot, then report every
   candidate with its frequency BRACKET [weight, weight + deficit].
   The MG guarantee per bucket: any value with true frequency
   > deficit survives with weight >= freq - deficit, and deficit
   <= n_bucket/(k+1) — so with B buckets and a global threshold
   n/k', every value above it is present as long as
   n_bucket/(k+1) < n/k' (hash balance makes n_bucket ~ n/B; size
   k accordingly). The bracket makes the report honest: streaming
   has no second verify pass, so instead of pretending exactness it
   returns provable bounds (lo <= f <= hi).

State per bucket is O(k) values + 3 longs regardless of stream
length; values ride as strings in state (cast once, stateless side)
so one operator serves any key type.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_fold(counts: dict, deficit: int, batch: pd.Series, k: int) -> int:
    """Fold a batch of values into the MG dict in place; returns the
    updated accumulated deficit. Identical semantics to
    operators/heavyhitters.py::_mg_compress, applied incrementally."""
    for value, c in batch.value_counts().items():
        counts[value] = counts.get(value, 0) + int(c)
    if len(counts) > k:
        cut = sorted(counts.values(), reverse=True)[k]
        deficit += cut
        for v in [v for v, c in counts.items() if c - cut <= 0]:
            del counts[v]
        for v in counts:
            counts[v] -= cut
    return deficit


def streaming_hot_keys(
    df: DataFrame,
    col: str,
    k: int = 64,
    n_buckets: int = 8,
) -> DataFrame:
    """(bucket, seq, value, weight, deficit, n_bucket) — each micro-
    batch emits every bucket it touched as a fresh full snapshot at a
    monotone ``seq``. Reduce with ``current_hot_keys``."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def update(key, pdfs: Iterator[pd.DataFrame], state):
        if state.exists:
            values, weights, deficit, n_bucket, seq = state.get
            counts = dict(zip(values, weights))
        else:
            counts, deficit, n_bucket, seq = {}, 0, 0, 0
        for pdf in pdfs:
            s = pdf["_hk_value"].dropna()
            n_bucket += len(s)
            deficit = _mg_fold(counts, deficit, s, k)
        seq += 1
        items = sorted(counts.items())
        state.update(
            (
                [v for v, _ in items],
                [int(c) for _, c in items],
                int(deficit),
                int(n_bucket),
                int(seq),
            )
        )
        yield pd.DataFrame(
            {
                "bucket": [int(key[0])] * len(items),
                "seq": [int(seq)] * len(items),
                "value": [v for v, _ in items],
                "weight": [int(c) for _, c in items],
                "deficit": [int(deficit)] * len(items),
                "n_bucket": [int(n_bucket)] * len(items),
            }
        )

    routed = df.select(
        F.col(col).cast("string").alias("_hk_value"),
        F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(n_buckets)).alias(
            "bucket"
        ),
    )
    return routed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=(
            "bucket long, seq long, value string, weight long, "
            "deficit long, n_bucket long"
        ),
        stateStructType=(
            "values array<string>, weights array<long>, deficit long, "
            "n_bucket long, seq long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def current_hot_keys(
    snapshots: DataFrame,
    min_fraction: float | None = None,
) -> DataFrame:
    """Reduce the materialized snapshot stream to the LIVE sketch:
    keep each bucket's newest ``seq``, then one row per candidate —
    (value, freq_lo, freq_hi) with freq_lo <= true freq <= freq_hi
    (weight and weight + bucket deficit). ``min_fraction`` keeps only
    candidates whose UPPER bound clears n * min_fraction — nothing
    provably below the threshold survives, nothing above it is ever
    dropped (one-sided, like every pruning in this repo). Ordered by
    freq_lo descending, value ascending."""
    from pyspark.sql.window import Window as W

    # newest snapshot per bucket via a window, not a self-join (the
    # memory-sink view trips Catalyst's conflicting-reference check
    # when joined with an aggregate of itself); the snapshot table is
    # sketch-sized, so a per-bucket window is trivially cheap
    live = (
        snapshots.withColumn(
            "_max_seq", F.max("seq").over(W.partitionBy("bucket"))
        )
        .filter(F.col("seq") == F.col("_max_seq"))
        .drop("_max_seq")
    )
    out = live.select(
        "value",
        F.col("weight").alias("freq_lo"),
        (F.col("weight") + F.col("deficit")).alias("freq_hi"),
    )
    if min_fraction is not None:
        n = live.groupBy("bucket", "seq").agg(
            F.first("n_bucket").alias("nb")
        ).agg(F.sum("nb")).first()[0]
        out = out.filter(F.col("freq_hi") > F.lit(float(n * min_fraction)))
    return out.orderBy(F.desc("freq_lo"), F.asc("value"))
