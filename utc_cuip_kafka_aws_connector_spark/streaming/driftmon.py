"""Streaming distribution-drift monitor: per-event-time-window PSI
against a frozen reference.

``operators/drift.py`` compares two table VERSIONS; the streaming
question is different — "is the feed drifting away from the
distribution my models were built on, and in which window did it
start?". The standard monitoring shape (same PSI math, windowed):

1. ``reference_profile`` — one batch pass over the reference table:
   bin bounds + per-bin masses (conditional on non-null, the r9
   drift contract), a driver-small list that rides into the stream
   as LITERALS (no join, no broadcast machinery needed).
2. ``streaming_bucket_counts`` — the ONLY streaming stage: a
   watermarked tumbling-window count per histogram bucket (the
   ``stats.histogram`` bucket expression over event-time windows) —
   a plain append-mode streaming aggregation whose state is
   O(windows x bins), independent of stream volume.
3. ``window_psi`` — batch reduction over the materialized counts
   (foreachBatch or the sink table): per window, normalize counts to
   masses, PSI against the reference as ONE aggregation —
   sum over bins of (q - p) * ln(q / p), both Laplace-floored —
   with the conventional verdicts (stable < 0.1 <= moderate < 0.25
   <= major). No collect crosses the driver except the reference
   profile itself.

Because stage 3 is plain SQL over (window, bucket, n) rows, the
monitor back-tests on historical data identically to how it runs
live — pinned in tests/test_streaming_drift.py by replaying a stream
whose second window is shifted and checking the PSI values equal the
batch ``drift.psi`` on the same slices.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.stats import histogram


def reference_profile(
    ref: DataFrame, col: str, nbins: int = 20
) -> dict:
    """{'lo', 'hi', 'nbins', 'masses'} — masses over buckets
    -1..nbins (underflow..overflow), conditional on non-null, summing
    to exactly 1. Driver-small (nbins + 2 floats)."""
    lo, hi = ref.agg(F.min(col), F.max(col)).first()
    if lo is None:
        raise ValueError(f"reference has no non-null {col!r}")
    lo = float(lo)
    hi = float(hi) if float(hi) > lo else lo + 1.0
    nonnull = ref.filter(F.col(col).isNotNull())
    rows = {r.bucket: r.n for r in histogram(nonnull, col, lo, hi, nbins).collect()}
    total = sum(rows.values())
    if total == 0:
        raise ValueError(f"reference has no rows for {col!r}")
    return {
        "lo": lo,
        "hi": hi,
        "nbins": nbins,
        "masses": [rows.get(b, 0) / total for b in range(-1, nbins + 1)],
    }


def _bucket_expr(col: str, profile: dict):
    lo, hi, nbins = profile["lo"], profile["hi"], profile["nbins"]
    width = (hi - lo) / nbins
    c = F.col(col)
    return (
        F.when(c < F.lit(lo), F.lit(-1))
        .when(c >= F.lit(hi), F.lit(nbins))
        .otherwise(
            F.least(F.floor((c - F.lit(lo)) / F.lit(width)), F.lit(nbins - 1))
        )
        .cast("long")
    )


def streaming_bucket_counts(
    stream: DataFrame,
    col: str,
    profile: dict,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(window, bucket, n) per tumbling event-time window — the
    append-mode streaming aggregation. Null values are excluded (their
    rate is its own signal; count them with a second trivial agg if
    needed), matching the reference profile's conditioning."""
    return (
        stream.filter(F.col(col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("window"),
            _bucket_expr(col, profile).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def window_psi(
    counts: DataFrame, profile: dict, eps: float = 1e-6
) -> DataFrame:
    """(window_start, window_end, n_rows, psi, verdict) per window,
    from materialized (window, bucket, n) rows. One aggregation: the
    reference mass joins in as a literal bucket->p map, masses
    normalize per window, and PSI folds bin-wise. Bins the window
    never saw contribute (eps - p) * ln(eps / p) — added as the
    closed-form remainder (sum over ALL bins of the floored-q term
    minus the observed bins' floored-q term), so absent bins are
    charged exactly like ``drift.psi`` charges them."""
    p_map = F.create_map(
        *[
            x
            for b, p in zip(
                range(-1, profile["nbins"] + 1), profile["masses"]
            )
            for x in (F.lit(b), F.lit(max(p, eps)))
        ]
    )
    # per-row: floored reference mass for this bucket
    rows = counts.select(
        F.col("window"),
        F.col("bucket"),
        F.col("n"),
        # try_element_at, not getItem(Column) (deprecated
        # FutureWarning) and not element_at (ANSI mode — Spark 4's
        # default — throws MAP_KEY_DOES_NOT_EXIST on a missing key
        # where getItem returned null; back-testing over rows written
        # under a different profile must stay a null-psi verdict, not
        # a job failure)
        F.try_element_at(p_map, F.col("bucket")).alias("p"),
    )
    # constant: sum over every bin of the "q = eps" term against p
    all_eps = sum(
        (eps - max(p, eps)) * math.log(eps / max(p, eps))
        for p in profile["masses"]
    )
    per_win = rows.groupBy("window").agg(
        F.sum("n").alias("n_rows"),
        F.collect_list(F.struct("bucket", "n", "p")).alias("bins"),
    )
    observed = F.aggregate(
        F.col("bins"),
        F.lit(0.0),
        lambda acc, b: acc
        + (
            (
                F.greatest(
                    b.getField("n").cast("double") / F.col("n_rows"),
                    F.lit(eps),
                )
                - b.getField("p")
            )
            * F.log(
                F.greatest(
                    b.getField("n").cast("double") / F.col("n_rows"),
                    F.lit(eps),
                )
                / b.getField("p")
            )
        )
        - (
            (F.lit(eps) - b.getField("p"))
            * F.log(F.lit(eps) / b.getField("p"))
        ),
    )
    psi = observed + F.lit(all_eps)
    return per_win.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n_rows",
        psi.alias("psi"),
        F.when(psi < 0.1, "stable")
        .when(psi < 0.25, "moderate")
        .otherwise("major")
        .alias("verdict"),
    ).orderBy("window_start")
