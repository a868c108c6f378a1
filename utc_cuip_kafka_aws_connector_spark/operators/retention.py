"""Retention curves — "what survives at each quality threshold".
Choosing a filter cut (quality score, perplexity, dedup similarity)
needs the whole trade-off curve, not one point: for a grid of
thresholds, how many documents and how much weight (token mass)
remain? This operator produces that curve in ONE corpus pass.

Scale shape (the reason this is not a window over the corpus): the
naive phrasing — rank every row by score and cumsum — is a global
sort (single partition for the window, the exact anti-pattern
perplexity_buckets' approx path exists to avoid). Instead each row
is bucketed onto the threshold grid with scan-local arithmetic, ONE
map-side-combined aggregation builds the per-(group, bucket)
histogram — the only pass over the data — and the suffix sums, grid
completion, and fractions are assembled on the DRIVER from that
histogram, which is grid-sized by construction (groups x
(n_points+2) rows; the same driver-sized contract as
sampling.temperature_weights' normalizer and unimax's waterfilling).
A lazy multi-branch plan over the histogram would re-scan the corpus
once per branch unless exchange reuse happens to fire; collecting
the bounded histogram makes the single pass a guarantee, not an
optimizer outcome.

Exactness: ``docs_kept`` at threshold ``t`` counts rows with
``score >= t`` exactly, where ``t`` is the IEEE-double value the
output row carries (``lo + i*step``). The scan-local bucketing is a
floor-division ESTIMATE corrected one step each way against that
same grid expression, so membership is bit-consistent with a direct
``score >= threshold`` comparison in any engine that computes the
grid the same way — the surface is oracle-exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_curve(
    df: DataFrame,
    score_col: str,
    lo: float,
    hi: float,
    n_points: int = 50,
    weight_col: str | None = None,
    group_col: str | None = None,
    max_groups: int = 10_000,
) -> DataFrame:
    """(group?, threshold, docs_kept, docs_frac[, weight_kept,
    weight_frac]): for each of the ``n_points + 1`` equally spaced
    thresholds ``t_i = lo + i*(hi-lo)/n_points``, the count (and
    optional weight, e.g. token mass) of rows with ``score >= t_i``,
    plus fractions of the group's eligible total. Monotone
    non-increasing in the threshold by construction; every grid row
    is present even when empty.

    ``lo``/``hi`` are explicit (bounds are a modeling choice — score
    scales are usually known, e.g. [0,1] for calibrated quality).
    Rows with score < lo count toward the totals — they are real
    corpus mass the fractions must reflect — but survive no
    threshold; rows with score >= hi survive every threshold. NULL
    scores are excluded entirely (no rank), as are NULL groups.
    Weight sums fold in bucket order (deterministic per partitioning;
    the docs surface is integer-exact always).

    ``group_col`` is meant for mixture-sized keys (language, source,
    domain bucket); the per-(group, bucket) histogram is collected to
    the driver, so a high-cardinality key passed by mistake (a URL, a
    doc id) would otherwise OOM it silently. ``max_groups`` bounds
    that collect — same refuse-loudly contract as
    ``kll.kll_sketch``'s ``max_groups_per_partition`` — by capping
    the rows fetched at ``max_groups * (n_points + 2)`` (each group
    occupies at most n_points + 2 buckets, so exceeding the cap
    proves the group count exceeded ``max_groups``; driver memory is
    bounded by the cap either way)."""
    if not (hi > lo):
        raise ValueError(f"hi must be > lo, got lo={lo}, hi={hi}")
    if n_points < 1:
        raise ValueError(f"n_points must be >= 1, got {n_points}")
    if max_groups < 1:
        raise ValueError(f"max_groups must be >= 1, got {max_groups}")

    step = (hi - lo) / n_points
    keys = [group_col] if group_col else []
    s = F.col(score_col).cast("double")

    def t_of(i):
        # MUST mirror the driver-side grid arithmetic bit-for-bit:
        # membership is "score >= the threshold the output row
        # carries", both sides computing lo + i*step as doubles
        return F.lit(float(lo)) + i.cast("double") * F.lit(step)

    # bucket = largest i with t_i <= score, clamped into [-1,
    # n_points] (-1: survives nothing; n_points: survives all). The
    # floor-division estimate can sit one cell off the t_i <= s
    # definition on representational boundaries (the division rounds
    # independently of the grid's multiply-add), so correct one step
    # each way against t_of itself.
    est = F.floor((s - F.lit(float(lo))) / F.lit(step))
    up = est + F.when(t_of(est + 1) <= s, F.lit(1)).otherwise(F.lit(0))
    down = up - F.when(t_of(up) > s, F.lit(1)).otherwise(F.lit(0))
    bucket = F.greatest(
        F.least(down, F.lit(n_points).cast("long")),
        F.lit(-1).cast("long"),
    )

    # NaN: floor(NaN) = 0 would bucket NaN rows as "surviving the
    # low thresholds only" — neither >= nor < any threshold is true
    # of NaN, so such rows are excluded like NULLs
    base = df.filter(s.isNotNull() & ~F.isnan(s))
    if group_col:
        base = base.filter(F.col(group_col).isNotNull())
    aggs = [F.count(F.lit(1)).alias("__docs")]
    if weight_col:
        aggs.append(F.sum(F.col(weight_col).cast("double")).alias("__w"))
    hist = base.withColumn("__b", bucket).groupBy(*keys, "__b").agg(*aggs)

    # the single corpus pass ends here; the histogram is grid-sized.
    # limit() bounds what ever reaches the driver: one row past the
    # cap proves > max_groups groups (see docstring arithmetic).
    _cap = max_groups * (n_points + 2)
    rows = hist.limit(_cap + 1).collect()
    if len(rows) > _cap:
        raise ValueError(
            f"retention_curve collected more than max_groups="
            f"{max_groups} groups worth of histogram rows (> {_cap}); "
            f"group_col={group_col!r} looks high-cardinality (a URL or "
            f"doc id?) — pass a mixture-sized key or raise max_groups"
        )
    by_group: dict = {}
    for r in rows:
        g = r[group_col] if group_col else None
        by_group.setdefault(g, {})[r["__b"]] = (
            r["__docs"],
            # an all-null-weight bucket sums to NULL, not 0
            float(r["__w"])
            if weight_col and r["__w"] is not None
            else 0.0,
        )

    out_rows = []
    for g, buckets in sorted(by_group.items(), key=lambda kv: str(kv[0])):
        docs_total = sum(d for d, _ in buckets.values())
        w_total = sum(w for _, w in buckets.values())
        docs_kept, w_kept = 0, 0.0
        curve = []
        for i in range(n_points, -1, -1):  # suffix sums, high to low
            d, w = buckets.get(i, (0, 0.0))
            docs_kept += d
            w_kept += w
            t = float(lo) + float(i) * step
            row = [t, docs_kept, docs_kept / docs_total]
            if group_col:
                row.insert(0, g)
            if weight_col:
                row += [w_kept, w_kept / w_total if w_total else 0.0]
            curve.append(tuple(row))
        out_rows.extend(reversed(curve))

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    fields = []
    if group_col:
        fields.append(
            StructField(group_col, base.schema[group_col].dataType)
        )
    fields += [
        StructField("threshold", DoubleType()),
        StructField("docs_kept", LongType()),
        StructField("docs_frac", DoubleType()),
    ]
    if weight_col:
        fields += [
            StructField("weight_kept", DoubleType()),
            StructField("weight_frac", DoubleType()),
        ]
    return df.sparkSession.createDataFrame(out_rows, StructType(fields))
