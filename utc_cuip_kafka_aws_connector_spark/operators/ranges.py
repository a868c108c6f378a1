"""Interval (range) join: left row l matches right rows r with
``r.ts in (l.ts + lo, l.ts + hi]`` on the same key.

Spark plans a raw inequality join as a broadcast-nested-loop --
O(|L|*|R|) comparisons, a non-starter at scale. This operator
bucketizes time so the join becomes an *equi*-join:

    bucket(r) = floor(epoch_ms(r.ts) / width)      (one bucket per right row)
    left explodes to the <=2-3 buckets its window can overlap
    equi-join on (key, bucket) -> exact predicate re-check

With width = hi - lo each left row lands in at most
ceil(window/width)+1 = 2-3 buckets, so the join input grows by a
small constant while Catalyst gets a shuffled hash/sort-merge join it
can parallelize and AQE can skew-split. The exact re-check runs on
the original timestamp columns at full precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lo_ms: int,
    hi_ms: int,
) -> DataFrame:
    """Inner join of (left row, right row) pairs with
    ``left.left_ts + lo_ms < right.right_ts <= left.left_ts + hi_ms``.

    Column names must be disjoint across the two sides except ``key``
    (pre-select/rename before calling).

    Inner-only by design: the exact-predicate re-check after the
    bucketized equi-join would drop null-extended rows of an outer
    join, and the exploded left side would duplicate unmatched left
    rows. A left-outer variant needs a unique left-row id (tag ->
    inner interval_join -> anti-join the tagged left against matched
    ids -> unionByName with nulls); compose it from this operator
    rather than passing a join mode through.
    """
    assert hi_ms > lo_ms, "empty interval"
    width = hi_ms - lo_ms

    r = right.withColumn(_BUCKET, F.floor(F.unix_millis(F.col(right_ts)) / width))
    lms = F.unix_millis(F.col(left_ts))
    l = left.withColumn(
        _BUCKET,
        F.explode(F.sequence(F.floor((lms + lo_ms) / width), F.floor((lms + hi_ms) / width))),
    )
    exact = (F.col(right_ts) > F.col(left_ts) + F.expr(f"INTERVAL {lo_ms} MILLISECONDS")) & (
        F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {hi_ms} MILLISECONDS")
    )
    return l.join(r, on=[key, _BUCKET], how="inner").filter(exact).drop(_BUCKET)
