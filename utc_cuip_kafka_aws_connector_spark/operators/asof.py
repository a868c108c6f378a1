"""As-of join: for each left row, the latest right value at-or-before
the left timestamp, per key.

Spark has no native ASOF JOIN. The naive rewrite (inequality join +
row_number) explodes to O(|L| * |R|/keys) intermediate rows. This
implementation uses the *union trick* instead, which is the scalable
formulation: one shuffle, no join blow-up, linear state.

    union(left tagged 1, right tagged 0)
    -> window per key ordered by (ts, tag)
    -> last(right_value, ignorenulls=True) over rows unbounded..current
    -> keep left rows

Right rows sort before left rows at equal timestamps (tag 0 < 1), so
semantics are inclusive: right.ts <= left.ts. At 100 TB this is a
single hash-partitioned sort per key -- the same cost profile as any
windowed aggregate, and AQE handles key skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_TAG = "__asof_tag"
_VAL = "__asof_val"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    value_alias: str,
) -> DataFrame:
    """Attach ``value_alias`` = latest ``right.value_col`` with
    ``right.right_ts <= left.left_ts``, matched on ``key``.

    Left columns are preserved; rows with no prior right row get NULL.
    """
    l = left.withColumn(_TAG, F.lit(1)).withColumn(_VAL, F.lit(None).cast(right.schema[value_col].dataType))
    r = (
        right.select(
            F.col(key),
            F.col(right_ts).alias(left_ts),
            F.lit(0).alias(_TAG),
            F.col(value_col).alias(_VAL),
        )
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy(key)
        .orderBy(F.col(left_ts), F.col(_TAG))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        unioned.withColumn(value_alias, F.last(_VAL, ignorenulls=True).over(w))
        .filter(F.col(_TAG) == 1)
        .drop(_TAG, _VAL)
    )
