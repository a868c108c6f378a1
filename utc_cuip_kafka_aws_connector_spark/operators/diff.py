"""Snapshot diff: classify rows as added / removed / changed /
unchanged between two keyed snapshots (SCD-style change detection,
lake-table reconciliation, CDC backfill validation).

Scale: one full-outer equi-join on the key columns -- hash-partitioned
both sides, AQE-skew-splittable, no driver state. The null-safe
column comparison happens in the join's projection (whole-stage
codegen), so the diff costs exactly one shuffle per side.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Returns key columns + ``change_type`` + old_*/new_* values for
    every compared column. ``changed`` uses null-safe inequality, so a
    value appearing or disappearing (NULL <-> non-NULL) counts as a
    change, exactly like ``IS DISTINCT FROM``. An empty
    ``compare_cols`` is a key-only membership diff: rows classify as
    added / removed / unchanged, never changed."""
    o = old.select(
        *[F.col(k) for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k) for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, key_cols, "full_outer")
    any_diff = reduce(
        lambda a, b: a | b,
        [~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")) for c in compare_cols],
        F.lit(False),
    )
    change = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(any_diff, "changed")
        .otherwise("unchanged")
    )
    out = joined.withColumn("change_type", change).drop("__in_old", "__in_new")
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out.select(
        *key_cols,
        "change_type",
        *[c for pair in ((f"old_{c}", f"new_{c}") for c in compare_cols) for c in pair],
    )
