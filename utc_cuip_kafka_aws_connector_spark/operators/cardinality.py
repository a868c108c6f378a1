"""Mergeable distinct-count sketches: build once per shard, answer
any slice forever without rescanning.

``approx_count_distinct`` (q58) answers ONE distinct-count question
per scan. At 100 TB the recurring shape is different: "distinct users
per day — now per month — now for this source slice — now including
yesterday's new batch". This module materializes Apache DataSketches
HLL sketches (Spark's built-in ``hll_sketch_agg`` family, JVM-side,
map-side-combining) keyed by the finest grouping you will ever need,
as a tiny TABLE of (group keys, binary sketch). Every coarser answer
is then a UNION-MERGE of stored sketches — bytes, not data:

- rollup: daily sketches -> monthly/total distincts, no corpus scan;
- incremental: append the new day's sketch row, re-merge (the same
  append-only shape as operators/increddup.py's LSH index);
- slice algebra: any subset of sketch rows merges into a valid
  estimate (HLL union is lossless w.r.t. the sketch promise).

Relative error ~= 1.04 / sqrt(2^lg_k) (Flajolet et al. 2007's HLL
analysis as implemented by DataSketches): lg_k=12 -> ~1.6%, 4 KiB
per sketch. Intersection is NOT in the HLL promise (inclusion-
exclusion degrades); this module deliberately exposes union-shapes
only.

Everything stays in whole-stage codegen: sketch build and merge are
built-in JVM aggregates; only (groups x 4 KiB) rows ever shuffle.
tests/test_cardinality.py pins the error bound against exact
count-distinct, merge==direct equivalence, the rollup/incremental
loops, and the partial-agg plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SKETCH_COL = "hll_sketch"


def sketch_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """(keys..., n_rows, hll_sketch) — one HLL sketch of
    ``value_col``'s distinct values per key group. One map-side-
    combining aggregation; the output is the persistable sketch
    table (4 KiB/group at the default lg_k), the corpus never needs
    rescanning for any union-shaped distinct question over ``keys``."""
    if not 4 <= lg_k <= 21:
        raise ValueError(f"lg_k must be in [4, 21], got {lg_k}")
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("n_rows"),
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(SKETCH_COL),
    )


def merge_distinct(
    sketches: DataFrame,
    keys: list[str] | None = None,
    sketch_col: str = SKETCH_COL,
) -> DataFrame:
    """Roll stored sketches up to ``keys`` (None/[] = one global row):
    (keys..., n_rows, approx_distinct). Pure sketch-byte work —
    row count = number of stored groups, not corpus size."""
    aggs = [
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias("approx_distinct"),
    ]
    if keys:
        return sketches.groupBy(*keys).agg(*aggs)
    return sketches.agg(*aggs)


def estimate(sketch_col: Column | str = SKETCH_COL) -> Column:
    """Column expression: the estimate of one stored sketch row."""
    return F.hll_sketch_estimate(F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col)


def append_sketches(existing: DataFrame, fresh: DataFrame) -> DataFrame:
    """The incremental step: new batch's sketch rows appended to the
    store. Duplicate key groups are fine — ``merge_distinct`` unions
    them losslessly — so daily jobs just append, never read-modify-
    write (same contract as a txlog ``txn_append`` of the sketch
    table)."""
    return existing.unionByName(fresh)
