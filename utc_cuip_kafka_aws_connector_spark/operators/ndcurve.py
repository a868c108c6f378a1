"""N-dimensional Z-order keys — multi-column clustering beyond the
2-D layouts of operators/layout.py.

Production OPTIMIZE ZORDER takes an arbitrary column list (Delta's
does, and txlog's txn_optimize already z-orders on N columns for its
own rewrite); the 2-D module exists for the hash-exact oracle pair
q115/q116, and this module generalizes the KEY to any dimension
count so ad-hoc tables can cluster on 3+ predicates. Same design
rules as the 2-D path, with the same documented exactness envelope:

- per-column min/max normalization to [0, 2^bits) longs in one
  broadcast 1-row range frame (the (v-lo)*top product runs in
  double: exact below 2^53, adjacent-cell wobble above — see
  layout.zorder_key's docstring for the full argument);
- bit-interleave round-robin across the N columns, pure
  shiftleft/shiftright/bitwiseAND expressions — whole-stage
  codegen, no Python;
- n*bits must fit a signed long (<= 62), enforced;
- ``write_ndclustered`` range-partitions on the key so files track
  data volume, files carry tight per-column min/max footers for ALL
  n columns, and the key itself is dropped from the output (layout
  is physical, not schema).

Reference basis: textbook Morton codes (public), Delta's OPTIMIZE
ZORDER surface; the reference repo writes flat CSV with no layout
(df_manager.py:82-84). SURVEY §2.D.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalized_nd(df: DataFrame, cols: list[str], bits: int):
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    if len(cols) < 2:
        raise ValueError(f"need >= 2 columns, got {cols}")
    if len(cols) * bits > 62:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits = {len(cols) * bits} key bits "
            "> 62 (does not fit a signed long); lower bits"
        )
    top = (1 << bits) - 1
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_{c}_lo"), F.max(c).alias(f"_{c}_hi")]
    rng = df.select(*aggs)
    with_rng = df.crossJoin(F.broadcast(rng))
    norms = [
        F.floor(
            (F.col(c) - F.col(f"_{c}_lo")).cast("double")
            * top
            / F.greatest(F.col(f"_{c}_hi") - F.col(f"_{c}_lo"), F.lit(1))
        ).cast("long")
        for c in cols
    ]
    drop = [f"_{c}_{side}" for c in cols for side in ("lo", "hi")]
    return with_rng, norms, drop


def _interleave_nd(norms: list[Column], bits: int) -> Column:
    parts = []
    n = len(norms)
    for i in range(bits):
        for j, col in enumerate(norms):
            parts.append(
                F.shiftleft(
                    F.shiftright(col, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return reduce(lambda a, c: a.bitwiseOR(c), parts)


def ndz_key(
    df: DataFrame, cols: list[str], bits: int = 8, key_col: str = "ndzkey"
) -> DataFrame:
    """Append the N-dimensional Morton code of ``cols`` (each
    normalized to [0, 2^bits) against its own min/max). Columns must
    be integral — cast dates to epoch days first."""
    with_rng, norms, drop = _normalized_nd(df, cols, bits)
    return with_rng.withColumn(key_col, _interleave_nd(norms, bits)).drop(*drop)


def ndz_bucket_stats(
    df: DataFrame, cols: list[str], bits: int = 8, n_buckets: int = 16
) -> DataFrame:
    """Per fixed-width key-range bucket: row count and min/max of
    EVERY clustering column — the footer-stats profile an N-d
    clustered write gives each file."""
    keyed = ndz_key(df, cols, bits)
    keyspace = 1 << (len(cols) * bits)
    width = -(-keyspace // n_buckets)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (
        keyed.withColumn("bucket", F.expr(f"ndzkey div {width}"))
        .groupBy("bucket")
        .agg(*aggs)
    )


def write_ndclustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 32,
    stats_manifest: bool = False,
) -> None:
    """Write ``df`` physically clustered on the N-d curve:
    range-partition by key (files track data volume), sort within
    partitions, drop the key. Every file's parquet footer then
    carries tight min/max for ALL ``cols``. ``stats_manifest=True``
    persists those stats as a skip manifest at write time
    (operators/tableread.py) so steady-state ``box_read``s never
    re-open footers."""
    keyed = ndz_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "ndzkey")
        .sortWithinPartitions("ndzkey")
        .drop("ndzkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    if stats_manifest:
        from utc_cuip_kafka_aws_connector_spark.operators.tableread import (
            write_stats_manifest,
        )

        write_stats_manifest(df.sparkSession, path, list(cols))
