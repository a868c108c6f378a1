"""Z-order (Morton curve) multi-dimensional data layout.

Single-column sort layouts give parquet min/max file statistics that
prune scans on ONE predicate column and nothing else. Interleaving
the bits of several columns onto a space-filling curve and
range-partitioning on the curve key gives every file a small
HYPER-RECTANGLE of the key space, so min/max skipping works for box
predicates on ANY of the interleaved dimensions — the standard
100 TB layout lever (Delta/Iceberg expose it as OPTIMIZE ZORDER; the
curve math is textbook Morton encoding). The reference has no layout
story at all (its sink is a flat to_csv, df_manager.py:82-84); this
is what its users would need the moment one table stops fitting a
single scan.

Determinism contract: dimension normalization is integer arithmetic
((v - lo) * (2^bits - 1)) div max(hi - lo, 1) over data min/max, and
the interleave is a fixed sum of shifted bit extractions — every op
integer, so curve keys (and anything derived: bucket ids, per-bucket
extents) are bit-identical cross-engine and oracle-checkable in
plain SQL with the same ``& << >> div`` expressions.

Scale shape: pass 1 computes the per-dimension min/max (a scalar
aggregate, broadcast back as literals via crossJoin of a 1-row
frame); pass 2 is scan-local projection (the curve key is pure
expression work) followed by repartitionByRange(z) +
sortWithinPartitions(z) at write time — one range shuffle, which any
re-layout necessarily pays. Bucket ids here use FIXED-WIDTH key
ranges (z div (keyspace / n_buckets)) rather than rank-based ntile,
so bucketing is embarrassingly parallel and reproducible under any
partitioning; range partitioning at write time balances actual row
counts independently.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave2(xn: Column, yn: Column, bits: int) -> Column:
    """Morton-interleave two ``bits``-wide non-negative ints: bit i of
    x lands at position 2i, bit i of y at 2i+1."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(xn, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(yn, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, c: a.bitwiseOR(c), parts)


def zorder_key(
    df: DataFrame, x_col: str, y_col: str, bits: int = 8
) -> DataFrame:
    """Append ``zkey`` — the Morton code of (x_col, y_col), each
    normalized to [0, 2^bits) against its own data min/max. Input
    columns must be integral (cast dates to epoch days first).

    Exactness envelope: the normalization is floor((v - lo) * top /
    range); the product is exact in IEEE double while
    (hi - lo) * (2^bits - 1) < 2^53 (any range < 2^45 at bits=8),
    which covers every fixture table by ~9 orders of magnitude and
    keeps the keys oracle-exact. Wider-than-2^45 id spaces still
    lay out correctly — only values within one double-ulp of a cell
    boundary could land one cell over, which moves a row between
    ADJACENT curve cells and never breaks the layout contract."""
    with_rng, xn, yn = _normalized(df, x_col, y_col, bits)
    return with_rng.withColumn("zkey", _interleave2(xn, yn, bits)).drop(
        "_xlo", "_xhi", "_ylo", "_yhi"
    )


def _normalized(df: DataFrame, x_col: str, y_col: str, bits: int):
    """Shared two-pass min/max normalization: returns (df with the
    1-row range broadcast in, xn, yn) with both dimensions mapped to
    [0, 2^bits) as longs."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    top = (1 << bits) - 1
    rng = df.select(
        F.min(x_col).alias("_xlo"),
        F.max(x_col).alias("_xhi"),
        F.min(y_col).alias("_ylo"),
        F.max(y_col).alias("_yhi"),
    )
    with_rng = df.crossJoin(F.broadcast(rng))
    # The (v - lo) * top product is computed in DOUBLE, not long:
    # long arithmetic would silently WRAP for dimension ranges
    # >= ~2^55 (epoch-nanos over decades), scrambling the layout with
    # no error. Double multiply is exact below 2^53 (identical to
    # integer math there, keeping the oracle bit-exact) and degrades
    # to the documented adjacent-cell wobble above it.
    xn = F.floor(
        (F.col(x_col) - F.col("_xlo")).cast("double")
        * top
        / F.greatest(F.col("_xhi") - F.col("_xlo"), F.lit(1))
    ).cast("long")
    yn = F.floor(
        (F.col(y_col) - F.col("_ylo")).cast("double")
        * top
        / F.greatest(F.col("_yhi") - F.col("_ylo"), F.lit(1))
    ).cast("long")
    return with_rng, xn, yn


def _hilbert_d(xn, yn, bits: int):
    """Hilbert-curve index of normalized cell (xn, yn) — the classic
    per-bit reflect-and-swap walk (public algorithm; see e.g. the
    Hilbert curve literature's xy2d), expressed as ONE F.aggregate
    fold over bit positions MSB->LSB with the (x, y, d) state in the
    accumulator struct. The fold keeps the expression tree LINEAR in
    ``bits``; unrolling via chained when/otherwise would re-inline x
    and y at every level (CollapseProject) and blow up 4^bits."""
    init = F.struct(
        xn.alias("x"), yn.alias("y"), F.lit(0).cast("long").alias("d")
    )

    def step(acc, s):
        x, y, d = acc["x"], acc["y"], acc["d"]
        rx = F.when(x.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        # quadrant digit (3*rx) XOR ry in {0,1,2,3}
        digit = (rx * 3).bitwiseXOR(ry).cast("long")
        nd = d + s * s * digit
        # rot: if ry==0 { if rx==1 reflect both; swap x,y }
        fx = F.when(rx == 1, s - 1 - x).otherwise(x)
        fy = F.when(rx == 1, s - 1 - y).otherwise(y)
        nx = F.when(ry == 0, fy).otherwise(x)
        ny = F.when(ry == 0, fx).otherwise(y)
        return F.struct(nx.alias("x"), ny.alias("y"), nd.alias("d"))

    # block sizes s = 2^(bits-1) .. 1 as a literal array: the fold's
    # lambda gets s as a long Column directly (pyspark's shiftleft
    # only takes a Python-int shift amount, so s cannot be derived
    # from a sequence() element inside the lambda)
    sizes = F.array(*[F.lit(1 << i).cast("long") for i in reversed(range(bits))])
    return F.aggregate(sizes, init, step)["d"]


def hilbert_key(
    df: DataFrame, x_col: str, y_col: str, bits: int = 8
) -> DataFrame:
    """Append ``hkey`` — the Hilbert-curve index of (x_col, y_col),
    normalized exactly like ``zorder_key``. Hilbert beats Morton on
    locality (every consecutive pair of curve cells is grid-adjacent,
    so fixed-width key ranges cover tighter rectangles — the reason
    production table formats offer it for multi-dim clustering), at
    the cost of the reflect-and-swap walk instead of one interleave.
    Same integer-exactness contract as the z path: normalization is
    shared, and the walk is pure integer arithmetic — oracle-exact."""
    with_rng, xn, yn = _normalized(df, x_col, y_col, bits)
    return with_rng.withColumn("hkey", _hilbert_d(xn, yn, bits)).drop(
        "_xlo", "_xhi", "_ylo", "_yhi"
    )


def zorder_bucket_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    n_buckets: int = 16,
) -> DataFrame:
    """Per-bucket layout statistics under fixed-width z-key ranges:
    (bucket, n_rows, min/max of each dimension) — the min/max rows a
    parquet footer would carry per file after a z-ordered write, i.e.
    the skipping-effectiveness profile of the layout. Bucket width is
    ceil(2^(2*bits) / n_buckets) so ids are reproducible without a
    rank pass."""
    keyed = zorder_key(df, x_col, y_col, bits)
    return _bucket_stats(keyed, "zkey", x_col, y_col, bits, n_buckets)


def hilbert_bucket_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    n_buckets: int = 16,
) -> DataFrame:
    """``zorder_bucket_stats`` over the Hilbert curve instead of the
    Morton curve — same output contract, tighter per-bucket
    rectangles (Hilbert's unit-step locality)."""
    keyed = hilbert_key(df, x_col, y_col, bits)
    return _bucket_stats(keyed, "hkey", x_col, y_col, bits, n_buckets)


def _bucket_stats(
    keyed: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    bits: int,
    n_buckets: int,
) -> DataFrame:
    keyspace = 1 << (2 * bits)
    width = -(-keyspace // n_buckets)
    return (
        # SQL integer `div`, not double-division+floor: at bits >= 27
        # the keyspace exceeds 2^53 and double(key)/width can round
        # across a bucket boundary (same reasoning as setjoin.py's
        # prefix length) — the docstring's "z div width" is now the
        # literal implementation.
        keyed.withColumn("bucket", F.expr(f"{key_col} div {width}"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(x_col).alias("x_min"),
            F.max(x_col).alias("x_max"),
            F.min(y_col).alias("y_min"),
            F.max(y_col).alias("y_max"),
        )
    )


# NOTE (r9): tableread.write_clustered_manifested wraps this writer
# to persist a skip manifest at write time. The option is NOT folded
# into this signature yet because q117's builder docstring names
# operators.layout, so any AST change here drifts its out-of-window
# fingerprint; fold it in at r10 when q117 re-enters the gate window
# (comments are AST-invisible, so this note is safe).
def write_clustered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 8,
    curve: str = "z",
    **options,
) -> None:
    """Materialize ``df`` curve-clustered on (x_col, y_col): one range
    shuffle on the curve key, sorted within partitions so row-group
    min/max stats are tight on BOTH dimensions. ``curve`` is "z"
    (Morton) or "hilbert" (tighter rectangles, costlier key)."""
    if curve == "z":
        keyed, key = zorder_key(df, x_col, y_col, bits), "zkey"
    elif curve == "hilbert":
        keyed, key = hilbert_key(df, x_col, y_col, bits), "hkey"
    else:
        raise ValueError(f"curve must be 'z' or 'hilbert', got {curve!r}")
    (
        keyed.repartitionByRange(key)
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode("overwrite")
        .options(**options)
        .parquet(path)
    )


def write_zordered(
    df: DataFrame, path: str, x_col: str, y_col: str, bits: int = 8, **options
) -> None:
    """``write_clustered`` with the Morton curve (kept as the named
    entry point the tests and docs reference)."""
    write_clustered(df, path, x_col, y_col, bits=bits, curve="z", **options)
