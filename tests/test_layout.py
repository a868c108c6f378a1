"""Z-order layout (operators/layout.py).

The oracle-parity test (q115) proves the key/bucket arithmetic
cross-engine; here: the interleave against a pure-Python Morton
mirror, the skipping-effectiveness claim (z-ordered buckets cover far
smaller rectangles than arrival-order buckets — the property that
makes the layout worth a shuffle at 100 TB), and the write path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.layout import (
    write_zordered,
    zorder_bucket_stats,
    zorder_key,
)


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_python_mirror(spark):
    # Grid spanning the full normalized range: min/max normalization
    # maps 0..15 onto 0..255 via floor(v * 255 / 15).
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.zkey for r in zorder_key(df, "x", "y", bits=8).collect()}
    for (x, y), z in got.items():
        xn = (x - 0) * 255 // 15
        yn = (y - 0) * 255 // 15
        assert z == _morton(xn, yn, 8), (x, y)


def test_degenerate_dimension_is_safe(spark):
    # A constant column (hi == lo) must not divide by zero; all rows
    # normalize to 0 on that axis.
    df = spark.createDataFrame([(i, 42) for i in range(8)], "x long, y long")
    got = {r.x: r.zkey for r in zorder_key(df, "x", "y", bits=4).collect()}
    assert got == {x: _morton((x * 15) // 7, 0, 4) for x in range(8)}


def test_bits_validation():
    with pytest.raises(ValueError):
        zorder_key(None, "x", "y", bits=0)
    with pytest.raises(ValueError):
        zorder_key(None, "x", "y", bits=40)


def test_zorder_buckets_localize_both_dims(spark):
    # 64x64 grid in arrival order (row-major: y varies fastest). An
    # arrival-order bucketing localizes x but spans ALL of y; z-order
    # bucketing must yield buckets whose average covered rectangle is
    # a small fraction of the domain on BOTH dimensions.
    n = 64
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    stats = zorder_bucket_stats(df, "x", "y", bits=6, n_buckets=16).collect()
    assert sum(r.n_rows for r in stats) == n * n
    # Every fixed-width z-range at 16 buckets of a 12-bit keyspace is
    # a 16x16 quadrant: extent 15 on each axis, 1/4 of the domain.
    for r in stats:
        assert r.x_max - r.x_min <= (n - 1) / 4, r
        assert r.y_max - r.y_min <= (n - 1) / 4, r
    # Arrival-order comparison: same row count per bucket, bucketed by
    # row index -> x localizes (extent ~3) but y spans the full domain.
    arrival = (
        df.withColumn("bucket", F.floor(F.col("x") / (n / 16)))
        .groupBy("bucket")
        .agg(F.min("y").alias("y_min"), F.max("y").alias("y_max"))
        .collect()
    )
    assert all(r.y_max - r.y_min == n - 1 for r in arrival)


def test_write_zordered_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(x, y, f"p{x}") for x in range(32) for y in range(32)],
        "x long, y long, payload string",
    )
    out = str(tmp_path / "zordered")
    write_zordered(df, out, "x", "y", bits=5)
    back = spark.read.parquet(out)
    assert back.count() == 32 * 32
    assert set(back.columns) == {"x", "y", "payload"}  # zkey dropped


def _hilbert_py(bits: int, x: int, y: int) -> int:
    """Independent per-bit reflect-and-swap mirror (validated in-test
    by the DEFINING curve properties, not trusted)."""
    d = 0
    for i in reversed(range(bits)):
        s = 1 << i
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
    return d


def test_hilbert_matches_python_mirror_and_is_a_hilbert_curve(spark):
    from utc_cuip_kafka_aws_connector_spark.operators.layout import hilbert_key

    n, bits = 32, 5  # min/max normalization is identity on 0..n-1
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.hkey for r in hilbert_key(df, "x", "y", bits=bits).collect()}
    assert got == {(x, y): _hilbert_py(bits, x, y) for x, y in rows}
    # Defining properties (these CHARACTERIZE a Hilbert-style curve,
    # so they validate the mirror itself, not just agreement):
    # bijective onto 0..n^2-1, and consecutive indices are always
    # grid-adjacent (unit steps) -- the locality z-order lacks.
    by_d = {d: xy for xy, d in got.items()}
    assert sorted(by_d) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_d[d], by_d[d + 1])


def test_hilbert_buckets_tile_tighter_than_arrival_order(spark):
    from utc_cuip_kafka_aws_connector_spark.operators.layout import (
        hilbert_bucket_stats,
    )

    n = 64
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    stats = hilbert_bucket_stats(df, "x", "y", bits=6, n_buckets=16).collect()
    assert sum(r.n_rows for r in stats) == n * n
    # 16 equal key ranges of a Hilbert curve over a 64x64 grid are
    # 16x16 quadrants (unit-step curves fill each quadrant before
    # leaving it): extent <= 15 on BOTH axes, vs 63 on y for an
    # arrival-order split.
    for r in stats:
        assert r.x_max - r.x_min <= 15, r
        assert r.y_max - r.y_min <= 15, r


def test_write_clustered_rejects_unknown_curve(spark, tmp_path):
    from utc_cuip_kafka_aws_connector_spark.operators.layout import write_clustered

    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="curve must be"):
        write_clustered(df, str(tmp_path / "o"), "x", "y", curve="peano")
