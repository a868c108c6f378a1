"""operators/ndcurve.py: N-dimensional Z-order.

Evidence: keys match a pure-Python Morton reference exactly on a
3-D grid (bijectively), degenerate to the 2-D module's keys at n=2,
the 3-column clustered profile beats arrival order on every
dimension, the write path yields per-file min/max tight enough to
prune 3-D boxes, and the key-width guard rejects overflowing
configs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.layout import zorder_key
from utc_cuip_kafka_aws_connector_spark.operators.ndcurve import (
    ndz_bucket_stats,
    ndz_key,
    write_ndclustered,
)


def _morton_py(vals: list[int], bits: int) -> int:
    out = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * len(vals) + j)
    return out


def test_matches_python_reference_and_bijective(spark):
    bits = 3
    rows = [
        (x * 64 + y * 8 + z, x, y, z)
        for x in range(8)
        for y in range(8)
        for z in range(8)
    ]
    df = spark.createDataFrame(rows, "rid long, x long, y long, z long")
    got = {
        (r.x, r.y, r.z): r.ndzkey
        for r in ndz_key(df, ["x", "y", "z"], bits=bits).collect()
    }
    keys = set()
    for (x, y, z), k in got.items():
        assert k == _morton_py([x, y, z], bits)
        keys.add(k)
    assert len(keys) == 512  # bijective over the full grid


def test_two_dims_degenerate_to_layout_module(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    a = {(r.x, r.y): r.ndzkey for r in ndz_key(df, ["x", "y"], bits=4).collect()}
    b = {(r.x, r.y): r.zkey for r in zorder_key(df, "x", "y", bits=4).collect()}
    assert a == b


def test_three_column_clustering_beats_arrival_order(spark):
    n = 4096
    df = spark.range(n).select(
        (F.col("id") * 37 % 64).alias("a"),
        (F.col("id") * 11 % 64).alias("b"),
        (F.col("id") * 53 % 64).alias("c"),
    )
    stats = ndz_bucket_stats(df, ["a", "b", "c"], bits=6, n_buckets=16).collect()
    vol = sum(
        (r.a_max - r.a_min + 1) * (r.b_max - r.b_min + 1) * (r.c_max - r.c_min + 1)
        for r in stats
    ) / len(stats)
    # arrival order: every 1/16 slice of `id` spans all three ranges
    assert vol < 64 * 64 * 64 / 4  # mean bucket box << full cube


def test_write_path_prunes_boxes(spark, tmp_path):
    path = str(tmp_path / "nd")
    df = spark.range(8192).select(
        (F.col("id") % 64).alias("a"),
        (F.floor(F.col("id") / 64) % 64).alias("b"),
        ((F.col("id") * 7) % 64).alias("c"),
    )
    write_ndclustered(df, path, ["a", "b", "c"], bits=6, n_files=16)
    back = spark.read.parquet(path)
    assert back.count() == 8192 and set(back.columns) == {"a", "b", "c"}
    # per-file footer stats: most files' boxes miss a small 3-D box
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    def overlaps(f):
        md = pq.ParquetFile(f).metadata
        lo, hi = {}, {}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for i in range(rg.num_columns):
                col = rg.column(i)
                st = col.statistics
                if st is None or not st.has_min_max:
                    return True  # no stats -> cannot prune
                name = col.path_in_schema
                lo[name] = min(lo.get(name, st.min), st.min)
                hi[name] = max(hi.get(name, st.max), st.max)
        return all(lo[k] <= 8 and hi[k] >= 0 for k in ("a", "b", "c"))

    touching = sum(1 for f in files if overlaps(f))
    assert touching < len(files) / 2  # the box a<=8,b<=8,c<=8 prunes most files


def test_key_width_guard(spark):
    df = spark.createDataFrame([(1, 2, 3)], "x long, y long, z long")
    with pytest.raises(ValueError, match="62"):
        ndz_key(df, ["x", "y", "z"], bits=21)
    with pytest.raises(ValueError, match=">= 2"):
        ndz_key(df, ["x"], bits=8)
