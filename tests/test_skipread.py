"""operators/skipread.py: the skipping-driven clustered read.

Correctness (rows identical to a full filtered scan) is pinned by the
q117 gate entry / oracle-parity suite; THIS file pins the parts SQL
cannot see — that pruning actually skips files, reads only surviving
ones, and stays conservative when footer stats are missing."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.skipread import (
    file_stats,
    select_files,
    skipping_read,
    write_clustered_files,
)

SCRATCH = "/tmp/spark_graft_io/test_skipread"
BOX = {"o_custkey": (10, 59), "o_day": (9862, 10226)}


def _dims(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("o_day"),
        "o_totalprice",
    )


@pytest.fixture(scope="module", params=["z", "hilbert"])
def clustered(request, spark, sf_dir):
    path = f"{SCRATCH}/{request.param}"
    shutil.rmtree(path, ignore_errors=True)
    write_clustered_files(
        _dims(spark, sf_dir), path, "o_custkey", "o_day", bits=8,
        curve=request.param, n_files=16,
    )
    return path


def test_rows_identical_to_full_scan(spark, sf_dir, clustered):
    got = sorted(
        skipping_read(spark, clustered, BOX).collect(),
        key=lambda r: r.o_orderkey,
    )
    want = sorted(
        _dims(spark, sf_dir)
        .filter(
            F.col("o_custkey").between(*BOX["o_custkey"])
            & F.col("o_day").between(*BOX["o_day"])
        )
        .collect(),
        key=lambda r: r.o_orderkey,
    )
    assert len(got) > 0  # non-vacuous box at every SF
    assert got == want


def test_pruning_skips_most_files(spark, clustered):
    """THE benefit: a small box over a curve-clustered layout must
    prune the majority of files before any data I/O."""
    selected, total = select_files(spark, clustered, BOX)
    assert total == 16
    assert 0 < len(selected) <= total // 2


def test_result_reads_only_selected_files(spark, clustered):
    selected, _ = select_files(spark, clustered, BOX)
    read_files = {
        os.path.realpath(r.f.removeprefix("file:"))
        for r in skipping_read(spark, clustered, BOX)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert read_files <= {os.path.realpath(p) for p in selected}


def test_empty_box_returns_empty_with_schema(spark, clustered):
    out = skipping_read(spark, clustered, {"o_custkey": (10**9, 2 * 10**9)})
    assert out.columns == ["o_orderkey", "o_custkey", "o_day", "o_totalprice"]
    assert out.count() == 0


def test_file_stats_cover_every_file_and_bound_rows(spark, clustered):
    stats = file_stats(spark, clustered, ["o_custkey", "o_day"]).collect()
    assert len(stats) == 16
    for r in stats:
        assert r.n_rows > 0
        assert r.o_custkey_min <= r.o_custkey_max
        assert r.o_day_min <= r.o_day_max


def test_missing_stats_are_conservative(spark, tmp_path):
    """A file written WITHOUT footer statistics must never be pruned:
    null stats mean 'cannot skip', not 'cannot match'."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "nostats")
    os.makedirs(path)
    t = pa.table({"o_custkey": [5, 500], "o_day": [9000, 12000]})
    pq.write_table(t, f"{path}/part-0.parquet", write_statistics=False)
    pq.write_table(
        pa.table({"o_custkey": [10_000], "o_day": [9_900]}),
        f"{path}/part-1.parquet",
    )
    stats = {r.path: r for r in file_stats(spark, path, ["o_custkey", "o_day"]).collect()}
    assert stats[f"{path}/part-0.parquet"].o_custkey_min is None
    box = {"o_custkey": (0, 100), "o_day": (9862, 10226)}
    selected, total = select_files(spark, path, box)
    assert total == 2
    # stats-less file kept; the stats-bearing file (custkey 10k) pruned
    assert selected == [f"{path}/part-0.parquet"]
    # and the residual filter still makes the ANSWER exact: the kept
    # file's rows are filtered row-wise
    assert skipping_read(spark, path, box).count() == 0


def test_stats_merge_across_row_groups(spark, tmp_path):
    """Per-file min/max is the union over ALL row groups — a file
    whose groups straddle the box must survive pruning."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "rg")
    os.makedirs(path)
    t = pa.table({"o_custkey": [1, 2, 900, 901], "o_day": [9900] * 4})
    pq.write_table(t, f"{path}/part-0.parquet", row_group_size=2)
    r = file_stats(spark, path, ["o_custkey", "o_day"]).collect()[0]
    assert (r.o_custkey_min, r.o_custkey_max) == (1, 901)
    sel, _ = select_files(spark, path, {"o_custkey": (850, 950)})
    assert sel == [f"{path}/part-0.parquet"]
