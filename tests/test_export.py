"""operators/export.py: JSONL export + bloom-filtered parquet."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.export import (
    export_jsonl,
    write_bloom_filtered,
)


def test_jsonl_roundtrip_gzip_shards(spark, tmp_path):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
        (F.col("id") % 3).cast("int").alias("bucket"),
    )
    path = str(tmp_path / "out")
    export_jsonl(df, path, n_shards=4)
    files = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(files) == 4 and all(f.endswith(".gz") for f in files)
    back = spark.read.json(path)
    assert back.count() == 500
    assert sorted(back.columns) == ["bucket", "doc_id", "text"]
    got = {r.doc_id: r.text for r in back.collect()}
    assert got[123] == "text 123"


def test_jsonl_shard_membership_is_deterministic(spark, tmp_path):
    df = spark.range(200).select(F.col("id").alias("doc_id"))
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    export_jsonl(df, a, n_shards=3)
    export_jsonl(df.repartition(13), b, n_shards=3)

    def shards(path):
        out = {}
        for f in sorted(glob.glob(path + "/part-*")):
            rows = spark.read.json(f).collect()
            for r in rows:
                out[r.doc_id] = os.path.basename(f).split("-")[1]
        return out

    sa, sb = shards(a), shards(b)
    assert set(sa) == set(sb) == set(range(200))
    assert sa == sb  # same shard index regardless of input layout


def test_bloom_filters_exist_and_reads_are_identical(spark, tmp_path):
    df = spark.range(5000).select(
        F.col("id").alias("k"),
        F.xxhash64("id").alias("user_hash"),
        (F.col("id") % 7).alias("v"),
    )
    path = str(tmp_path / "t")
    write_bloom_filtered(df, path, ["user_hash"], ndv=10_000)

    from utc_cuip_kafka_aws_connector_spark.operators.export import (
        bloom_filter_offsets,
    )

    files = glob.glob(path + "/*.parquet")
    assert files
    offsets = [bloom_filter_offsets(spark, f) for f in files]
    assert any(o.get("user_hash", -1) >= 0 for o in offsets), offsets
    assert all(o.get("k", -1) == -1 for o in offsets)  # only requested cols

    probe = df.filter(F.col("k") == 4321).first().user_hash
    got = spark.read.parquet(path).filter(F.col("user_hash") == probe).collect()
    assert [r.k for r in got] == [4321]


def test_validation(spark, tmp_path):
    df = spark.range(1).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="n_shards"):
        export_jsonl(df, str(tmp_path / "x"), n_shards=0)
    with pytest.raises(ValueError, match="bloom_cols"):
        write_bloom_filtered(df, str(tmp_path / "y"), [])
