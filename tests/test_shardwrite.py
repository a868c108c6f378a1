"""operators/shardwrite.py: shard materialization + manifest.

Evidence: the written layout is shard-partitioned and lossless, the
manifest digests are partitioning-order-independent, verification
passes on a clean directory and catches a corrupted shard, and the
whole path runs end-to-end from the real encoder output.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.bpetrain import bpe_train_merges
from utc_cuip_kafka_aws_connector_spark.operators.encode import (
    bpe_encode,
    bpe_vocab,
    corpus_chars,
)
from utc_cuip_kafka_aws_connector_spark.operators.shardwrite import (
    shard_manifest,
    verify_shards,
    write_shards,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def encoded(spark):
    """Real pipeline input: fixture docs through the actual trainer
    and encoder, sharded by a simple token-budget walk stand-in."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    merges = bpe_train_merges(docs, n_merges=12)
    vocab = bpe_vocab(merges, corpus_chars(docs))
    return (
        bpe_encode(docs, merges, vocab)
        .withColumn("shard", (F.col("doc_id") % 7).cast("int"))
        .cache()
    )


def test_write_is_lossless_and_shard_partitioned(spark, encoded, tmp_path):
    path = str(tmp_path / "shards")
    manifest = write_shards(encoded, path).collect()
    assert [r.shard for r in manifest] == list(range(7))
    assert sum(r.n_docs for r in manifest) == encoded.count()
    back = spark.read.parquet(path)
    assert back.count() == encoded.count()
    a = sorted((r.doc_id, tuple(r.token_ids)) for r in back.collect())
    b = sorted((r.doc_id, tuple(r.token_ids)) for r in encoded.collect())
    assert a == b
    # hive layout: one directory per shard
    import os

    assert sorted(
        d for d in os.listdir(path) if d.startswith("shard=")
    ) == [f"shard={i}" for i in range(7)]


def test_manifest_digest_is_order_independent(encoded):
    a = {r.shard: r.digest for r in shard_manifest(encoded).collect()}
    b = {
        r.shard: r.digest
        for r in shard_manifest(encoded.repartition(13)).collect()
    }
    assert a == b


def test_verify_passes_clean_and_catches_corruption(spark, encoded, tmp_path):
    path = str(tmp_path / "shards_v")
    write_shards(encoded, path)
    assert verify_shards(spark, path).count() == 0
    # corrupt one shard: drop a row from its parquet
    import os

    part_dir = os.path.join(path, "shard=3")
    part = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    damaged = spark.read.parquet(os.path.join(part_dir, part[0]))
    keep = damaged.limit(damaged.count() - 1)
    keep_pd = keep.toPandas()
    for f in part:
        os.remove(os.path.join(part_dir, f))
    spark.createDataFrame(keep_pd).write.mode("append").parquet(part_dir)
    bad = verify_shards(spark, path).collect()
    assert [r.shard for r in bad] == [3]
