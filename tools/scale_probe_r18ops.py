"""sf1-equivalent scale probe for the r18 operators (the
scale_probe_sf1 / scale_probe_r16ops / scale_probe_r17ops recipe: no
sf1 fixture exists, so corpora are synthesized at sf1's scale at the
shape the operator actually consumes).

Probes (each timed to a materialized count / completed write,
best-of-2 warm):
  trainset/packed   packed_training_shards over 500k docs x 2.0-avg
                    epochs (~1M replica rows, ~16-token docs, 512
                    window) into tmp shards + verify — the full
                    capstone path (epochs explode, seeded permute,
                    pack assignment, JVM window aggregation, write,
                    manifest, verify)
  trainset/padded   padded_training_shards over the same corpus
                    (batch 64, shard_hex=1) + verify
  q128/gate         the registered q128 builder at sf0.1 (the cell
                    kernel + norm-precompute join it pins)
  negatives/prod    hard_negatives at a PRODUCTION setting: 100k
                    corpus x 1k anchors, dim 64, 64 cells, nprobe 4
                    (the approximate trade, not the gate's
                    exhaustive oracle setting). A per-pair Arrow
                    einsum kernel was measured here and LOST to the
                    fold (1.4x at dim 64, 2x at dim 768) — removed.
  negatives/gemm    the same setting through hard_negatives_gemm
                    (one GEMM per cell, vectors ship once per cell)
                    — the production kernel: 2.9x at dim 64, 7.9x
                    at dim 768 over the fold.

Prints one line per probe; paste the table into BENCH_NOTES.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.session import get_spark


def timed(label, fn, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:<20s} {best:7.2f}s  (rows={n})", flush=True)


def main():
    from utc_cuip_kafka_aws_connector_spark.operators.negatives import (
        hard_negatives,
        hard_negatives_gemm,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.shardwrite import (
        verify_shards,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.trainset import (
        packed_training_shards,
        padded_training_shards,
    )
    from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG

    spark = get_spark()
    work = tempfile.mkdtemp(prefix="probe_r18_")

    corpus = (
        spark.range(500_000)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
            F.sequence(
                F.lit(0), (F.pmod(F.xxhash64("id"), 24) + 8).cast("int")
            ).cast("array<int>").alias("token_ids"),
        )
        .persist()
    )
    corpus.count()
    alloc = spark.createDataFrame(
        [("en", 2.4), ("de", 1.6)], "lang string, epochs double"
    )

    def packed():
        path = os.path.join(work, "packed")
        packed_training_shards(
            corpus, alloc, path, context_len=512, pad_id=0, eos_id=1,
            shuffle_seed=7, hex_chars=2,
        )
        bad = verify_shards(spark, path, "seq_id", "input_ids", "shard")
        assert bad.count() == 0
        return spark.read.parquet(path).count()

    timed("trainset/packed", packed)

    def padded():
        path = os.path.join(work, "padded")
        padded_training_shards(
            corpus, alloc, path, batch_size=64, shard_hex=1,
            shuffle_seed=7,
        )
        bad = verify_shards(
            spark, path, "example_id", "token_ids", "train_shard"
        )
        assert bad.count() == 0
        return spark.read.parquet(path).count()

    timed("trainset/padded", padded)

    q128 = CATALOG["q128_hard_negatives"].builder
    timed("q128/gate", lambda: q128(spark, "/root/testdata/sf0.1").count())

    emb = (
        spark.range(100_000)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                # +i inside: id=0 must not be the zero vector (cosine
                # of a zero vector is undefined — ANN-stack contract)
                lambda i: F.sin(F.col("id") * i + i).cast("double"),
            ).alias("embedding"),
            F.pmod(F.col("id"), 50).alias("label"),
        )
        .persist()
    )
    emb.count()

    def prod_negatives():
        return hard_negatives(
            emb,
            k=5,
            anchors=emb.filter(F.col("vec_id") % 100 == 0),
            label_col="label",
            method="ivf",
            n_centroids=64,
            nprobe=4,
        ).count()

    timed("negatives/prod", prod_negatives)

    def gemm_negatives():
        return hard_negatives_gemm(
            emb,
            k=5,
            anchors=emb.filter(F.col("vec_id") % 100 == 0),
            label_col="label",
            n_centroids=64,
            nprobe=4,
        ).count()

    timed("negatives/gemm", gemm_negatives)

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
