"""Curation runs through the transactional table: each daily batch's
ACCEPTED docs land as one atomic txlog commit, so the curated corpus
gets snapshot isolation, time travel, an exact change feed, and
idempotent replay — the operational story a 100 TB corpus build
needs around the round-8 curation operators (increddup + nbquality),
composed purely from existing modules (no txlog edits; its q92/q93
gate fingerprints are untouched).
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.increddup import (
    build_lsh_index,
    incremental_near_dups,
)
from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
    commit,
    read_changes,
    read_snapshot,
    table_history,
)


def _doc(seed: int, n: int = 30) -> str:
    rng = random.Random(seed)
    return " ".join(f"w{rng.randrange(200)}" for _ in range(n))


def _accepted(spark, batch, index):
    verdict = incremental_near_dups(batch, index, 0.5)
    return batch.join(
        verdict.filter(~F.col("is_dup")).select(F.col("doc").alias("doc_id")),
        "doc_id",
        "left_semi",
    )


def _commit_batch(spark, table, df, txn_id, attempt=0):
    # each ATTEMPT stages to its own directory: committed files are
    # immutable, a retry's freshly staged files become orphans when
    # the txn_id dedupe returns the prior version (vacuum reclaims)
    staging = os.path.join(table, f"_staged_{txn_id}_{attempt}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    files = [
        os.path.join(staging, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet")
    ]
    return commit(table, files, txn_id=txn_id)


def test_curation_batches_are_atomic_versions(spark, tmp_path):
    table = str(tmp_path / "corpus")
    os.makedirs(table)
    day1 = spark.createDataFrame(
        [(i, _doc(i)) for i in range(8)], "doc_id long, text string"
    )
    v1 = _commit_batch(spark, table, day1, "day1")
    # day 2: 3 fresh docs + 2 near-copies of committed corpus docs
    index = build_lsh_index(read_snapshot(spark, table))
    day2 = spark.createDataFrame(
        [(100 + i, _doc(50 + i)) for i in range(3)]
        + [(200, _doc(1)), (201, _doc(4))],
        "doc_id long, text string",
    )
    acc = _accepted(spark, day2, index)
    v2 = _commit_batch(spark, table, acc, "day2")
    assert v2 == v1 + 1
    # the dedup rejected the copies before commit
    now = {r.doc_id for r in read_snapshot(spark, table).collect()}
    assert now == set(range(8)) | {100, 101, 102}
    # time travel: day-1 snapshot unchanged by day 2
    then = {r.doc_id for r in read_snapshot(spark, table, version=v1).collect()}
    assert then == set(range(8))
    # change feed: exactly the accepted day-2 docs as inserts
    feed = read_changes(spark, table, from_version=v2).collect()
    assert {(r.doc_id, r._change_type) for r in feed} == {
        (100, "insert"), (101, "insert"), (102, "insert")
    }


def test_replayed_curation_commit_is_idempotent(spark, tmp_path):
    table = str(tmp_path / "corpus2")
    os.makedirs(table)
    batch = spark.createDataFrame(
        [(i, _doc(i)) for i in range(5)], "doc_id long, text string"
    )
    v = _commit_batch(spark, table, batch, "job-42")
    # a retried job re-commits with the same txn id -> same version,
    # no duplicate rows (the at-least-once scheduler case)
    v_again = _commit_batch(spark, table, batch, "job-42", attempt=1)
    assert v_again == v
    assert read_snapshot(spark, table).count() == 5
    assert len(table_history(table)) == 1
