"""Transaction-log sink: atomicity, idempotent replay, snapshot
isolation, time travel, and the version-claim race."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
    commit,
    read_snapshot,
    transactional_batch_writer,
    txn_append,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_append_read_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = txn_append(_df(spark, 0, 100), t)
    v1 = txn_append(_df(spark, 100, 150), t)
    assert (v0, v1) == (0, 1)
    assert read_snapshot(spark, t).count() == 150
    assert read_snapshot(spark, t, version=0).count() == 100  # time travel


def test_txn_replay_is_exactly_once(spark, tmp_path):
    t = str(tmp_path / "tbl")
    a = txn_append(_df(spark, 0, 50), t, txn_id="batch-7")
    b = txn_append(_df(spark, 0, 50), t, txn_id="batch-7")  # replay
    assert a == b == 0
    assert read_snapshot(spark, t).count() == 50


def test_snapshot_isolation_ignores_uncommitted(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txn_append(_df(spark, 0, 10), t)
    # an in-flight writer: data staged but no manifest committed
    _df(spark, 10, 99).write.parquet(f"{t}/data/inflight")
    assert read_snapshot(spark, t).count() == 10


def test_version_claim_race_retries(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txn_append(_df(spark, 0, 10), t)
    # another writer claims v1 between our scan and create
    os.makedirs(f"{t}/_log", exist_ok=True)
    with open(f"{t}/_log/v1.json", "w") as fh:
        json.dump({"version": 1, "added": [], "txn_id": "rival"}, fh)
    v = commit(t, [], txn_id="mine")
    assert v == 2  # lost the race at 1, landed at 2
    assert read_snapshot(spark, t).count() == 10


def test_foreach_batch_writer_replay(spark, tmp_path):
    t = str(tmp_path / "tbl")
    wb = transactional_batch_writer(t)
    wb(_df(spark, 0, 30), 0)
    wb(_df(spark, 30, 40), 1)
    wb(_df(spark, 30, 40), 1)  # epoch replay after simulated failure
    assert read_snapshot(spark, t).count() == 40
