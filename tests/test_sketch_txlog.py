"""Composition: incremental HLL sketch-store maintenance from the
transaction log's change feed.

The production loop for "distinct users per slice, always current,
never rescanned": the fact table lives in a txlog table; after each
commit, sketch ONLY the change feed's inserts since the last
maintained version and append the rows to the sketch store
(HLL union is insert-only algebra — deletes cannot be subtracted
from a sketch, so the store tracks the APPEND-ONLY view; a
delete-heavy table re-sketches on vacuum, stated in the cardinality
module's contract). The test drives two commits, maintains the store
from read_changes alone, and checks the merged estimates equal a
from-scratch sketch of the appended data exactly (same union state).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.cardinality import (
    append_sketches,
    merge_distinct,
    sketch_distinct,
)
from utc_cuip_kafka_aws_connector_spark.sources import txlog


def _events(spark, start, n, users):
    return spark.range(start, start + n).select(
        F.col("id").alias("event_id"),
        (F.pmod(F.xxhash64("id"), F.lit(users))).alias("user_id"),
        F.concat(F.lit("type"), F.pmod("id", F.lit(3)).cast("string")).alias(
            "event_type"
        ),
    )


def test_change_feed_maintains_the_sketch_store(spark, tmp_path):
    table = str(tmp_path / "events")
    b1 = _events(spark, 0, 2000, 120)
    v1 = txlog.txn_append(b1, table, txn_id="b1")

    # initial store from the v1 snapshot
    store = sketch_distinct(
        txlog.read_snapshot(spark, table, version=v1),
        ["event_type"],
        "user_id",
    )

    b2 = _events(spark, 10_000, 1500, 200)
    v2 = txlog.txn_append(b2, table, txn_id="b2")

    # maintenance: sketch ONLY the inserts v1+1..v2 from the feed
    inserts = txlog.read_changes(spark, table, v1 + 1, v2).filter(
        F.col("_change_type") == "insert"
    )
    assert inserts.count() == 1500  # pure append: the feed is exactly b2
    store = append_sketches(
        store, sketch_distinct(inserts, ["event_type"], "user_id")
    )

    incremental = {
        (r.event_type,): (r.n_rows, r.approx_distinct)
        for r in merge_distinct(store, ["event_type"]).collect()
    }
    scratch = {
        (r.event_type,): (r.n_rows, r.approx_distinct)
        for r in merge_distinct(
            sketch_distinct(
                txlog.read_snapshot(spark, table), ["event_type"], "user_id"
            ),
            ["event_type"],
        ).collect()
    }
    assert incremental == scratch  # same union state, exactly

    # and the estimates are honest against the exact answer
    exact = {
        (r.event_type,): r.d
        for r in txlog.read_snapshot(spark, table)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for k, d in exact.items():
        assert incremental[k][1] == pytest.approx(d, rel=0.05)
