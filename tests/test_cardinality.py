"""operators/cardinality.py: mergeable HLL distinct-count store.

Pins: estimate accuracy vs exact count-distinct, merge-of-parts ==
direct-sketch equivalence, the daily-store -> monthly-rollup loop,
the append-only incremental loop, and the map-side partial-agg plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.cardinality import (
    append_sketches,
    merge_distinct,
    sketch_distinct,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _exact(df, keys, col):
    if keys:
        return {
            tuple(r[k] for k in keys): r.d
            for r in df.groupBy(*keys)
            .agg(F.countDistinct(col).alias("d"))
            .collect()
        }
    return df.select(F.countDistinct(col).alias("d")).first().d


def test_per_group_estimates_within_bound(spark, events):
    got = {
        (r.event_type,): r.approx_distinct
        for r in merge_distinct(
            sketch_distinct(events, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    exact = _exact(events, ["event_type"], "user_id")
    assert set(got) == set(exact)
    for k, d in exact.items():
        assert got[k] == pytest.approx(d, rel=0.05)  # ~3 sigma at lg_k=12


def test_merge_of_parts_equals_direct_global_sketch(spark, events):
    """Store daily (well, per-type) sketches, merge them globally —
    the estimate must match sketching the whole table directly (same
    lg_k): HLL union is lossless w.r.t. the sketch state."""
    parts = sketch_distinct(events, ["event_type"], "user_id")
    merged = merge_distinct(parts).first()
    direct = merge_distinct(sketch_distinct(events, [], "user_id")).first()
    assert merged.approx_distinct == direct.approx_distinct  # same state
    assert merged.n_rows == direct.n_rows
    assert merged.approx_distinct == pytest.approx(
        _exact(events, None, "user_id"), rel=0.05
    )


def test_rollup_day_store_to_month(spark, events):
    """The production loop: persist per-(month, day) sketches once,
    answer per-month distincts from the store alone."""
    dated = events.select(
        F.month("ts").alias("m"), F.dayofmonth("ts").alias("d"), "user_id"
    )
    store = sketch_distinct(dated, ["m", "d"], "user_id")
    monthly = {
        r.m: r.approx_distinct
        for r in merge_distinct(store, ["m"]).collect()
    }
    exact = _exact(dated, ["m"], "user_id")
    for (m,), d in exact.items():
        assert monthly[m] == pytest.approx(d, rel=0.05)


def test_incremental_append_matches_recompute(spark, events):
    """Split the stream in two batches; append batch-2 sketches to the
    batch-1 store and re-merge: equals the from-scratch sketch of the
    whole stream EXACTLY (union of unions, same state)."""
    b1 = events.filter(F.col("event_id") % 2 == 0)
    b2 = events.filter(F.col("event_id") % 2 == 1)
    store = sketch_distinct(b1, ["event_type"], "user_id")
    store = append_sketches(store, sketch_distinct(b2, ["event_type"], "user_id"))
    inc = {
        (r.event_type,): r.approx_distinct
        for r in merge_distinct(store, ["event_type"]).collect()
    }
    full = {
        (r.event_type,): r.approx_distinct
        for r in merge_distinct(
            sketch_distinct(events, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    assert inc == full


def test_plan_is_jvm_partial_agg(spark, events):
    """Sketch build must be a two-phase hash aggregate (map-side
    partial_hll_sketch_agg below the exchange) with no Python
    evaluation anywhere."""
    from tests.plan_utils import formatted_plan

    plan = formatted_plan(sketch_distinct(events, ["event_type"], "user_id"))
    assert "partial_hll_sketch_agg" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lg_k_validation(spark, events):
    with pytest.raises(ValueError, match="lg_k"):
        sketch_distinct(events, [], "user_id", lg_k=2)
