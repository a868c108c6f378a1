"""operators/bloom.py: Bloom-filter membership pre-filter.

The load-bearing guarantees: NO false negatives (semi-filter then
exact join == exact join, pinned on real fixture keys), false-
positive rate near the configured target, mergeable partition
builds, and null handling.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_params,
    bloom_semi_filter,
)

SF = "/root/testdata/sf0.01"


def test_params_textbook_shape():
    m, k = bloom_params(10_000, 0.01)
    assert 9.4 * 10_000 <= m <= 9.8 * 10_000  # ~9.6 bits/key at 1%
    assert k == 7
    with pytest.raises(ValueError, match="num_items"):
        bloom_params(0, 0.01)


def test_no_false_negatives_on_fixture_join(spark):
    """The equivalence that makes the pre-filter safe: filtering
    lineitem by a bloom of the supplier keys, then joining exactly,
    equals the unfiltered exact join."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    sup = (
        spark.read.parquet(f"{SF}/supplier.parquet")
        .filter(F.col("s_suppkey") % 7 == 0)
        .select(F.col("s_suppkey"))
    )
    model = bloom_build(sup, "s_suppkey", num_items=200, fpp=0.01)
    filtered = bloom_semi_filter(li, "l_suppkey", model)
    exact = li.join(
        sup.withColumnRenamed("s_suppkey", "l_suppkey"), "l_suppkey", "left_semi"
    )
    after = filtered.join(
        sup.withColumnRenamed("s_suppkey", "l_suppkey"), "l_suppkey", "left_semi"
    )
    assert after.count() == exact.count()
    # and the filter really shrank the scan (1/7 of keys + fps)
    assert filtered.count() < li.count() / 3


def test_fpr_is_near_target(spark):
    added = spark.range(0, 5000).select(F.col("id"))
    model = bloom_build(added, "id", num_items=5000, fpp=0.01)
    assert model["n_added"] == 5000
    probe = spark.range(1_000_000, 1_020_000).select(F.col("id"))
    hits = (
        bloom_might_contain(probe, "id", model).filter("might_contain").count()
    )
    assert hits / 20_000 < 0.03  # 3x headroom over the 1% target


def test_membership_guarantee_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id long, k string"
    )
    model = bloom_build(df, "k", num_items=10, fpp=0.01)
    assert model["n_added"] == 2  # null skipped
    got = {
        r.id: r.might_contain
        for r in bloom_might_contain(df, "k", model).collect()
    }
    assert got[1] and got[2] and not got[3]


def test_partition_merge_is_lossless(spark):
    """Same keys through 1 vs 13 partitions give identical bitsets —
    the OR-merge is exact, not approximate."""
    base = spark.range(0, 3000)
    a = bloom_build(base.coalesce(1), "id", num_items=3000)
    b = bloom_build(base.repartition(13), "id", num_items=3000)
    assert a["bits"] == b["bits"] and a["m"] == b["m"]


def test_bloom_dumps_loads_round_trip_and_validation(spark):
    """The persisted wire format (stream-curate's snapshot sidecar):
    exact round trip, and structural validation that lets a consumer
    catch ONE ValueError instead of crashing later inside an executor
    probe."""
    import json

    import pytest

    from utc_cuip_kafka_aws_connector_spark.operators.bloom import (
        bloom_build,
        bloom_dumps,
        bloom_loads,
        bloom_might_contain,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(f"k{i}",) for i in range(50)], "key string")
    model = bloom_build(df, "key", 50, fpp=0.01)
    back = bloom_loads(bloom_dumps(model))
    assert back == model
    # the reloaded summary probes identically
    probe = spark.createDataFrame(
        [("k1",), ("nope",)], "key string"
    )
    got = {
        r.key: r.mb
        for r in bloom_might_contain(probe, "key", back, "mb").collect()
    }
    assert got["k1"] is True and got["nope"] is False
    for bad in [
        "{not json",
        "null",
        "123",
        json.dumps({"m": 10}),
        json.dumps({"m": 0, "k": 1, "n_added": 1, "bits_b64": ""}),
        json.dumps({"m": 80, "k": 2, "n_added": 1, "bits_b64": "AAAA"}),
        json.dumps({"m": 80, "k": 2, "n_added": 1, "bits_b64": "!!!"}),
    ]:
        with pytest.raises(ValueError):
            bloom_loads(bad)
