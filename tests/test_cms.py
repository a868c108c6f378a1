"""operators/cms.py: Count-Min frequency sketch store."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.cms import (
    cms_merge,
    cms_query,
    cms_sketch,
)

DEPTH, WIDTH = 4, 1024


def _stream(spark):
    rows = (
        [("hot",)] * 500
        + [("warm",)] * 120
        + [(f"tail{i}",) for i in range(800)]
    )
    return (
        spark.createDataFrame(rows, "k string").repartition(8),
        Counter([v for (v,) in rows]),
    )


def test_one_sided_bound_and_accuracy(spark):
    df, exact = _stream(spark)
    row = cms_sketch(df, [], "k", DEPTH, WIDTH).first()
    assert row.n_rows == sum(exact.values())
    probes = ["hot", "warm", "tail3", "never_seen"]
    est = cms_query(row.cms, probes, DEPTH, WIDTH, row.hash_v)
    n = row.n_rows
    eps_n = math.e / WIDTH * n  # ~3.8 at these sizes
    for v in probes:
        true = exact.get(v, 0)
        assert est[v] >= true  # NEVER lies low
        assert est[v] <= true + eps_n + 1e-9
    assert est["hot"] >= 500 and est["never_seen"] <= eps_n


def test_merge_of_parts_equals_direct(spark):
    df, _ = _stream(spark)
    a = df.filter(F.xxhash64("k") % 2 == 0)
    b = df.filter(F.xxhash64("k") % 2 != 0)
    parts = cms_sketch(a, [], "k").unionByName(cms_sketch(b, [], "k"))
    merged = cms_merge(parts).first()
    direct = cms_sketch(df, [], "k").first()
    assert merged.n_rows == direct.n_rows
    assert merged.cms == direct.cms  # integer matrices add EXACTLY


def test_grouped_store_and_rollup(spark):
    df = spark.createDataFrame(
        [("d1", "u%d" % (i % 7)) for i in range(70)]
        + [("d2", "u0")] * 30,
        "day string, user string",
    )
    store = cms_sketch(df, ["day"], "user")
    assert store.count() == 2
    total = cms_merge(store).first()
    assert (total.depth, total.width) == (DEPTH, WIDTH)  # geometry rides along
    est = cms_query(total.cms, ["u0"], total.depth, total.width, total.hash_v)
    assert est["u0"] >= 40  # 10 in d1 + 30 in d2


def test_depth_rows_are_decorrelated():
    """ADVICE r9 (medium): with the old linear (h * salt) % width row
    hashing, keys colliding in row 0 collided in EVERY row, so
    min-over-depth added nothing. With the splitmix64 finalizer a
    row-0 collision must say ~nothing about row 1: among row-0
    colliders, the row-1 collision rate stays near the 1/width
    chance level instead of 1.0."""
    import pandas as pd

    from utc_cuip_kafka_aws_connector_spark.operators.cms import _rows_cols

    vals = pd.Series([f"key{i}" for i in range(20_000)])
    r0, r1 = _rows_cols(vals, 2, WIDTH)
    by_bucket: dict = {}
    for i, b in enumerate(r0):
        by_bucket.setdefault(int(b), []).append(i)
    pairs = both = 0
    for idx in by_bucket.values():
        for a, b in zip(idx, idx[1:]):  # chain pairs: enough samples
            pairs += 1
            both += int(r1[a] == r1[b])
    assert pairs > 1000  # the test has power
    assert both / pairs < 0.05, (
        f"row-1 collision rate among row-0 colliders = {both / pairs:.3f}; "
        "rows are still correlated"
    )


def test_query_geometry_mismatch_raises(spark):
    df, _ = _stream(spark)
    row = cms_sketch(df, [], "k", depth=2, width=2048).first()
    est = cms_query(row.cms, ["hot"], row.depth, row.width, row.hash_v)
    assert est["hot"] >= 500
    # 2*2048 == 4*1024: equal-area geometries are indistinguishable
    # from the array length, so defaults are refused outright.
    with pytest.raises(ValueError, match="geometry required"):
        cms_query(row.cms, ["hot"])  # the old silent 4x1024 reshape
    with pytest.raises(ValueError, match="geometry mismatch"):
        cms_query(row.cms, ["hot"], depth=3, width=1024, hash_v=row.hash_v)


def test_merge_refuses_mixed_geometry(spark):
    df, _ = _stream(spark)
    mixed = cms_sketch(df, [], "k", depth=4, width=1024).unionByName(
        cms_sketch(df, [], "k", depth=2, width=2048)
    )
    with pytest.raises(Exception, match="different"):
        cms_merge(mixed).collect()


def test_merge_guard_survives_column_pruning(spark):
    """ADVICE r10: the mixed-geometry guard used to ride ONLY n_rows,
    so `select('cms')` let Catalyst prune the check away and a mixed
    merge returned garbage counters silently. The guard now rides
    every consumable column."""
    df, _ = _stream(spark)
    mixed = cms_sketch(df, [], "k", depth=4, width=1024).unionByName(
        cms_sketch(df, [], "k", depth=2, width=2048)
    )
    with pytest.raises(Exception, match="different"):
        cms_merge(mixed).select("cms").collect()
    with pytest.raises(Exception, match="different"):
        cms_merge(mixed).select("n_rows").collect()


def test_hash_scheme_version_is_enforced(spark):
    """ADVICE r10: rows are stamped with the probe-scheme version;
    mixing schemes in a merge, or querying with a stale/absent
    version, refuses instead of silently breaking est >= true."""
    df, _ = _stream(spark)
    store = cms_sketch(df, [], "k", DEPTH, WIDTH)
    row = store.first()
    assert row.hash_v == 2  # splitmix64-decorrelated probes (r10)

    # a persisted pre-r10 row surfaces as hash_v=1 after backfill
    legacy = store.withColumn("hash_v", F.lit(1).cast("int"))
    with pytest.raises(Exception, match="retired probe scheme"):
        cms_merge(legacy).select("cms").collect()
    # mixing schemes is "different geometry" before it is "retired"
    with pytest.raises(Exception, match="different"):
        cms_merge(store.unionByName(legacy)).select("cms").collect()

    with pytest.raises(ValueError, match="hash scheme required"):
        cms_query(row.cms, ["hot"], row.depth, row.width)
    with pytest.raises(ValueError, match="hash scheme v1"):
        cms_query(row.cms, ["hot"], row.depth, row.width, hash_v=1)


def test_group_cardinality_guard(spark):
    df = spark.createDataFrame(
        [(f"g{i}", "v") for i in range(50)], "g string, v string"
    ).coalesce(1)
    with pytest.raises(Exception, match="distinct"):
        cms_sketch(df, ["g"], "v", max_groups_per_partition=10).collect()
    assert (
        cms_sketch(df, ["g"], "v", max_groups_per_partition=64).count() == 50
    )


def test_determinism_across_layouts(spark):
    df, _ = _stream(spark)
    a = cms_sketch(df, [], "k").first()
    b = cms_sketch(df.repartition(3), [], "k").first()
    assert a.cms == b.cms


def test_validation(spark):
    df, _ = _stream(spark)
    with pytest.raises(ValueError, match="depth"):
        cms_sketch(df, [], "k", depth=0)
    with pytest.raises(ValueError, match="width"):
        cms_sketch(df, [], "k", width=1)
