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
    est = cms_query(row.cms, probes, DEPTH, WIDTH)
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
    est = cms_query(total.cms, ["u0"])
    assert est["u0"] >= 40  # 10 in d1 + 30 in d2


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
