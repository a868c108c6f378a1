"""operators/heavyhitters.py: Misra-Gries heavy hitters.

The load-bearing property is EXACT EQUIVALENCE: for any data and
threshold, heavy_hitters must return precisely what the unbounded
groupBy-count baseline returns — including under adversarial
partitioning (hot key concentrated in one partition, where merged
summary weights rank worst) — while mg_summaries stays k-bounded.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.heavyhitters import (
    heavy_hitters,
    mg_summaries,
    suggest_salt_buckets,
)


def _zipfish(spark, n_parts=8):
    """One huge key, a few medium, a long unique tail; returns
    (df, exact {value: freq})."""
    rows = (
        [("hot",)] * 3000
        + [("warm1",)] * 700
        + [("warm2",)] * 400
        + [(f"u{i}",) for i in range(2000)]
    )
    exact = {"hot": 3000, "warm1": 700, "warm2": 400}
    exact.update({f"u{i}": 1 for i in range(2000)})
    return (
        spark.createDataFrame(rows, "k string").repartition(n_parts),
        exact,
    )


def _baseline(exact, threshold):
    return sorted(
        ((v, c) for v, c in exact.items() if c > threshold),
        key=lambda vc: (-vc[1], vc[0]),
    )


@pytest.mark.parametrize("k", [4, 16, 64])
def test_matches_unbounded_groupby_baseline(spark, k):
    df, exact = _zipfish(spark)
    n = sum(exact.values())
    got = [(r.k, r.freq) for r in heavy_hitters(df, "k", k=k).collect()]
    assert got == _baseline(exact, n / k)


def test_adversarial_partitioning_keeps_the_guarantee(spark):
    """Hot key entirely inside one partition: its merged weight is
    heavily decremented there while spread-out tail values keep
    their weight — exactly the layout where a rank-based (top-k)
    candidate cut loses the true heavy hitter. The bound-based cut
    must not."""
    df, exact = _zipfish(spark)
    skewed = df.repartitionByRange(6, "k")  # range -> hot key co-located
    n = sum(exact.values())
    for k in (4, 8):
        got = [(r.k, r.freq) for r in heavy_hitters(skewed, "k", k=k).collect()]
        assert got == _baseline(exact, n / k)


def test_summaries_are_k_bounded_and_underestimating(spark):
    df, exact = _zipfish(spark)
    k = 8
    summ = mg_summaries(df, "k", k).collect()
    n_parts = df.rdd.getNumPartitions()
    assert len(summ) <= (k + 1) * n_parts
    merged: dict = {}
    for r in summ:
        if r.k is not None:
            merged[r.k] = merged.get(r.k, 0) + r.weight
    n = sum(exact.values())
    for v, w in merged.items():
        assert w <= exact.get(v, 0)  # never over-estimates
        assert w >= exact.get(v, 0) - n / (k + 1)  # bounded under-estimate
    assert sum(r.n_part for r in summ) == n  # n recovered scan-free


def test_nulls_are_excluded(spark):
    rows = [("a",)] * 50 + [(None,)] * 500 + [("b",)] * 10
    df = spark.createDataFrame(rows, "k string").repartition(4)
    got = [(r.k, r.freq) for r in heavy_hitters(df, "k", k=3).collect()]
    assert got == [("a", 50)]  # n=60 non-null; b=10 <= 60/3; null gone


def test_min_fraction_tightens_reporting(spark):
    df, exact = _zipfish(spark)
    got = [
        (r.k, r.freq)
        for r in heavy_hitters(df, "k", k=16, min_fraction=0.2).collect()
    ]
    assert got == [("hot", 3000)]  # only >20% of 6100 survives


def test_empty_input(spark):
    df = spark.createDataFrame([], "k string")
    assert heavy_hitters(df, "k", k=4).count() == 0


def test_suggest_salt_buckets(spark):
    df, _ = _zipfish(spark)
    assert suggest_salt_buckets(df, "k", rows_per_task=500) == 6  # 3000/500
    assert suggest_salt_buckets(df, "k", rows_per_task=10**6) == 1
    with pytest.raises(ValueError, match="rows_per_task"):
        suggest_salt_buckets(df, "k", rows_per_task=0)


def test_k_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="k must be"):
        mg_summaries(df, "k", 0).collect()


# --- pure-Python Misra-Gries invariants (hypothesis; no Spark) ---

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from utc_cuip_kafka_aws_connector_spark.operators.heavyhitters import _mg_compress


@settings(max_examples=200, deadline=None)
@given(
    stream=st.lists(st.integers(min_value=0, max_value=30), max_size=400),
    k=st.integers(min_value=1, max_value=12),
    batch=st.integers(min_value=1, max_value=50),
)
def test_mg_stream_invariants(stream, k, batch):
    """Replay the exact per-batch loop mg_summaries runs: after any
    prefix, (a) at most k counters, (b) no counter over-estimates,
    (c) every counter under-estimates by at most n/(k+1) -- so any
    value with true frequency > n/k is guaranteed present."""
    counts: dict = {}
    for i in range(0, len(stream), batch):
        for v, c in Counter(stream[i : i + batch]).items():
            counts[v] = counts.get(v, 0) + c
        counts = _mg_compress(counts, k)
    exact = Counter(stream)
    n = len(stream)
    assert len(counts) <= k
    for v, w in counts.items():
        assert 0 < w <= exact[v]
        assert w >= exact[v] - n / (k + 1)
    for v, c in exact.items():
        if c > n / k:
            assert v in counts


def test_summary_shuffle_sits_above_the_sketch(spark):
    """Plan pin for the q119 scale contract: in the candidate stage
    the ONLY Exchange keys on the MapInPandas OUTPUT — i.e. what
    shuffles is the <= (k+1)-rows-per-partition summary stream, never
    the raw key space. (Root-first formatted explain: the Exchange
    parent prints before its MapInPandas descendant.)"""
    from tests.plan_utils import formatted_plan

    df, _ = _zipfish(spark)
    agg = (
        mg_summaries(df, "k", 8)
        .groupBy("k")
        .agg(F.sum("weight").alias("weight"))
    )
    import re

    plan = formatted_plan(agg)
    # node numbers increase leaf -> root in formatted explain; the
    # fixture's own repartition() contributes a round-robin Exchange
    # below the sketch, so pin the KEYED exchanges specifically.
    hash_ex = [
        int(m.group(1))
        for m in re.finditer(r"\((\d+)\) Exchange\nInput.*\nArguments: hashpartitioning\(k#", plan)
    ]
    mip = [int(m.group(1)) for m in re.finditer(r"\((\d+)\) MapInPandas", plan)]
    assert len(hash_ex) == 1 and len(mip) == 1
    assert hash_ex[0] > mip[0]  # the keyed shuffle consumes summary rows
