"""operators/ordering.py: deterministic epoch shuffle + curriculum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.ordering import (
    curriculum_order,
    epoch_shuffle,
)


def _order(df, id_col="doc_id"):
    return [r[id_col] for r in df.select(id_col).collect()]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 10.0).alias("quality"),
    )


def test_same_seed_epoch_is_layout_independent(spark, docs):
    a = _order(epoch_shuffle(docs, seed=7, epoch=0))
    b = _order(epoch_shuffle(docs.repartition(17), seed=7, epoch=0))
    c = _order(epoch_shuffle(docs.orderBy(F.desc("doc_id")), seed=7, epoch=0))
    assert a == b == c
    assert sorted(a) == list(range(500))  # a real permutation


def test_epochs_and_seeds_decorrelate(spark, docs):
    e0 = _order(epoch_shuffle(docs, seed=7, epoch=0))
    e1 = _order(epoch_shuffle(docs, seed=7, epoch=1))
    s1 = _order(epoch_shuffle(docs, seed=8, epoch=0))
    assert e0 != e1 and e0 != s1 and e1 != s1
    # rank correlation between epochs ~ 0: mean |rank shift| of a
    # random permutation of n=500 is ~ n/3; require a healthy fraction
    pos0 = {d: i for i, d in enumerate(e0)}
    shift = sum(abs(pos0[d] - i) for i, d in enumerate(e1)) / len(e1)
    assert shift > 500 / 6


def test_shuffle_is_not_the_identity_or_sorted(docs):
    got = _order(epoch_shuffle(docs, seed=3, epoch=0))
    assert got != list(range(500)) and got != sorted(got)


def test_curriculum_stages_are_monotone_and_shuffled(spark, docs):
    out = curriculum_order(docs, "quality", n_stages=4, seed=1).collect()
    stages = [r.stage for r in out]
    assert stages == sorted(stages)  # stage is the leading order
    means = {}
    for s in (1, 2, 3, 4):
        vals = [r.quality for r in out if r.stage == s]
        assert len(vals) == 125
        means[s] = sum(vals) / len(vals)
    # descending=True: earlier stages have HIGHER quality
    assert means[1] > means[2] > means[3] > means[4]
    # and ids within a stage are hash-shuffled, not id-ordered
    ids1 = [r.doc_id for r in out if r.stage == 1]
    assert ids1 != sorted(ids1)


def test_curriculum_is_deterministic(spark, docs):
    a = [tuple(r) for r in curriculum_order(docs, "quality", seed=5).collect()]
    b = [
        tuple(r)
        for r in curriculum_order(docs.repartition(13), "quality", seed=5).collect()
    ]
    assert a == b


def test_n_stages_validation(docs):
    with pytest.raises(ValueError, match="n_stages"):
        curriculum_order(docs, "quality", n_stages=0)


def test_curriculum_approx_stages_match_exact(spark):
    """method='approx' (the corpus-scale path): no unpartitioned
    window sort in the plan, stage populations within the quantile
    tolerance, and assignments agree with the exact ntile form away
    from the cut boundaries."""
    from collections import Counter

    from tests.plan_utils import formatted_plan, window_arguments
    from utc_cuip_kafka_aws_connector_spark.operators.ordering import (
        curriculum_order,
    )

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.xxhash64("id") % 100000).alias("score"),
    )
    exact = curriculum_order(df, "score", n_stages=4)
    approx = curriculum_order(df, "score", n_stages=4, method="approx")

    plan = formatted_plan(approx)
    unpartitioned, _ = window_arguments(plan)
    assert not unpartitioned, "approx path must not globally sort"

    e = {r.doc_id: r.stage for r in exact.select("doc_id", "stage").collect()}
    a = {r.doc_id: r.stage for r in approx.select("doc_id", "stage").collect()}
    assert set(a.values()) == {1, 2, 3, 4}
    pops = Counter(a.values())
    for s in (1, 2, 3, 4):
        assert abs(pops[s] - 500) <= 50, pops  # rel_err-grade balance
    agree = sum(e[k] == a[k] for k in e) / len(e)
    assert agree > 0.95, agree

    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        curriculum_order(df, "score", method="nope")


def test_curriculum_approx_null_empty_and_single_stage(spark):
    """Code-review r13 follow-ups: null scores take the exact path's
    null-ordering stage (DESC = last, ASC = first), empty and
    all-null frames stage gracefully, and n_stages=1 under approx
    never plans the global ntile sort."""
    from tests.plan_utils import formatted_plan, window_arguments
    from utc_cuip_kafka_aws_connector_spark.operators.ordering import (
        curriculum_order,
    )

    df = spark.createDataFrame(
        [(0, 10), (1, None), (2, 90), (3, None)],
        "doc_id long, score long",
    )
    desc = {
        r.doc_id: r.stage
        for r in curriculum_order(
            df, "score", n_stages=2, method="approx"
        ).collect()
    }
    assert desc[1] == desc[3] == 2  # DESC: nulls land in the last stage
    asc = {
        r.doc_id: r.stage
        for r in curriculum_order(
            df, "score", n_stages=2, method="approx", descending=False
        ).collect()
    }
    assert asc[1] == asc[3] == 1  # ASC: nulls land first

    empty = spark.createDataFrame([], "doc_id long, score long")
    assert (
        curriculum_order(empty, "score", n_stages=3, method="approx").count()
        == 0
    )
    all_null = spark.createDataFrame(
        [(0, None), (1, None)], "doc_id long, score long"
    )
    got = curriculum_order(
        all_null, "score", n_stages=3, method="approx"
    ).collect()
    assert {r.stage for r in got} == {3}

    one = curriculum_order(df, "score", n_stages=1, method="approx")
    unpartitioned, _ = window_arguments(formatted_plan(one))
    assert not unpartitioned  # no global sort for the constant stage
    assert {r.stage for r in one.collect()} == {1}
