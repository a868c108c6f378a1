"""operators/reservoir.py: Efraimidis-Spirakis weighted sampling
without replacement.

Evidence: exact Python differential (the md5-hash uniform and the
ln(u)/w key replicated in pure Python, selected SETS compared),
partitioning-invariance (the sampling.py doctrine the operator
exists to uphold), nesting (top-5 subset of top-10 at a seed),
statistical weight-monotonicity measured across 200 seeds in ONE
Spark job, stratified exact-size/short-stratum semantics, null and
non-positive weight dropping, and a plan check that the global draw
is TakeOrderedAndProject (no full sort, no data shuffle).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.plan_utils import formatted_plan
from utc_cuip_kafka_aws_connector_spark.operators.reservoir import (
    weighted_sample_n,
)

_SPACE = float(16**13)


def _py_key(doc_id, weight, seed):
    h = int(
        hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:13], 16
    )
    return math.log((h + 1.0) / (_SPACE + 1.0)) / weight


def _py_sample(rows, n, seed, strata=None):
    """rows: (id, weight[, stratum]); returns the selected id set."""
    eligible = [r for r in rows if r[1] is not None and r[1] > 0]
    if strata is None:
        ranked = sorted(
            eligible, key=lambda r: (-_py_key(r[0], r[1], seed), r[0])
        )
        return {r[0] for r in ranked[:n]}
    out = set()
    for s in {r[2] for r in eligible}:
        grp = sorted(
            (r for r in eligible if r[2] == s),
            key=lambda r: (-_py_key(r[0], r[1], seed), r[0]),
        )
        out |= {r[0] for r in grp[:n]}
    return out


def _fixture(seed=13, n=200):
    rng = np.random.default_rng(seed)
    return [
        (i, float(rng.gamma(2.0, 2.0)) + 0.01, f"s{i % 4}")
        for i in range(n)
    ]


def test_matches_python_reference_global_and_stratified(spark):
    rows = _fixture()
    df = spark.createDataFrame(rows, "id long, w double, s string")
    for seed in (0, 7):
        got = {
            r.id
            for r in weighted_sample_n(df, 20, "id", "w", seed=seed).collect()
        }
        assert got == _py_sample(rows, 20, seed)
        got_s = {
            r.id
            for r in weighted_sample_n(
                df, 5, "id", "w", strata_col="s", seed=seed
            ).collect()
        }
        assert got_s == _py_sample(rows, 5, seed, strata="s")


def test_partitioning_invariant(spark):
    rows = _fixture(seed=3)
    df = spark.createDataFrame(rows, "id long, w double, s string")
    base = {r.id for r in weighted_sample_n(df, 25, "id", "w", seed=1).collect()}
    for parts in (1, 7, 32):
        rep = {
            r.id
            for r in weighted_sample_n(
                df.repartition(parts), 25, "id", "w", seed=1
            ).collect()
        }
        assert rep == base


def test_samples_nest_and_are_exact_size(spark):
    rows = _fixture(seed=5)
    df = spark.createDataFrame(rows, "id long, w double, s string")
    top5 = {r.id for r in weighted_sample_n(df, 5, "id", "w", seed=2).collect()}
    top10 = {r.id for r in weighted_sample_n(df, 10, "id", "w", seed=2).collect()}
    assert len(top5) == 5 and len(top10) == 10
    assert top5 < top10


def test_weight_monotonicity_across_seeds(spark):
    """Item 'a' (weight 8) vs 'b'/'c' (weight 1 each): across 200
    seeds in ONE job, 'a' must win the n=1 draw far more often than
    uniform (expected share 0.8)."""
    items = [("a", 8.0), ("b", 1.0), ("c", 1.0)]
    df = (
        spark.createDataFrame(items, "id string, w double")
        .crossJoin(
            spark.range(200).select(F.col("id").alias("seed"))
        )
        .select(
            F.concat("id", F.lit("#"), "seed").alias("sid"),
            "id",
            "w",
            "seed",
        )
    )
    # per-seed n=1 draw == stratified-by-seed top-1 (key from sid so
    # each (item, seed) hashes independently, the multi-seed trick)
    won = (
        weighted_sample_n(df, 1, "sid", "w", strata_col="seed")
        .groupBy("id")
        .count()
        .collect()
    )
    wins = {r.id: r["count"] for r in won}
    assert sum(wins.values()) == 200
    assert wins.get("a", 0) > 130, wins  # E[160], P(<=130) ~ 1e-7
    assert wins.get("b", 0) > 0 and wins.get("c", 0) > 0


def test_short_strata_and_bad_rows(spark):
    df = spark.createDataFrame(
        [
            (1, 1.0, "big"),
            (2, 1.0, "big"),
            (3, 1.0, "big"),
            (4, 1.0, "small"),
            (5, 0.0, "small"),  # non-positive: dropped
            (6, None, "small"),  # null weight: dropped
            (None, 1.0, "small"),  # null id: dropped
        ],
        "id long, w double, s string",
    )
    got = weighted_sample_n(df, 2, "id", "w", strata_col="s").collect()
    by_s = {}
    for r in got:
        by_s.setdefault(r.s, set()).add(r.id)
    assert len(by_s["big"]) == 2
    assert by_s["small"] == {4}
    with pytest.raises(ValueError, match="n must be"):
        weighted_sample_n(df, 0, "id", "w")


def test_key_col_exposed_and_plan_is_topk(spark):
    rows = _fixture(seed=9)
    df = spark.createDataFrame(rows, "id long, w double, s string")
    out = weighted_sample_n(df, 10, "id", "w", key_col="es_key")
    assert all(r.es_key < 0 for r in out.collect())
    plan = formatted_plan(out)
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_targets_table_draw_matches_per_group_reference(spark):
    """weighted_sample_targets == an independent fixed-n draw per
    stratum at that stratum's target (same keys, same winners), and
    the end-to-end unimax -> sample loop closes."""
    from utc_cuip_kafka_aws_connector_spark.operators.reservoir import (
        weighted_sample_targets,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.unimax import (
        unimax_allocation,
    )

    rows = _fixture(seed=21, n=120)
    df = spark.createDataFrame(rows, "id long, w double, s string")
    targets = spark.createDataFrame(
        [("s0", 7), ("s1", 3), ("s2", 0), ("missing", 5)],
        "s string, target long",
    )
    got = weighted_sample_targets(df, targets, "id", "w", "s", seed=4)
    by_s = {}
    for r in got.collect():
        by_s.setdefault(r.s, set()).add(r.id)
    assert set(by_s) == {"s0", "s1"}  # target 0 and absent strata drop
    for s, n in (("s0", 7), ("s1", 3)):
        want = {
            r.id
            for r in weighted_sample_n(
                df.filter(F.col("s") == s), n, "id", "w", seed=4
            ).collect()
        }
        assert by_s[s] == want and len(by_s[s]) == n
    # the assembly loop: unimax targets (alias alloc->target) feed the draw
    sizes = df.groupBy("s").agg(F.count("*").cast("double").alias("n_docs"))
    alloc = unimax_allocation(
        sizes, 30.0, group_col="s", size_col="n_docs",
        max_epochs=1.0, pre_aggregated=True,
    ).select("s", F.col("alloc").alias("target"))
    drawn = weighted_sample_targets(df, alloc, "id", "w", "s", seed=9)
    per = {r.s: r["count"] for r in drawn.groupBy("s").count().collect()}
    assert sum(per.values()) <= 30 and all(v > 0 for v in per.values())


def test_targets_draw_is_broadcast_join(spark):
    from utc_cuip_kafka_aws_connector_spark.operators.reservoir import (
        weighted_sample_targets,
    )

    rows = _fixture(seed=2)
    df = spark.createDataFrame(rows, "id long, w double, s string")
    targets = spark.createDataFrame([("s0", 5)], "s string, target long")
    plan = formatted_plan(
        weighted_sample_targets(df, targets, "id", "w", "s")
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_nan_weights_excluded(spark):
    """NaN weights pass `> 0` in Spark ordering and would hijack the
    whole draw (review r16) — they must be excluded like nulls."""
    df = spark.createDataFrame(
        [(1, 1.0, "s"), (2, 5.0, "s"), (3, float("nan"), "s"),
         (4, float("nan"), "s")],
        "id long, w double, s string",
    )
    got = {r.id for r in weighted_sample_n(df, 2, "id", "w").collect()}
    assert got == {1, 2}
