"""operators/scorenorm.py: cross-source score normalization.

Evidence: numpy differential for all three methods (population
moments, minmax, percent_rank semantics with ties), a DuckDB
window/aggregate differential (oracle-expressibility dry run),
constant-group and singleton conventions, NULL/NaN pass-through as
NULL (the r16 NaN doctrine), row conservation, and plan shape
(broadcast join for the moment methods, single window for rank).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.plan_utils import formatted_plan
from utc_cuip_kafka_aws_connector_spark.operators.scorenorm import (
    normalize_scores,
)


def _fixture(seed=3, n=120):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        g = f"s{i % 3}"
        scale = {"s0": 1.0, "s1": 100.0, "s2": 0.01}[g]
        rows.append((i, float(rng.normal(5, 2) * scale), g))
    rows += [(900, None, "s0"), (901, float("nan"), "s1"), (902, 1.0, None)]
    return rows


def test_matches_numpy_reference_all_methods(spark):
    rows = _fixture()
    df = spark.createDataFrame(rows, "id long, score double, src string")
    clean = [
        (i, s, g) for i, s, g in rows
        if s is not None and not np.isnan(s) and g is not None
    ]
    by_g = {}
    for i, s, g in clean:
        by_g.setdefault(g, []).append((i, s))

    for method in ("zscore", "minmax", "rank"):
        got = {
            r.id: r.score_norm
            for r in normalize_scores(df, "score", "src", method=method).collect()
        }
        assert len(got) == len(rows)  # row conservation
        for bad in (900, 901, 902):
            assert got[bad] is None
        for g, members in by_g.items():
            vals = np.array([s for _, s in members])
            for i, s in members:
                if method == "zscore":
                    want = (s - vals.mean()) / vals.std()
                elif method == "minmax":
                    want = (s - vals.min()) / (vals.max() - vals.min())
                else:
                    srt = np.sort(vals)
                    first = np.searchsorted(srt, s, side="left")
                    want = first / (len(vals) - 1)
                assert got[i] == pytest.approx(want, rel=1e-9), (method, i)


def test_matches_duckdb_oracle(spark):
    rows = _fixture(seed=7, n=60)
    df = spark.createDataFrame(rows, "id long, score double, src string")
    pdf = pd.DataFrame(rows, columns=["id", "score", "src"])
    con = duckdb.connect()
    try:
        con.register("t", pdf)
        z = dict(con.execute(
            """SELECT id, (score - avg(score) OVER (PARTITION BY src))
                      / stddev_pop(score) OVER (PARTITION BY src)
               FROM t WHERE score IS NOT NULL AND NOT isnan(score)
                 AND src IS NOT NULL"""
        ).fetchall())
        r = dict(con.execute(
            """SELECT id, percent_rank() OVER (
                 PARTITION BY src ORDER BY score)
               FROM t WHERE score IS NOT NULL AND NOT isnan(score)
                 AND src IS NOT NULL"""
        ).fetchall())
    finally:
        con.close()
    got_z = {
        x.id: x.score_norm
        for x in normalize_scores(df, "score", "src", "zscore").collect()
        if x.score_norm is not None
    }
    got_r = {
        x.id: x.score_norm
        for x in normalize_scores(df, "score", "src", "rank").collect()
        if x.score_norm is not None
    }
    assert set(got_z) == set(z) and set(got_r) == set(r)
    for i in z:
        assert got_z[i] == pytest.approx(z[i], rel=1e-9)
        assert got_r[i] == pytest.approx(r[i], rel=1e-12)


def test_degenerate_groups_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 7.0, "const"), (2, 7.0, "const"), (3, 9.0, "single")],
        "id long, score double, src string",
    )
    for method, const_want, single_want in (
        ("zscore", 0.0, 0.0),
        ("minmax", 0.5, 0.5),
        ("rank", 0.0, 0.0),
    ):
        got = {
            r.id: r.score_norm
            for r in normalize_scores(df, "score", "src", method).collect()
        }
        assert got[1] == const_want and got[2] == const_want, method
        assert got[3] == single_want, method
    with pytest.raises(ValueError, match="method"):
        normalize_scores(df, "score", "src", method="sigmoid")


def test_plan_shapes(spark):
    df = spark.createDataFrame(_fixture(), "id long, score double, src string")
    z_plan = formatted_plan(normalize_scores(df, "score", "src", "zscore"))
    assert "BroadcastHashJoin" in z_plan
    assert "Window" not in z_plan
    r_plan = formatted_plan(normalize_scores(df, "score", "src", "rank"))
    assert "Window" in r_plan and "Join" not in r_plan
