"""operators/doremi.py: DoReMi domain reweighting.

Evidence: a DuckDB differential for the excess-loss aggregation
(NULL/NaN exclusion and the zero-clip both reach the comparison), an
exact-arithmetic numpy/pure-Python replay of the exponentiated-
gradient fold (per-step and iterated shapes, including the log-space
max shift), the paper's published invariants (weights simplex-
normalized; the smoothing floor holds; the returned mixture is the
iterate AVERAGE, not the last iterate), ragged-step and NaN-lambda
degradation, and the mixture-tier driver-collect guard contract.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.doremi import (
    domain_excess_loss,
    doremi_weights,
)


def _loss_fixture(spark):
    rows = []
    import random

    rng = random.Random(7)
    for step in range(6):
        for d, base in (("web", 2.0), ("code", 3.0), ("books", 2.5)):
            for i in range(8):
                proxy = base + rng.uniform(-0.5, 1.5)
                ref = base + rng.uniform(-0.5, 0.5)
                rows.append((step, d, proxy, ref))
    rows.append((0, None, 9.9, 0.1))          # null domain: dropped
    rows.append((1, "web", None, 1.0))        # null loss: dropped
    rows.append((2, "code", float("nan"), 1.0))  # NaN loss: dropped
    return spark.createDataFrame(
        rows, "step long, domain string, proxy_loss double, ref_loss double"
    )


def test_excess_loss_matches_duckdb(spark):
    df = _loss_fixture(spark)
    got = (
        domain_excess_loss(df, step_col="step")
        .orderBy("step", "domain")
        .collect()
    )
    con = duckdb.connect()
    con.register("losses", df.toPandas())
    want = con.execute(
        """
        SELECT step, domain,
               avg(greatest(proxy_loss - ref_loss, 0.0)) AS excess_loss,
               count(*) AS n
        FROM losses
        WHERE domain IS NOT NULL
          AND proxy_loss IS NOT NULL AND NOT isnan(proxy_loss)
          AND ref_loss IS NOT NULL AND NOT isnan(ref_loss)
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["step"], g["domain"], g["n_examples"]) == (w[0], w[1], w[3])
        assert g["excess_loss"] == pytest.approx(w[2], rel=1e-12)
    # signed variant keeps negative excess for diagnostics
    signed = {
        (r["step"], r["domain"]): r["excess_loss"]
        for r in domain_excess_loss(
            df, step_col="step", clip_at_zero=False
        ).collect()
    }
    clipped = {(g["step"], g["domain"]): g["excess_loss"] for g in got}
    assert all(signed[k] <= clipped[k] + 1e-12 for k in clipped)


def _python_replay(schedule, domains, lr, smoothing):
    """Independent fold: same math, different code shape (explicit
    lists, fsum-free sequential adds mirroring the lexicographic
    order the module pins)."""
    u = 1.0 / len(domains)
    alpha = {d: u for d in domains}
    avg = {d: 0.0 for d in domains}
    for lam in schedule:
        scores = {d: math.log(alpha[d]) + lr * lam.get(d, 0.0) for d in domains}
        m = max(scores.values())
        z = 0.0
        exps = {}
        for d in domains:
            exps[d] = math.exp(scores[d] - m)
            z += exps[d]
        for d in domains:
            alpha[d] = (1 - smoothing) * exps[d] / z + smoothing * u
            avg[d] += alpha[d]
    n = len(schedule)
    return {d: avg[d] / n for d in domains}, alpha


def test_weights_match_python_replay_per_step(spark):
    df = _loss_fixture(spark)
    lam_df = domain_excess_loss(df, step_col="step")
    got = {
        r["domain"]: r
        for r in doremi_weights(
            lam_df, step_col="step", lr=2.0, smoothing=1e-3
        ).collect()
    }
    sched_rows = lam_df.collect()
    steps = sorted({r["step"] for r in sched_rows})
    domains = sorted({r["domain"] for r in sched_rows})
    schedule = [
        {r["domain"]: r["excess_loss"] for r in sched_rows if r["step"] == s}
        for s in steps
    ]
    want_avg, want_final = _python_replay(schedule, domains, 2.0, 1e-3)
    for d in domains:
        assert got[d]["weight"] == pytest.approx(want_avg[d], abs=1e-14)
        assert got[d]["final_weight"] == pytest.approx(want_final[d], abs=1e-14)
        assert got[d]["n_updates"] == len(steps)
    # published invariants: simplex + smoothing floor + average != last
    assert sum(g["weight"] for g in got.values()) == pytest.approx(1.0)
    assert sum(g["final_weight"] for g in got.values()) == pytest.approx(1.0)
    floor = 1e-3 / len(domains)
    assert all(g["final_weight"] >= floor - 1e-15 for g in got.values())
    assert any(
        abs(g["weight"] - g["final_weight"]) > 1e-9 for g in got.values()
    ), "average of iterates should differ from the last iterate"


def test_weights_iterated_aggregate_and_direction(spark):
    lam = spark.createDataFrame(
        [("easy", 0.0), ("hard", 1.0), ("mid", 0.3)],
        "domain string, excess_loss double",
    )
    got = {
        r["domain"]: r for r in doremi_weights(lam, lr=1.0, n_iter=5).collect()
    }
    want_avg, want_final = _python_replay(
        [{"easy": 0.0, "hard": 1.0, "mid": 0.3}] * 5,
        ["easy", "hard", "mid"], 1.0, 1e-3,
    )
    for d in got:
        assert got[d]["weight"] == pytest.approx(want_avg[d], abs=1e-14)
        assert got[d]["final_weight"] == pytest.approx(want_final[d], abs=1e-14)
    # more excess loss -> more weight, strictly
    assert got["hard"]["weight"] > got["mid"]["weight"] > got["easy"]["weight"]


def test_ragged_steps_and_nan_lambda(spark):
    lam = spark.createDataFrame(
        [(0, "a", 1.0), (0, "b", 1.0), (1, "a", 1.0), (1, "b", float("nan"))],
        "step long, domain string, excess_loss double",
    )
    # domain c never logged at all -> not in the output (no row, no
    # weight); b's NaN at step 1 acts as lambda 0 (no push)
    got = {
        r["domain"]: r
        for r in doremi_weights(lam, step_col="step", lr=1.0).collect()
    }
    assert set(got) == {"a", "b"}
    assert got["a"]["weight"] > got["b"]["weight"]
    want_avg, _ = _python_replay(
        [{"a": 1.0, "b": 1.0}, {"a": 1.0, "b": 0.0}], ["a", "b"], 1.0, 1e-3
    )
    assert got["a"]["weight"] == pytest.approx(want_avg["a"], abs=1e-14)


def test_overflow_safe_large_lambda(spark):
    lam = spark.createDataFrame(
        [("a", 5000.0), ("b", 0.0)], "domain string, excess_loss double"
    )
    got = {r["domain"]: r for r in doremi_weights(lam, lr=1.0).collect()}
    assert math.isfinite(got["a"]["weight"])
    # a takes everything but the smoothing floor
    assert got["a"]["final_weight"] == pytest.approx(
        (1 - 1e-3) + 1e-3 / 2, abs=1e-12
    )


def test_validation_errors(spark):
    lam = spark.createDataFrame(
        [("a", 1.0), ("b", 0.5)], "domain string, excess_loss double"
    )
    with pytest.raises(ValueError, match="lr"):
        doremi_weights(lam, lr=0.0)
    with pytest.raises(ValueError, match="smoothing"):
        doremi_weights(lam, smoothing=1.0)
    with pytest.raises(ValueError, match="n_iter"):
        doremi_weights(lam, n_iter=0)
    with pytest.raises(ValueError, match="mutually"):
        doremi_weights(lam, step_col="step", n_iter=2)
    with pytest.raises(ValueError, match="max_cells"):
        doremi_weights(lam, max_cells=1)
    with pytest.raises(ValueError, match="duplicate domain"):
        dup = spark.createDataFrame(
            [("a", 1.0), ("a", 0.5)], "domain string, excess_loss double"
        )
        doremi_weights(dup)
    with pytest.raises(ValueError, match="empty"):
        doremi_weights(lam.filter(F.lit(False)))


def test_null_step_and_duplicate_cells_raise(spark):
    """Review r17: a NULL step cannot say WHEN its lambda applies
    (previously a raw TypeError in sorted()); duplicate (step,
    domain) cells would be silently last-wins by collect order —
    both must refuse loudly like the no-step duplicate path."""
    null_step = spark.createDataFrame(
        [(None, "a", 1.0), (0, "b", 0.5)],
        "step long, domain string, excess_loss double",
    )
    with pytest.raises(ValueError, match="NULL step"):
        doremi_weights(null_step, step_col="step")
    dup = spark.createDataFrame(
        [(0, "a", 1.0), (0, "a", 0.5)],
        "step long, domain string, excess_loss double",
    )
    with pytest.raises(ValueError, match="duplicate \\(step, domain\\)"):
        doremi_weights(dup, step_col="step")


def test_smoothing_zero_survives_weight_collapse(spark):
    """Review r17: smoothing=0 is allowed by the validator, and a
    domain whose weight underflows to exactly 0 (exp(-5000)) must
    stay collapsed across later steps — not crash the fold with
    log(0) -> math domain error."""
    lam = spark.createDataFrame(
        [("a", 5000.0), ("b", 0.0)], "domain string, excess_loss double"
    )
    got = {
        r["domain"]: r
        for r in doremi_weights(lam, lr=1.0, smoothing=0.0, n_iter=3).collect()
    }
    assert got["a"]["final_weight"] == pytest.approx(1.0)
    assert got["b"]["final_weight"] == 0.0
    assert all(math.isfinite(g["weight"]) for g in got.values())
    assert sum(g["weight"] for g in got.values()) == pytest.approx(1.0)
