"""operators/calibration.py: PR curves + threshold pickers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.calibration import (
    pr_curve,
    threshold_for_keep_rate,
    threshold_for_precision,
    threshold_for_recall,
)

# scores descending: labels 1,1,0,1,0,0 -> hand curve
ROWS = [
    (0, 0.9, True),
    (1, 0.8, True),
    (2, 0.7, False),
    (3, 0.5, True),
    (4, 0.3, False),
    (5, 0.1, False),
]


@pytest.fixture(scope="module")
def curve(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, log_odds double, good boolean")
    return pr_curve(df, "good")


def test_hand_computed_curve(curve):
    pts = {r.threshold: (r.kept, r.precision, r.recall, r.keep_rate)
           for r in curve.collect()}
    assert pts[0.9] == (1, 1.0, pytest.approx(1 / 3), pytest.approx(1 / 6))
    assert pts[0.8] == (2, 1.0, pytest.approx(2 / 3), pytest.approx(2 / 6))
    assert pts[0.7] == (3, pytest.approx(2 / 3), pytest.approx(2 / 3), 0.5)
    assert pts[0.5] == (4, 0.75, 1.0, pytest.approx(4 / 6))
    assert pts[0.1][0] == 6 and pts[0.1][1] == 0.5


def test_precision_picker_maximizes_recall(curve):
    got = threshold_for_precision(curve, 0.75)
    # both 0.8 (precision 1.0) and 0.5 (0.75) qualify; most permissive wins
    assert got["threshold"] == 0.5 and got["target_met"]
    assert got["recall"] == 1.0
    strict = threshold_for_precision(curve, 0.99)
    assert strict["threshold"] == 0.8 and strict["target_met"]
    impossible = threshold_for_precision(curve, 1.01)
    assert not impossible["target_met"] and impossible["threshold"] == 0.9


def test_recall_and_keep_rate_pickers(curve):
    r = threshold_for_recall(curve, 0.66)
    assert r["threshold"] == 0.8 and r["target_met"]  # strictest meeting 2/3
    k = threshold_for_keep_rate(curve, 0.5)
    assert k["threshold"] == 0.7 and k["target_met"]
    assert k["keep_rate"] == 0.5


def test_ties_collapse_to_achievable_points(spark):
    df = spark.createDataFrame(
        [(0, 1.0, True), (1, 1.0, False), (2, 0.5, True)],
        "doc_id long, log_odds double, good boolean",
    )
    pts = pr_curve(df, "good").collect()
    assert [r.threshold for r in pts] == [1.0, 0.5]
    assert pts[0].kept == 2  # the tied pair is indivisible


def test_end_to_end_with_nb_quality(spark):
    """The intended composition: calibrate nb_log_odds on a labeled
    holdout, then the chosen threshold really achieves its floor."""
    from utc_cuip_kafka_aws_connector_spark.operators.nbquality import (
        nb_log_odds,
        nb_train,
    )

    train = spark.createDataFrame(
        [(i, "clean fluent prose text " * 3, "keep") for i in range(25)]
        + [(50 + i, "spam junk click buy " * 3, "drop") for i in range(25)],
        "doc_id long, text string, label string",
    )
    model = nb_train(train, label_col="label")
    holdout = spark.createDataFrame(
        [(100 + i, "clean fluent prose words " * 2, True) for i in range(20)]
        + [(200 + i, "junk click noise buy " * 2, False) for i in range(20)]
        + [(300, "prose junk mixed words text", True)],
        "doc_id long, text string, good boolean",
    )
    scored = nb_log_odds(holdout, model, "keep").join(
        holdout.select("doc_id", "good"), "doc_id"
    )
    curve = pr_curve(scored, "good")
    pick = threshold_for_precision(curve, 0.95)
    assert pick["target_met"]
    kept = scored.filter(F.col("log_odds") >= pick["threshold"])
    stats = kept.agg(
        F.avg(F.col("good").cast("double")).alias("precision")
    ).first()
    assert stats.precision >= 0.95


def test_validation(spark):
    empty = spark.createDataFrame([], "doc_id long, log_odds double, good boolean")
    with pytest.raises(ValueError, match="empty"):
        pr_curve(empty, "good")
    allneg = spark.createDataFrame(
        [(0, 1.0, False)], "doc_id long, log_odds double, good boolean"
    )
    with pytest.raises(ValueError, match="no positive"):
        pr_curve(allneg, "good")
