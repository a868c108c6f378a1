"""operators/drift.py: distribution drift between table versions.

Evidence: zero drift on identical data, closed-form PSI on a
constructed two-bin shift, monotonicity in shift size, out-of-range
mass charged to drift, JS bounds/symmetry, and the report verdicts.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.drift import (
    jensen_shannon,
    numeric_drift,
    psi,
)

SF = "/root/testdata/sf0.01"


def test_identical_data_has_no_drift(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    rep = numeric_drift(orders, orders, ["o_totalprice", "o_custkey"]).collect()
    for r in rep:
        assert r.psi == pytest.approx(0.0, abs=1e-9)
        assert r.js == pytest.approx(0.0, abs=1e-9)
        assert r.verdict == "stable"


def test_closed_form_two_bin_shift():
    # 70/30 -> 50/50: psi = (0.5-0.7)ln(0.5/0.7) + (0.5-0.3)ln(0.5/0.3)
    want = (0.5 - 0.7) * math.log(0.5 / 0.7) + (0.5 - 0.3) * math.log(0.5 / 0.3)
    assert psi([0.7, 0.3], [0.5, 0.5]) == pytest.approx(want)
    assert psi([0.7, 0.3], [0.7, 0.3]) == 0.0
    with pytest.raises(ValueError, match="bin mismatch"):
        psi([0.5, 0.5], [1.0])


def test_js_bounds_and_symmetry():
    p, q = [0.9, 0.1, 0.0], [0.1, 0.1, 0.8]
    assert 0 < jensen_shannon(p, q) <= math.log(2) + 1e-12
    assert jensen_shannon(p, q) == pytest.approx(jensen_shannon(q, p))
    assert jensen_shannon([1.0, 0.0], [0.0, 1.0]) == pytest.approx(math.log(2))


def test_drift_grows_with_shift_and_flags_verdicts(spark):
    ref = spark.range(20_000).select((F.col("id") % 100).alias("v"))
    small = ref.select((F.col("v") + 3).alias("v"))
    big = ref.select((F.col("v") * 4 + 150).alias("v"))
    r_small = numeric_drift(ref, small, ["v"]).first()
    r_big = numeric_drift(ref, big, ["v"]).first()
    assert 0 < r_small.psi < r_big.psi
    assert r_big.verdict == "major"


def test_out_of_range_mass_is_charged(spark):
    """Current data entirely above the reference range: everything
    lands in the overflow bin -> maximal, not hidden, drift."""
    ref = spark.range(1000).select((F.col("id") % 10).alias("v"))
    cur = spark.range(1000).select((F.col("id") % 10 + 1000).alias("v"))
    r = numeric_drift(ref, cur, ["v"]).first()
    assert r.psi > 1.0 and r.verdict == "major"


def test_empty_reference_column_raises(spark):
    ref = spark.createDataFrame([(None,)], "v double")
    cur = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="non-null"):
        numeric_drift(ref, cur, ["v"]).collect()


def test_null_rate_is_its_own_metric_not_phantom_bin_drift(spark):
    """ADVICE r8 regression pin: two sides with IDENTICAL value
    distributions but different null rates must read psi == js == 0
    (masses are conditional on non-null and sum to 1) while the
    null-rate columns expose the actual movement."""
    vals = [(float(i % 10),) for i in range(1000)]
    ref = spark.createDataFrame(vals + [(None,)] * 50, "v double")
    cur = spark.createDataFrame(vals + [(None,)] * 500, "v double")
    r = numeric_drift(ref, cur, ["v"]).first()
    assert r.psi == pytest.approx(0.0, abs=1e-9)
    assert r.js == pytest.approx(0.0, abs=1e-9)
    assert r.verdict == "stable"
    assert r.null_rate_ref == pytest.approx(50 / 1050)
    assert r.null_rate_cur == pytest.approx(500 / 1500)
