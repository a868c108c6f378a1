"""Hypothesis property tests (SURVEY §5.2 item 5) for the custom join
operators: the scalable formulations (bucketized interval join, union-
trick as-of join) must agree with brute-force reference semantics on
arbitrary small inputs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.asof import asof_join
from utc_cuip_kafka_aws_connector_spark.operators.ranges import interval_join

BASE_MS = 1_700_000_000_000  # fixed epoch anchor

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=900_000),  # ts offset ms
    ),
    min_size=1,
    max_size=25,
)


def to_df(spark, data, key_name, ts_name, id_name):
    rows_ = [(i, k, BASE_MS + off) for i, (k, off) in enumerate(data)]
    return spark.createDataFrame(rows_, f"{id_name} long, {key_name} int, _ms long").withColumn(
        ts_name, F.timestamp_millis(F.col("_ms"))
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=rows, right=rows)
def test_interval_join_matches_bruteforce(spark, left, right):
    lo, hi = 0, 120_000  # (ts, ts+2min]
    ldf = to_df(spark, left, "k", "l_ts", "l_id").drop("_ms")
    rdf = to_df(spark, right, "k", "r_ts", "r_id").drop("_ms")
    got = {
        (r["l_id"], r["r_id"])
        for r in interval_join(ldf, rdf, "k", "l_ts", "r_ts", lo, hi).collect()
    }
    expected = {
        (li, ri)
        for li, (lk, loff) in enumerate(left)
        for ri, (rk, roff) in enumerate(right)
        if lk == rk and loff + lo < roff <= loff + hi
    }
    assert got == expected


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=rows, right=rows)
def test_asof_join_matches_bruteforce(spark, left, right):
    ldf = to_df(spark, left, "k", "ts", "l_id").drop("_ms")
    rdf = to_df(spark, right, "k", "r_ts", "r_id").select(
        "k", "r_ts", F.unix_millis("r_ts").alias("r_ms")
    )
    got = {
        r["l_id"]: r["last_r_ms"]
        for r in asof_join(
            ldf, rdf, key="k", left_ts="ts", right_ts="r_ts",
            value_col="r_ms", value_alias="last_r_ms",
        ).collect()
    }
    for li, (lk, loff) in enumerate(left):
        prior = [roff for (rk, roff) in right if rk == lk and roff <= loff]
        expected = BASE_MS + max(prior) if prior else None
        assert got[li] == expected, f"left row {li}"
