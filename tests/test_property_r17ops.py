"""Hypothesis property tests for the r17 operator tier (the
test_property_r16ops.py cadence): the per-module differentials use
fixed seeds; these let hypothesis drive the inputs (with shrinking)
over the invariants that must hold for EVERY input:

- lenbatch: conservation, the batch-size bound, pad arithmetic
  (pad_to = batch max, pad >= 0), the at-most-one-remainder law, and
  length order never padding MORE than the hash baseline (the
  economics inequality is universal, not fixture luck),
- doremi: simplex normalization, the smoothing floor, and weight
  monotonicity in excess loss for arbitrary lambda vectors (pure
  driver fold — affords many examples),
- epochs: the exact output-size law sum_g (floor(e_g)*n_g + draws)
  and the within-integer-part nesting law,
- best_of_n: rank bounds, per-prompt cap, and threshold filtering
  over arbitrary score multisets.

Spark examples are capped low (each example is a Spark job); the
doremi fold property runs driver-side and affords more.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.lenbatch import (
    bucketed_batches,
    padding_report,
)

_spark_settings = settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)


@_spark_settings
@given(
    lengths=st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=60),
    batch_size=st.integers(min_value=1, max_value=9),
)
def test_lenbatch_invariants(spark, lengths, batch_size):
    df = spark.createDataFrame(
        list(enumerate(lengths)), "doc_id long, n_tokens long"
    )
    out = bucketed_batches(df, batch_size=batch_size, shard_hex=0).collect()
    assert len(out) == len(lengths)  # conservation
    by_batch: dict = {}
    for r in out:
        assert 0 <= r["pad"] == r["pad_to"] - r["n_tokens"]
        by_batch.setdefault((r["bucket"], r["batch_idx"]), []).append(r)
    for rows in by_batch.values():
        assert len(rows) <= batch_size
        assert all(
            r["pad_to"] == max(x["n_tokens"] for x in rows) for r in rows
        )
        flags = {r["is_remainder"] for r in rows}
        assert len(flags) == 1  # batch-uniform flag
    # at most one remainder per bucket
    rem = {
        b for (b, _), rows in by_batch.items() if rows[0]["is_remainder"]
    }
    assert all(
        sum(
            1
            for (b2, _), rows in by_batch.items()
            if b2 == b and rows[0]["is_remainder"]
        )
        == 1
        for b in rem
    )
    # economics: sorted-by-length never pads more than the hash
    # baseline — TRUE ONLY when every bucket fills its batches evenly
    # (consecutive sorted chunks minimize the sum of batch maxima for
    # equal-size groups). With a tail remainder the claim is FALSE in
    # general: hypothesis found lengths [1, 1, 2048, 2218, 2385] at
    # batch_size 2, where sorted pairs (2048, 2218) and leaves 2385
    # as the remainder (pad 170) while an order pairing the two
    # largest pads only 167 — so the comparison is asserted on the
    # evenly-filled cases hypothesis generates (batch_size=1 always
    # qualifies) and skipped otherwise (r18: the original
    # unconditional assert was an overclaim in the test, not a
    # lenbatch behavior change).
    from collections import Counter

    per_bucket = Counter(r["bucket"] for r in out)
    if all(n % batch_size == 0 for n in per_bucket.values()):
        w_len = padding_report(
            bucketed_batches(df, batch_size=batch_size, shard_hex=0)
        ).head()
        w_hash = padding_report(
            bucketed_batches(
                df, batch_size=batch_size, shard_hex=0, order="hash"
            )
        ).head()
        assert w_len["pad_tokens"] <= w_hash["pad_tokens"]


@settings(max_examples=40, deadline=None)
@given(
    lams=st.lists(
        st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
        min_size=2,
        max_size=8,
    ),
    lr=st.floats(min_value=0.01, max_value=5.0, allow_nan=False),
    smoothing=st.floats(min_value=0.0, max_value=0.5, allow_nan=False),
    n_iter=st.integers(min_value=1, max_value=4),
)
def test_doremi_fold_invariants(spark, lams, lr, smoothing, n_iter):
    from utc_cuip_kafka_aws_connector_spark.operators.doremi import (
        doremi_weights,
    )

    lam = spark.createDataFrame(
        [(f"d{i:02d}", v) for i, v in enumerate(lams)],
        "domain string, excess_loss double",
    )
    got = {
        r["domain"]: r
        for r in doremi_weights(
            lam, lr=lr, smoothing=smoothing, n_iter=n_iter
        ).collect()
    }
    k = len(lams)
    assert math.isclose(sum(g["weight"] for g in got.values()), 1.0, abs_tol=1e-9)
    assert math.isclose(
        sum(g["final_weight"] for g in got.values()), 1.0, abs_tol=1e-9
    )
    floor = smoothing / k
    assert all(g["final_weight"] >= floor - 1e-12 for g in got.values())
    # monotone: strictly larger lambda never gets a smaller weight
    pairs = sorted(
        ((lams[i], got[f"d{i:02d}"]["weight"]) for i in range(k)),
    )
    for (l1, w1), (l2, w2) in zip(pairs, pairs[1:]):
        if l2 > l1:
            assert w2 >= w1 - 1e-12


@_spark_settings
@given(
    epochs=st.floats(min_value=0.0, max_value=4.0, allow_nan=False),
    n=st.integers(min_value=1, max_value=40),
)
def test_epochs_size_law_and_nesting(spark, epochs, n):
    from utc_cuip_kafka_aws_connector_spark.operators.epochs import (
        materialize_epochs,
    )

    df = spark.createDataFrame(
        [(i, "g") for i in range(n)], "doc_id long, lang string"
    )
    alloc = spark.createDataFrame(
        [("g", float(epochs))], "lang string, epochs double"
    )
    rows = materialize_epochs(df, alloc).collect()
    flr = int(epochs)
    assert flr * n <= len(rows) <= (flr + 1) * n
    # nesting within the integer part: e vs min(e + 0.2, next int)
    bump = min(epochs + 0.2, float(flr + 1) - 1e-9)
    if bump > epochs:
        alloc2 = spark.createDataFrame(
            [("g", bump)], "lang string, epochs double"
        )
        got1 = {(r["doc_id"], r["replica"]) for r in rows}
        got2 = {
            (r["doc_id"], r["replica"])
            for r in materialize_epochs(df, alloc2).collect()
        }
        assert got1 <= got2


@_spark_settings
@given(
    scores=st.lists(
        st.floats(min_value=-5, max_value=5, allow_nan=False),
        min_size=1,
        max_size=30,
    ),
    n=st.integers(min_value=1, max_value=4),
    thr=st.floats(min_value=-6, max_value=6, allow_nan=False),
)
def test_best_of_n_invariants(spark, scores, n, thr):
    from utc_cuip_kafka_aws_connector_spark.operators.prefpairs import (
        best_of_n,
    )

    df = spark.createDataFrame(
        [(f"p{i % 3}", i, s) for i, s in enumerate(scores)],
        "prompt_id string, response_id long, score double",
    )
    got = best_of_n(df, n=n, min_score=thr).collect()
    by_prompt: dict = {}
    for r in got:
        assert r["score"] >= thr
        assert 1 <= r["rank"] <= n
        by_prompt.setdefault(r["prompt"], []).append(r)
    for rows in by_prompt.values():
        assert len(rows) <= n
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
        # winners are exactly the top of the eligible multiset
        ordered = sorted(rows, key=lambda r: r["rank"])
        for a, b in zip(ordered, ordered[1:]):
            assert (a["score"], -a["response_id"]) >= (b["score"], -b["response_id"])
    # total kept == per-prompt min(n, eligible)
    elig: dict = {}
    for i, s in enumerate(scores):
        if s >= thr:
            elig[f"p{i % 3}"] = elig.get(f"p{i % 3}", 0) + 1
    assert len(got) == sum(min(n, c) for c in elig.values())
