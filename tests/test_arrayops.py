"""operators/arrayops.py — the shared sliding-window gram kernel
(r14, extracted while fixing the higher-order-lambda re-evaluation
trap measured at 10-20x on langid/ngramlm gram builders)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.arrayops import (
    sliding_grams,
)


def test_sliding_grams_semantics(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "d"]), (2, ["x"]), (3, []), (4, ["p", "q"])],
        "i long, arr array<string>",
    )
    got = {
        r.i: (r.g1, r.g2, r.g3)
        for r in df.select(
            "i",
            sliding_grams(F.col("arr"), 1).alias("g1"),
            sliding_grams(F.col("arr"), 2).alias("g2"),
            sliding_grams(F.col("arr"), 3, sep="").alias("g3"),
        ).collect()
    }
    assert got[1] == (
        ["a", "b", "c", "d"],
        ["a b", "b c", "c d"],
        ["abc", "bcd"],
    )
    assert got[2] == (["x"], [], [])
    assert got[3] == ([], [], [])
    assert got[4] == (["p", "q"], ["p q"], [])
    with pytest.raises(ValueError, match="n must be"):
        sliding_grams(F.col("arr"), 0)


def test_sliding_grams_matches_python_windows(spark):
    """Randomized differential vs the obvious Python windowing."""
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.choice("abcde") for _ in range(rng.randrange(0, 12))])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "i long, arr array<string>")
    for n in (2, 3, 5):
        got = {
            r.i: r.g
            for r in df.select(
                "i", sliding_grams(F.col("arr"), n).alias("g")
            ).collect()
        }
        for i, arr in rows:
            want = [
                " ".join(arr[j : j + n]) for j in range(len(arr) - n + 1)
            ]
            assert got[i] == want, (i, arr, n)


def test_null_array_propagates_and_callers_coalesce(spark):
    """sliding_grams propagates a NULL array (contract); the word
    n-gram callers coalesce null text to their pre-r14 conventions
    (review r14): decontam -> [], setjoin shingles -> [""]."""
    from utc_cuip_kafka_aws_connector_spark.operators.decontam import (
        word_ngrams,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.setjoin import (
        shingle_sets,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "a b c d")], "doc_id long, text string"
    )
    dec = {r.doc_id: r.g for r in df.select(
        "doc_id", word_ngrams("text", 3).alias("g")).collect()}
    assert dec[1] == []
    assert dec[2] == ["a b c", "b c d"]
    sh = {r.id: r.toks for r in shingle_sets(df, n=3).collect()}
    assert sh[1] == [""]
    assert sh[2] == ["a b c", "b c d"]
