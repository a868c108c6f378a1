"""Streaming perplexity monitor (streaming/pplmon.py): replay
equivalence with batch scoring, drift detection across windows, the
map_oov=False identity that makes the streaming path honest.
"""

from __future__ import annotations

import datetime
import os
import random

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
    kn_score,
    kn_token_logprobs,
    kn_train,
)
from utc_cuip_kafka_aws_connector_spark.streaming.pplmon import (
    streaming_window_ppl,
)

T0 = datetime.datetime(2026, 1, 1, 0, 0, 0)

DOMAIN = ["the", "cat", "dog", "sat", "ran", "house", "tree", "fish"]


def _doc(seed, words=DOMAIN, n=12):
    r = random.Random(seed)
    return " ".join(r.choice(words) for _ in range(n))


def _rows(minute, seeds, words=DOMAIN):
    ts = T0 + datetime.timedelta(minutes=minute)
    return [(ts, _doc(s, words)) for s in seeds]


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame(
        [(_doc(1000 + i),) for i in range(60)], "text string"
    )
    return kn_train(train, order=2)


@pytest.fixture(scope="module")
def world(spark, model, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pplmon")
    junk = ["zxq", "wvvt", "mmrk", "plff", "qqd", "hzzt", "bnn", "ttw"]
    batches = [
        _rows(1, range(40)),                 # window 1: in-domain
        _rows(11, range(40), words=junk),    # window 2: drifted
        [(T0 + datetime.timedelta(minutes=40), "the")],  # sentinel
    ]
    src = str(tmp / "in")
    os.makedirs(src, exist_ok=True)
    for i, b in enumerate(batches):
        spark.createDataFrame(b, "ts timestamp, text string").coalesce(
            1
        ).write.parquet(f"{src}/b{i}")
    stream = (
        spark.readStream.schema("ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        streaming_window_ppl(stream, model, window="10 minutes")
        .writeStream.format("memory")
        .queryName("pplmon")
        .outputMode("append")
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return batches, spark.sql("SELECT * FROM pplmon ORDER BY window_start")


def test_drift_raises_window_perplexity(world):
    _, out = world
    rows = out.collect()
    assert len(rows) == 2
    w1, w2 = rows
    assert w1["window_start"].minute == 0
    assert w2["window_start"].minute == 10
    assert w2["ppl"] > 5 * w1["ppl"]  # junk window drifts hard


def test_windows_equal_batch_scoring(spark, model, world):
    """Replay == batch: each emitted window's (n_tokens, log10_prob)
    must equal kn_score summed over that window's documents."""
    batches, out = world
    got = {r["window_start"].minute: r for r in out.collect()}
    for minute, batch in ((0, batches[0]), (10, batches[1])):
        df = spark.createDataFrame(
            [(i, t) for i, (_, t) in enumerate(batch)],
            "doc_id long, text string",
        )
        want = kn_score(df, model).agg(
            F.sum("n_tokens").alias("n"), F.sum("log10_prob").alias("lp")
        ).collect()[0]
        row = got[minute]
        assert row["n_tokens"] == want["n"], minute
        assert row["log10_prob"] == pytest.approx(
            want["lp"], rel=1e-9
        ), minute
        assert row["ppl"] == pytest.approx(
            10.0 ** (-want["lp"] / want["n"]), rel=1e-9
        )


def test_map_oov_false_identity_for_closed_vocab(spark, model):
    """The contract the monitor rests on: for min_count=1 models the
    unmapped scoring path gives bit-for-bit the same per-doc totals
    as kn_score, OOV tokens included."""
    df = spark.createDataFrame(
        [
            (0, _doc(7)),
            (1, "the zzzz cat qqqq"),   # OOV tokens
            (2, ""),
        ],
        "doc_id long, text string",
    )
    direct = {
        r["doc_id"]: (r["n_tokens"], r["log10_prob"])
        for r in kn_score(df, model).collect()
    }
    unmapped = {
        r["doc_id"]: (r["n"], r["lp"])
        for r in kn_token_logprobs(
            df, model, carry_cols=["doc_id"], map_oov=False
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("lp").alias("lp"))
        .collect()
    }
    assert set(direct) == set(unmapped)
    for d in direct:
        assert unmapped[d][0] == direct[d][0], d
        assert unmapped[d][1] == pytest.approx(
            direct[d][1], rel=1e-12
        ), d


def test_open_vocab_model_refused(spark, tmp_path):
    train = spark.createDataFrame(
        [(_doc(i),) for i in range(30)], "text string"
    )
    open_v = kn_train(train, order=2, min_count=2)
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    stream = spark.readStream.schema("ts timestamp, text string").parquet(
        src
    )
    with pytest.raises(ValueError, match="min_count=1"):
        streaming_window_ppl(stream, open_v)


def test_carry_col_validation(spark, model):
    df = spark.createDataFrame([(0, 1, "x")], "a long, b long, text string")
    with pytest.raises(ValueError, match="carry"):
        kn_token_logprobs(df, model, carry_cols=["a", "b"], map_oov=True)
