"""DSIR importance resampling (operators/dsir.py): math parity
against a numpy reference on Spark-extracted features, selection
properties, Gumbel determinism.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.dsir import (
    dsir_fit,
    dsir_resample,
    dsir_select,
    dsir_weights,
    hashed_ngram_features,
)

N_BUCKETS = 64

TARGET = [
    "the cat sat on the mat",
    "a cat and a dog",
    "the cat ate the fish",
    "cats love fish and naps",
]
RAW = [
    ("r1", "the cat sat on a mat"),              # very target-like
    ("r2", "stock prices fell sharply today"),   # off-domain
    ("r3", "fish and cats and dogs"),            # target-like
    ("r4", "quarterly earnings beat forecasts"), # off-domain
    ("r5", ""),                                  # empty
    ("r6", "the the the the the the"),
]


@pytest.fixture(scope="module")
def target_df(spark):
    return spark.createDataFrame([(t,) for t in TARGET], "text string")


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(RAW, "doc_id string, text string")


def test_features_count_unigrams_and_bigrams(spark):
    df = spark.createDataFrame(
        [("a", "x y x"), ("b", "z"), ("c", "")],
        "doc_id string, text string",
    )
    feats = hashed_ngram_features(df, n_buckets=N_BUCKETS).collect()
    per_doc = {}
    for r in feats:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["cnt"]
    # 3 unigrams + 2 bigrams; 1 unigram + 0 bigrams; nothing
    assert per_doc["a"] == 5
    assert per_doc["b"] == 1
    assert "c" not in per_doc


def test_weights_match_numpy_reference(target_df, raw_df, spark):
    """The hash is Spark's (arbitrary but shared); the MATH is
    verified: extract both histograms + per-doc features once, then
    recompute log-ratios and weights in Python at 1e-9."""
    alpha = 1.0
    model = dsir_fit(target_df, raw_df, n_buckets=N_BUCKETS, alpha=alpha)
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(raw_df, model, n_buckets=N_BUCKETS).collect()
    }

    def hist(df, id_col=None):
        cols = [id_col] if id_col else []
        f = hashed_ngram_features(
            df.select(
                *(cols or [F.lit("x").alias("doc_id")]), "text"
            ),
            id_col=id_col or "doc_id",
            n_buckets=N_BUCKETS,
        )
        return f.collect()

    t_hist = {}
    for r in hist(target_df):
        t_hist[r["bucket"]] = t_hist.get(r["bucket"], 0) + r["cnt"]
    r_hist = {}
    doc_feats = {}
    for r in hist(raw_df, "doc_id"):
        r_hist[r["bucket"]] = r_hist.get(r["bucket"], 0) + r["cnt"]
        doc_feats.setdefault(r["doc_id"], {})[r["bucket"]] = r["cnt"]

    t_tot, r_tot = sum(t_hist.values()), sum(r_hist.values())

    def log_ratio(b):
        return (
            math.log(t_hist.get(b, 0) + alpha)
            - math.log(t_tot + alpha * N_BUCKETS)
        ) - (
            math.log(r_hist.get(b, 0) + alpha)
            - math.log(r_tot + alpha * N_BUCKETS)
        )

    for doc_id, _ in RAW:
        want = sum(
            c * log_ratio(b)
            for b, c in doc_feats.get(doc_id, {}).items()
        )
        assert got[doc_id] == pytest.approx(want, rel=1e-9, abs=1e-9), doc_id


def test_target_like_docs_weigh_more(target_df, raw_df):
    model = dsir_fit(target_df, raw_df, n_buckets=N_BUCKETS)
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(raw_df, model, n_buckets=N_BUCKETS).collect()
    }
    assert w["r1"] > w["r2"]
    assert w["r3"] > w["r4"]
    assert w["r5"] == 0.0


def test_resample_is_deterministic_and_duplicate_free(
    target_df, raw_df
):
    model = dsir_fit(target_df, raw_df, n_buckets=N_BUCKETS)
    weighted = dsir_weights(raw_df, model, n_buckets=N_BUCKETS)
    a = [r["doc_id"] for r in dsir_resample(weighted, 3, seed=7).collect()]
    b = [r["doc_id"] for r in dsir_resample(weighted, 3, seed=7).collect()]
    assert a == b
    assert len(set(a)) == 3
    seeds = {
        tuple(
            r["doc_id"]
            for r in dsir_resample(weighted, 3, seed=s).collect()
        )
        for s in range(8)
    }
    assert len(seeds) > 1  # different seeds draw differently


def test_dominant_weight_always_selected(target_df, raw_df, spark):
    """A document whose softmax mass dwarfs the rest must appear in
    every draw (its key beats any competitor by ~log-weight gap >>
    Gumbel spread)."""
    weighted = spark.createDataFrame(
        [("big", 100.0)] + [(f"s{i}", 0.0) for i in range(20)],
        "doc_id string, log_weight double",
    )
    for s in range(10):
        sel = {r["doc_id"] for r in dsir_resample(weighted, 2, seed=s).collect()}
        assert "big" in sel, s


def test_select_composes(target_df, raw_df):
    out = dsir_select(target_df, raw_df, k=2, n_buckets=N_BUCKETS, seed=3)
    rows = out.collect()
    assert len(rows) == 2
    assert {"doc_id", "log_weight", "gumbel_key"} <= set(rows[0].asDict())


def test_parameter_validation(target_df, raw_df):
    with pytest.raises(ValueError, match="n_buckets"):
        hashed_ngram_features(raw_df, n_buckets=1)
    with pytest.raises(ValueError, match="n_max"):
        hashed_ngram_features(raw_df, n_max=0)
    with pytest.raises(ValueError, match="alpha"):
        dsir_fit(target_df, raw_df, alpha=0.0)
    model = dsir_fit(target_df, raw_df, n_buckets=N_BUCKETS)
    with pytest.raises(ValueError, match="k"):
        dsir_resample(dsir_weights(raw_df, model, n_buckets=N_BUCKETS), 0)


def test_plans_stay_jvm_side(target_df, raw_df):
    model = dsir_fit(target_df, raw_df, n_buckets=N_BUCKETS)
    weighted = dsir_weights(raw_df, model, n_buckets=N_BUCKETS)
    plan = weighted._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "InPandas"):
        assert node not in plan, node
    topk = dsir_resample(weighted, 2)
    plan2 = topk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan2
