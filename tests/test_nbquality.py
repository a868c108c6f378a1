"""operators/nbquality.py: hashed multinomial Naive Bayes.

Evidence grade: differential against an independent pure-Python NB
on the SAME hashed features (hashing is shared preprocessing — the
counting and log math are what's independently reimplemented), plus
the separability / fallback / filter-shape properties and a JVM-only
plan assertion.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.nbquality import (
    _features,
    nb_log_odds,
    nb_predict,
    nb_score,
    nb_train,
)

SF = "/root/testdata/sf0.001"
N_FEAT = 1 << 12


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang"
    )


@pytest.fixture(scope="module")
def model(docs):
    return nb_train(docs, label_col="lang", n_features=N_FEAT, alpha=1.0)


@pytest.fixture(scope="module")
def hashed(docs):
    """(doc_id, lang, features) with the SAME hashed features the
    operator uses — the shared preprocessing both sides consume."""
    return (
        docs.select("doc_id", "lang", _features("text", N_FEAT).alias("f"))
        .collect()
    )


def _reference(hashed, alpha=1.0, n_features=N_FEAT):
    """Independent NB: dict counting + math.log, no Spark."""
    counts: dict[str, Counter] = defaultdict(Counter)
    n_docs: Counter = Counter()
    for r in hashed:
        n_docs[r.lang] += 1
        counts[r.lang].update(r.f)
    n_total = sum(n_docs.values())
    totals = {l: sum(c.values()) for l, c in counts.items()}

    def score(feats, label):
        denom = math.log(totals[label] + alpha * n_features)
        s = math.log(n_docs[label]) - math.log(n_total)
        for f in feats:
            s += math.log(counts[label][f] + alpha) - denom
        return s

    return score, sorted(n_docs)


def test_scores_match_pure_python_reference(model, docs, hashed):
    score, labels = _reference(hashed)
    got = {
        (r.doc_id, r.label): r.score
        for r in nb_score(docs, model).collect()
    }
    assert len(got) == len(hashed) * len(labels)
    for r in hashed:
        for lab in labels:
            want = score(r.f, lab)
            assert got[(r.doc_id, lab)] == pytest.approx(want, rel=1e-9)


def test_predictions_match_reference_argmax(model, docs, hashed):
    score, labels = _reference(hashed)
    want = {
        r.doc_id: min(labels, key=lambda l: (-score(r.f, l), l))
        for r in hashed
    }
    got = {r.doc_id: r.predicted for r in nb_predict(docs, model).collect()}
    assert got == want


def test_separable_corpus_trains_to_perfect_accuracy(spark):
    rows = [(i, "alpha beta gamma " * 3, "good") for i in range(30)] + [
        (i + 30, "zap qux noise " * 3, "bad") for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    m = nb_train(df, label_col="lang", n_features=N_FEAT)
    pred = nb_predict(df, m).collect()
    assert all(
        (r.predicted == "good") == (r.doc_id < 30) for r in pred
    ) and len(pred) == 60


def test_unseen_tokens_fall_back_to_smoothing(spark, model):
    df = spark.createDataFrame(
        [(999999, "zzzzqq wwwwxx unseen-token-xyzzy")],
        "doc_id long, text string",
    )
    rows = nb_score(df, model).collect()
    assert rows and all(math.isfinite(r.score) for r in rows)
    # all-unseen docs are decided purely by prior + per-label unseen
    # mass; predict still returns exactly one deterministic label
    assert nb_predict(df, model).count() == 1


def test_log_odds_separates_keep_from_drop(spark):
    rows = [(i, "clean prose sentence " * 4, "keep") for i in range(25)] + [
        (i + 25, "spam junk garbled " * 4, "drop") for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    m = nb_train(df, label_col="lang", n_features=N_FEAT)
    odds = {r.doc_id: r.log_odds for r in nb_log_odds(df, m, "keep").collect()}
    assert all((odds[i] > 0) == (i < 25) for i in odds) and len(odds) == 50


def test_score_plan_is_jvm_only(docs, model):
    plan = (
        nb_score(docs, model)._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_alpha_validation(docs):
    with pytest.raises(ValueError, match="alpha"):
        nb_train(docs, alpha=0.0)


def test_token_logprob_ranks_reference_like_text_higher(spark):
    """Single-label perplexity-proxy: docs made of reference vocab
    score a higher per-token logprob than out-of-domain docs, the
    score is length-normalized, and empty docs come back null."""
    ref = [(i, "clean prose sentence words flow " * 4, "ref") for i in range(30)]
    m = nb_train(
        spark.createDataFrame(ref, "doc_id long, text string, lang string"),
        label_col="lang",
        n_features=N_FEAT,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.nbquality import (
        nb_token_logprob,
    )

    probe = spark.createDataFrame(
        [
            (1, "clean prose sentence"),
            (2, "clean prose sentence " * 20),  # same content, 20x longer
            (3, "zorp blag unknown gibberish"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in nb_token_logprob(probe, m, "ref").collect()}
    assert got[1].logprob_per_token > got[3].logprob_per_token
    assert got[2].logprob_per_token == pytest.approx(
        got[1].logprob_per_token, rel=1e-9
    )  # length-normalized
    assert got[4].n_tokens == 0 and got[4].logprob_per_token is None
    assert got[2].n_tokens == 60


def test_empty_docs_get_prior_only_rows_everywhere(spark):
    """ADVICE r8 regression pin: zero-token docs must not vanish from
    nb_score / nb_predict / nb_log_odds (the CLI classify command was
    writing fewer rows than the input corpus). An empty doc's
    log-joint is exactly the class prior — an empty likelihood
    product — so it predicts the majority-prior class."""
    import math

    from utc_cuip_kafka_aws_connector_spark.operators.nbquality import (
        nb_log_odds,
        nb_predict,
        nb_score,
        nb_train,
    )

    train = spark.createDataFrame(
        [(0, "good words here", "keep")] * 3 + [(1, "bad stuff", "drop")],
        "doc_id long, text string, label string",
    )
    model = nb_train(train, label_col="label")
    docs = spark.createDataFrame(
        [(10, "good words"), (11, ""), (12, "   ")],
        "doc_id long, text string",
    )
    scores = nb_score(docs, model)
    assert scores.count() == 3 * 2  # every id x every label
    pred = {r.doc_id: r for r in nb_predict(docs, model).collect()}
    assert set(pred) == {10, 11, 12}
    # empty docs score prior-only: majority class wins, score == log prior
    assert pred[11].predicted == "keep"
    assert pred[11].score == pytest.approx(math.log(3 / 4))
    odds = {r.doc_id: r.log_odds for r in nb_log_odds(docs, model, "keep").collect()}
    assert set(odds) == {10, 11, 12}
    assert odds[11] == pytest.approx(math.log(3 / 4) - math.log(1 / 4))
