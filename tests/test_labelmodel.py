"""operators/labelmodel.py: weak-supervision label model.

Evidence: exact numpy EM differential (same init, same update
rule, same clamps — parameters agree to 1e-7 after 25 corpus
iterations); planted-accuracy recovery without ground truth;
posterior labels beat majority vote when LF quality varies;
all-abstain rows score exactly the prior; integer-exact
coverage/overlap/conflict diagnostics; validation errors.
"""

from __future__ import annotations

import numpy as np
import pytest

from utc_cuip_kafka_aws_connector_spark.operators.labelmodel import (
    fit_label_model,
    label_posteriors,
    lf_summary,
    majority_vote,
)

ACCS = [0.9, 0.85, 0.75, 0.65, 0.55]
PROP = 0.7
N = 3000


def _votes_fixture():
    """Planted binary task: true y ~ Bernoulli(0.6) in {-1,+1}; each
    LF abstains w.p. 1-PROP, else votes y with its own accuracy."""
    rng = np.random.default_rng(23)
    y = np.where(rng.random(N) < 0.6, 1, -1)
    votes = np.zeros((N, len(ACCS)), dtype=np.int64)
    for k, a in enumerate(ACCS):
        active = rng.random(N) < PROP
        correct = rng.random(N) < a
        col = np.where(correct, y, -y)
        votes[:, k] = np.where(active, col, 0)
    return y, votes


def _df(spark, votes, with_id=False):
    rows = [
        ((i, [int(v) for v in row]) if with_id else ([int(v) for v in row],))
        for i, row in enumerate(votes)
    ]
    schema = (
        "doc_id long, votes array<int>" if with_id else "votes array<int>"
    )
    return spark.createDataFrame(rows, schema)


def _np_em(votes, n_iter=25, init_alpha=0.7, floor=1e-3):
    """Reference mirror of fit_label_model."""
    pi, alphas = 0.5, np.full(votes.shape[1], init_alpha)
    lo, hi = floor, 1.0 - floor
    for _ in range(n_iter):
        llr = np.log(alphas) - np.log1p(-alphas)
        logit = np.log(pi) - np.log1p(-pi) + votes @ llr
        p = 1.0 / (1.0 + np.exp(-logit))
        pi = min(max(float(p.mean()), lo), hi)
        for k in range(votes.shape[1]):
            nz = votes[:, k] != 0
            if nz.sum() > 0:
                c = p[votes[:, k] == 1].sum() + (
                    1.0 - p[votes[:, k] == -1]
                ).sum()
                alphas[k] = min(max(c / nz.sum(), lo), hi)
    return pi, alphas


def test_em_matches_numpy(spark):
    _, votes = _votes_fixture()
    params = fit_label_model(_df(spark, votes), n_iter=25)
    pi_np, alphas_np = _np_em(votes, n_iter=25)
    assert params["pi"] == pytest.approx(pi_np, abs=1e-7)
    for a, b in zip(params["alphas"], alphas_np):
        assert a == pytest.approx(b, abs=1e-7)


def test_recovers_planted_accuracies(spark):
    """No ground truth enters the fit, yet the learned accuracies
    land within 0.05 of the planted ones, in the planted order."""
    _, votes = _votes_fixture()
    params = fit_label_model(_df(spark, votes))
    assert params["pi"] == pytest.approx(0.6, abs=0.05)
    for got, true in zip(params["alphas"], ACCS):
        assert got == pytest.approx(true, abs=0.05)
    assert sorted(params["alphas"], reverse=True) == params["alphas"]


def test_posterior_beats_majority_vote(spark):
    y, votes = _votes_fixture()
    df = _df(spark, votes, with_id=True)
    params = fit_label_model(df)
    post = {
        r.doc_id: r.p_pos
        for r in label_posteriors(df, params).collect()
    }
    mv = {r.doc_id: r.mv_label for r in majority_vote(df).collect()}
    lm_acc = np.mean([(1 if post[i] > 0.5 else -1) == y[i] for i in range(N)])
    # ties/abstains score half credit for MV, the usual convention
    mv_acc = np.mean(
        [
            1.0 if mv[i] == y[i] else (0.5 if mv[i] is None else 0.0)
            for i in range(N)
        ]
    )
    assert lm_acc > mv_acc


def test_all_abstain_scores_prior(spark):
    df = _df(spark, np.zeros((4, 3), dtype=np.int64))
    out = label_posteriors(
        df, {"pi": 0.37, "alphas": [0.8, 0.7, 0.6]}
    ).collect()
    assert all(r.p_pos == pytest.approx(0.37, abs=1e-12) for r in out)


def test_lf_summary_integer_exact(spark):
    df = spark.createDataFrame(
        [([1, -1, 0, 0],), ([1, 1, 0, 0],), ([0, 0, 0, 0],), ([-1, 0, 1, 0],)],
        "votes array<int>",
    )
    rows = {r.lf: r for r in lf_summary(df).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    # an always-abstaining LF still gets a row, all zeros
    assert (rows[3].coverage, rows[3].overlaps, rows[3].conflicts) == (
        0.0, 0.0, 0.0,
    )
    assert (rows[0].coverage, rows[0].overlaps, rows[0].conflicts) == (
        0.75, 0.75, 0.5,
    )
    assert (rows[1].coverage, rows[1].overlaps, rows[1].conflicts) == (
        0.5, 0.5, 0.25,
    )
    assert (rows[2].coverage, rows[2].overlaps, rows[2].conflicts) == (
        0.25, 0.25, 0.25,
    )


def test_validation(spark):
    ok = _df(spark, np.array([[1, 0], [0, -1]]))
    with pytest.raises(ValueError, match="n_iter"):
        fit_label_model(ok, n_iter=0)
    with pytest.raises(ValueError, match="init_alpha"):
        fit_label_model(ok, init_alpha=1.0)
    ragged = spark.createDataFrame(
        [([1, 0],), ([1],)], "votes array<int>"
    )
    with pytest.raises(ValueError, match="length 2"):
        fit_label_model(ragged)
    bad_domain = spark.createDataFrame([([2, 0],)], "votes array<int>")
    with pytest.raises(ValueError, match="-1, 0, 1"):
        fit_label_model(bad_domain)
    null_votes = spark.createDataFrame(
        [([1, 0],), (None,)], "votes array<int>"
    )
    with pytest.raises(ValueError, match="length 2"):
        fit_label_model(null_votes)
    with pytest.raises(ValueError, match="empty"):
        fit_label_model(ok.limit(0))
    with pytest.raises(ValueError, match="length 2"):
        label_posteriors(ragged, {"pi": 0.5, "alphas": [0.7, 0.7]})
    # validate=False: corpus-scale path scores without the check
    assert (
        label_posteriors(
            ragged, {"pi": 0.5, "alphas": [0.7, 0.7]}, validate=False
        ).count()
        == 2
    )
