"""operators/projection.py: distributed PCA / whitening.

Evidence grade: differential vs a straight numpy PCA on the same
collected vectors (the fit must agree with the single-node ground
truth), plus the properties that make it safe to put in front of
semdedup/IVF at 100 TB: variance ordering, orthonormal axes,
whitening to unit variance, determinism of two independent fits,
and a pure-JVM transform plan (no Python worker in the row path).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.projection import (
    pca_fit,
    pca_transform,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def model(emb):
    return pca_fit(emb, k=6)


def _X(emb):
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    return np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in rows])


def test_fit_matches_numpy_reference(emb, model):
    X = _X(emb)
    assert model["n"] == len(X)
    np.testing.assert_allclose(model["mean"], X.mean(axis=0), rtol=1e-9)
    cov = np.cov(X, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:6]
    np.testing.assert_allclose(
        model["variance"], vals[order], rtol=1e-8, atol=1e-12
    )
    got = np.asarray(model["components"])
    want = vecs[:, order].T
    for i in range(6):
        # eigenvectors match up to sign; the operator pins the sign
        s = np.sign(np.dot(got[i], want[i]))
        np.testing.assert_allclose(got[i], s * want[i], rtol=1e-6, atol=1e-9)
        j = int(np.argmax(np.abs(got[i])))
        assert got[i, j] > 0  # the documented sign convention


def test_axes_are_orthonormal_and_variance_descending(model):
    C = np.asarray(model["components"])
    np.testing.assert_allclose(C @ C.T, np.eye(len(C)), atol=1e-9)
    v = model["variance"]
    assert all(a >= b for a, b in zip(v, v[1:])) and v[-1] > 0


def test_projected_covariance_is_diagonal(emb, model):
    proj = pca_transform(emb, model, out_col="p")
    P = np.asarray(
        [r.p for r in sorted(proj.collect(), key=lambda r: r.vec_id)]
    )
    cov = np.cov(P, rowvar=False, ddof=1)
    np.testing.assert_allclose(np.diag(cov), model["variance"], rtol=1e-6)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-6 * max(model["variance"])


def test_whitened_output_has_unit_variance(emb, model):
    proj = pca_transform(emb, model, out_col="p", whiten=True)
    P = np.asarray([r.p for r in proj.collect()])
    np.testing.assert_allclose(P.var(axis=0, ddof=1), 1.0, rtol=1e-5)


def test_reconstruction_error_decreases_with_k(emb):
    X = _X(emb)
    total = ((X - X.mean(axis=0)) ** 2).sum()
    errs = []
    for k in (2, 6, 16):
        m = pca_fit(emb, k=k)
        errs.append(total - np.sum(m["variance"]) * (len(X) - 1))
    assert errs[0] > errs[1] > errs[2] >= -1e-6 * total


def test_fit_is_deterministic_for_a_fixed_layout(emb):
    part = emb.repartition(7)
    a = pca_fit(part, k=4)
    b = pca_fit(part, k=4)
    assert a == b  # bit-identical, the docstring's contract


def test_fit_is_layout_stable_to_float_tolerance(emb):
    """Across DIFFERENT partitionings the per-batch float partials
    differ in summation order, so the contract is tolerance-level
    agreement (bit-exactness across layouts would need exact
    arithmetic on the Gram pass), not bitwise equality."""
    a = pca_fit(emb.repartition(7), k=4)
    b = pca_fit(emb.repartition(3), k=4)
    np.testing.assert_allclose(a["mean"], b["mean"], rtol=1e-12)
    np.testing.assert_allclose(a["components"], b["components"], rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(a["variance"], b["variance"], rtol=1e-10)


def test_transform_plan_is_jvm_only(emb, model):
    plan = pca_transform(emb, model)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_fit_validates_inputs(spark, emb):
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(emb, k=0)
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(emb, k=65)
    empty = emb.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        pca_fit(empty, k=2)
