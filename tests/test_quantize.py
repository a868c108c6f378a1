"""operators/quantize.py: int8 scalar quantization.

Evidence: the reconstruction-error bound holds per dimension on the
real fixture embeddings, compressed top-k keeps high recall vs the
exact float search, degenerate dimensions are exact, codes stay in
[0,255], and encode/search plans are JVM-only.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.quantize import (
    sq_cosine_topk,
    sq_decode_col,
    sq_encode,
    sq_fit,
)
from utc_cuip_kafka_aws_connector_spark.operators.similarity import cosine_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def model(emb):
    return sq_fit(emb)


def test_fit_matches_numpy_extrema(emb, model):
    X = np.asarray([r.embedding for r in emb.collect()], dtype=np.float64)
    np.testing.assert_allclose(model["mins"], X.min(axis=0), rtol=1e-6)
    np.testing.assert_allclose(model["maxs"], X.max(axis=0), rtol=1e-6)
    assert model["d"] == X.shape[1]


def test_reconstruction_error_bound(emb, model):
    coded = sq_encode(emb, model)
    back = coded.select(
        "vec_id", sq_decode_col(F.col("codes"), model).alias("dec"), "embedding"
    ).collect()
    ranges = np.array(model["maxs"]) - np.array(model["mins"])
    bound = ranges / (2 * 255) + 1e-9
    for r in back:
        err = np.abs(
            np.asarray(r.dec) - np.asarray(r.embedding, dtype=np.float64)
        )
        assert (err <= bound).all()


def test_codes_are_bytes(emb, model):
    coded = sq_encode(emb, model)
    stats = coded.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
    ).first()
    assert 0 <= stats.lo and stats.hi <= 255


def test_compressed_topk_recall(emb, model):
    """SQ8 on 64-dim embeddings: recall@10 vs the exact float search
    must stay high (the whole point of the compressed tier)."""
    coded = sq_encode(emb, model).select("vec_id", "codes")
    recalls = []
    for r in emb.orderBy("vec_id").limit(5).collect():
        exact = {
            x.vec_id
            for x in cosine_topk(emb, list(r.embedding), 10).collect()
        }
        approx = {
            x.vec_id
            for x in sq_cosine_topk(coded, model, list(r.embedding), 10).collect()
        }
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.8


def test_degenerate_dimension_is_exact(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 7.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    m = sq_fit(df)
    assert m["mins"][1] == m["maxs"][1] == 7.0
    back = (
        sq_encode(df, m)
        .select(sq_decode_col(F.col("codes"), m).alias("dec"))
        .collect()
    )
    assert all(r.dec[1] == 7.0 for r in back)


def test_plans_are_jvm_only(emb, model):
    coded = sq_encode(emb, model)
    for frame in (coded, sq_cosine_topk(coded, model, [0.0] * model["d"], 5)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan


def test_fit_validation(spark, emb):
    with pytest.raises(ValueError, match="empty"):
        sq_fit(emb.filter(F.lit(False)))
