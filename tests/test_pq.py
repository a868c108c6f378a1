"""operators/pq.py: product quantization + ADC search.

Evidence: recall@10 vs the exact float L2 search on the real fixture
embeddings, reconstruction improving with more subspaces, ADC
distances matching a numpy replay exactly, JVM-only search plan,
and seeded determinism.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.pq import (
    pq_adc_topk,
    pq_decode,
    pq_encode,
    pq_fit,
    pq_search_rerank,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def X(emb):
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    return np.asarray([r.embedding for r in rows], dtype=np.float64)


@pytest.fixture(scope="module")
def model(emb):
    return pq_fit(emb, m=16, nbits=5, seed=7)


@pytest.fixture(scope="module")
def coded(emb, model):
    return pq_encode(emb, model).cache()


def test_codes_shape_and_range(coded, model):
    rows = coded.collect()
    assert all(len(r.codes) == model["m"] for r in rows)
    assert all(0 <= c < 32 for r in rows for c in r.codes)


def test_adc_matches_numpy_replay(coded, model, X):
    """The element_at plan must reproduce the table-lookup distance
    bit-for-bit (same doubles, same order of m additions)."""
    q = list(X[3])
    got = {r.vec_id: r.dist for r in pq_adc_topk(coded, model, q, 50).collect()}
    codes = {r.vec_id: r.codes for r in coded.collect()}
    m, dsub = model["m"], model["dsub"]
    books = [np.asarray(b) for b in model["codebooks"]]
    tables = [
        ((books[j] - np.asarray(q)[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)
        for j in range(m)
    ]
    for vid, dist in got.items():
        want = 0.0
        for j in range(m):
            want += float(tables[j][codes[vid][j]])
        assert dist == want


def test_recall_vs_exact_l2(emb, coded, model, X):
    """Plain ADC gives a usable shortlist even on these near-
    unclustered fixture vectors (the hard case for PQ); the
    production shortlist+exact-rerank stage recovers near-exact
    recall at compressed-scan cost."""
    adc, rerank = [], []
    for qi in range(5):
        q = X[qi]
        exact = set(np.argsort(((X - q) ** 2).sum(axis=1))[:10])
        approx = {
            r.vec_id for r in pq_adc_topk(coded, model, list(q), 10).collect()
        }
        adc.append(len(exact & approx) / 10)
        refined = {
            r.vec_id
            for r in pq_search_rerank(coded, emb, model, list(q), 10).collect()
        }
        rerank.append(len(exact & refined) / 10)
    assert sum(adc) / len(adc) >= 0.4
    assert sum(rerank) / len(rerank) >= 0.9


def test_reconstruction_improves_with_m(emb, X):
    errs = []
    for m in (2, 8):
        mod = pq_fit(emb, m=m, nbits=5, seed=7)
        codes = {r.vec_id: r.codes for r in pq_encode(emb, mod).collect()}
        err = np.mean(
            [
                ((np.asarray(pq_decode(codes[i], mod)) - X[i]) ** 2).sum()
                for i in range(len(X))
            ]
        )
        errs.append(err)
    assert errs[1] < errs[0]


def test_seeded_fit_is_deterministic(emb):
    a = pq_fit(emb, m=4, nbits=4, seed=11)
    b = pq_fit(emb, m=4, nbits=4, seed=11)
    assert a == b


def test_adc_plan_is_jvm_only(spark, coded, model, tmp_path):
    """Production stores codes as a table; the SEARCH over that table
    must stay whole-stage-codegen with no Python stage."""
    path = str(tmp_path / "codes")
    coded.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    plan = (
        pq_adc_topk(stored, model, [0.0] * (model["m"] * model["dsub"]), 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_validation(emb, model):
    with pytest.raises(ValueError, match="divisible"):
        pq_fit(emb, m=7)
    with pytest.raises(ValueError, match="query dim"):
        pq_adc_topk(emb, model, [0.0] * 3, 5)


def test_encode_survives_empty_partitions(spark):
    """ADVICE r8: empty Arrow batches (empty input partitions) must
    not crash the encoder's subspace slicing."""
    import numpy as np

    from utc_cuip_kafka_aws_connector_spark.operators.pq import (
        pq_encode,
        pq_fit,
    )

    rows = [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(32)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(16)  # more partitions than needed -> some empty at the tail
    model = pq_fit(df, m=2, nbits=2)
    empty = df.filter("vec_id < 0").repartition(4)
    assert pq_encode(empty, model).count() == 0
    got = pq_encode(df, model)
    assert got.count() == 32
    assert got.schema["codes"].dataType.simpleString() == "array<smallint>"
