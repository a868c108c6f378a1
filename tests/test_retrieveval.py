"""operators/retrieveval.py: IR metrics vs hand-computed references."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.retrieveval import (
    mean_metrics,
    retrieval_metrics,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_hand_computed_example(spark):
    """q1: relevant {a,b,c}; returned [a, x, b, y, z] at k=5.
    recall 2/3, precision 2/5, mrr 1, dcg = 1/log2(2) + 1/log2(4) =
    1.5, idcg = 1/log2(2)+1/log2(3)+1/log2(4) ~= 2.1309."""
    res = _df(
        spark,
        [("q1", d, i + 1) for i, d in enumerate(["a", "x", "b", "y", "z"])],
        "query_id string, doc_id string, rank long",
    )
    truth = _df(
        spark,
        [("q1", "a"), ("q1", "b"), ("q1", "c")],
        "query_id string, doc_id string",
    )
    r = retrieval_metrics(res, truth, k=5).first()
    assert r.n_relevant == 3 and r.hits == 2
    assert r.recall == pytest.approx(2 / 3)
    assert r.precision == pytest.approx(2 / 5)
    assert r.mrr == pytest.approx(1.0)
    idcg = 1 + 1 / math.log2(3) + 1 / math.log2(4)
    assert r.ndcg == pytest.approx(1.5 / idcg)


def test_perfect_and_missing_queries(spark):
    res = _df(
        spark,
        [("p", "a", 1), ("p", "b", 2)],
        "query_id string, doc_id string, rank long",
    )
    truth = _df(
        spark,
        [("p", "a"), ("p", "b"), ("ghost", "z")],
        "query_id string, doc_id string",
    )
    rows = {r.query_id: r for r in retrieval_metrics(res, truth, k=2).collect()}
    p = rows["p"]
    assert (p.recall, p.precision, p.mrr, p.ndcg) == (1.0, 1.0, 1.0, 1.0)
    g = rows["ghost"]  # judged but never answered -> zeros
    assert (g.hits, g.recall, g.mrr, g.ndcg) == (0, 0.0, 0.0, 0.0)


def test_graded_ndcg_prefers_high_grades_first(spark):
    truth = _df(
        spark,
        [("q", "hi", 3.0), ("q", "lo", 1.0)],
        "query_id string, doc_id string, grade double",
    )
    good = _df(spark, [("q", "hi", 1), ("q", "lo", 2)],
               "query_id string, doc_id string, rank long")
    bad = _df(spark, [("q", "lo", 1), ("q", "hi", 2)],
              "query_id string, doc_id string, rank long")
    g = retrieval_metrics(good, truth, k=2, grade_col="grade").first().ndcg
    b = retrieval_metrics(bad, truth, k=2, grade_col="grade").first().ndcg
    assert g == pytest.approx(1.0)
    assert b < g


def test_cap_recall_variant(spark):
    """5 relevant, k=2, both returned hits: uncapped recall 2/5,
    capped ("R-capped") 2/2."""
    res = _df(spark, [("q", "a", 1), ("q", "b", 2)],
              "query_id string, doc_id string, rank long")
    truth = _df(spark, [("q", x) for x in "abcde"],
                "query_id string, doc_id string")
    plain = retrieval_metrics(res, truth, k=2).first().recall
    capped = retrieval_metrics(res, truth, k=2, cap_recall=True).first().recall
    assert plain == pytest.approx(0.4) and capped == pytest.approx(1.0)


def test_mean_metrics_and_ann_integration(spark):
    """End to end against the real ANN index: ground truth from flat
    exact search, results from the compressed probe — the evaluator
    reproduces the recall the annindex tests assert by hand."""
    import numpy as np

    from utc_cuip_kafka_aws_connector_spark.operators.annindex import (
        ann_encode,
        ann_fit,
        ann_search,
    )

    rng = np.random.RandomState(1)
    base = rng.randn(4, 8) * 3
    rows = [(i, [float(v) for v in base[i % 4] + rng.randn(8) * 0.4])
            for i in range(200)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    index = ann_fit(corpus, n_cells=4, m=4, nbits=5)
    coded = ann_encode(corpus, index)

    queries = {f"q{j}": rows[j * 17][1] for j in range(5)}
    res_rows, truth_rows = [], []
    for qid, qv in queries.items():
        exact = ann_search(index, coded, qv, k=10, nprobe=4,
                           vectors=corpus, shortlist=200).collect()
        truth_rows += [(qid, r.vec_id) for r in exact]
        approx = ann_search(index, coded, qv, k=10, nprobe=2,
                            vectors=corpus).collect()
        res_rows += [(qid, r.vec_id, i + 1) for i, r in enumerate(approx)]
    res = _df(spark, res_rows, "query_id string, doc_id long, rank long")
    truth = _df(spark, truth_rows, "query_id string, doc_id long")
    per_q = retrieval_metrics(res, truth, k=10)
    m = mean_metrics(per_q).first()
    assert m.n_queries == 5
    assert 0.5 <= m.recall <= 1.0  # nprobe=2 of 4 cells
    assert m.mrr > 0.5


def test_k_validation(spark):
    res = _df(spark, [("q", "a", 1)], "query_id string, doc_id string, rank long")
    with pytest.raises(ValueError, match="k must be"):
        retrieval_metrics(res, res.select("query_id", "doc_id"), k=0)
