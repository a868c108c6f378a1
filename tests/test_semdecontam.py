"""Embedding-based decontamination (operators/semdecontam.py):
planted copies and paraphrases flagged, numpy parity, scan-only
plan, guards.
"""

from __future__ import annotations

import math
import random

import pytest

from utc_cuip_kafka_aws_connector_spark.operators.semdecontam import (
    embedding_decontaminate,
    semantic_decontaminate,
)

DIM = 16


def _vec(rng):
    return [rng.uniform(-1, 1) for _ in range(DIM)]


def _perturb(v, eps, rng):
    return [x + rng.uniform(-eps, eps) for x in v]


@pytest.fixture(scope="module")
def planted(spark):
    rng = random.Random(42)
    evals = [(i, _vec(rng)) for i in range(20)]
    corpus = [(100 + i, _vec(rng)) for i in range(60)]
    corpus.append((900, list(evals[3][1])))                 # verbatim copy
    corpus.append((901, _perturb(evals[7][1], 0.01, rng)))  # paraphrase
    corpus.append((902, None))                              # no embedding
    corpus.append((903, [0.0] * DIM))                       # zero vector
    eval_df = spark.createDataFrame(
        evals, "vec_id long, embedding array<double>"
    )
    corpus_df = spark.createDataFrame(
        corpus, "doc_id long, embedding array<double>"
    )
    return corpus_df, eval_df, evals, corpus


def test_scores_match_numpy(planted):
    import numpy as np

    corpus_df, eval_df, evals, corpus = planted
    got = {
        r["doc_id"]: r
        for r in embedding_decontaminate(corpus_df, eval_df).collect()
    }
    emat = np.stack(
        [np.asarray(v) / np.linalg.norm(v) for _, v in evals]
    )
    for doc_id, vec in corpus:
        row = got[doc_id]
        if vec is None or not any(vec):
            assert row["max_cosine"] is None
            assert row["nearest_eval_id"] is None
            continue
        u = np.asarray(vec) / np.linalg.norm(vec)
        sims = emat @ u
        assert row["max_cosine"] == pytest.approx(
            float(sims.max()), rel=1e-9
        ), doc_id
        assert row["nearest_eval_id"] == evals[int(sims.argmax())][0]


def test_planted_leaks_flagged_and_removed(planted):
    corpus_df, eval_df, _, _ = planted
    scored = {
        r["doc_id"]: r
        for r in embedding_decontaminate(corpus_df, eval_df).collect()
    }
    assert scored[900]["max_cosine"] == pytest.approx(1.0, abs=1e-12)
    assert scored[900]["nearest_eval_id"] == 3
    assert scored[901]["max_cosine"] > 0.999
    assert scored[901]["nearest_eval_id"] == 7

    kept = semantic_decontaminate(corpus_df, eval_df, threshold=0.99)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 900 not in ids and 901 not in ids
    # unscoreable rows are KEPT (documented absence-of-evidence rule)
    assert 902 in ids and 903 in ids
    assert len(ids) == corpus_df.count() - 2


def test_threshold_monotonicity(planted):
    corpus_df, eval_df, _, _ = planted
    kept = [
        semantic_decontaminate(corpus_df, eval_df, threshold=t).count()
        for t in (0.5, 0.9, 0.999999)
    ]
    assert kept == sorted(kept)


def test_chunked_eval_matches_unchunked(planted):
    corpus_df, eval_df, _, _ = planted
    a = sorted(
        (r["doc_id"], r["max_cosine"], r["nearest_eval_id"])
        for r in embedding_decontaminate(corpus_df, eval_df).collect()
    )
    b = sorted(
        (r["doc_id"], r["max_cosine"], r["nearest_eval_id"])
        for r in embedding_decontaminate(
            corpus_df, eval_df, eval_chunk_rows=7
        ).collect()
    )
    assert a == b


def test_empty_eval_keeps_everything(planted, spark):
    corpus_df, _, _, _ = planted
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    assert (
        semantic_decontaminate(corpus_df, empty).count()
        == corpus_df.count()
    )


def test_real_embeddings_fixture(spark, sf_dir):
    """e2e on the driver-generated embeddings table: every vector is
    its own best match at cosine ~1 when the eval set IS the
    corpus."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    scored = embedding_decontaminate(
        emb.limit(50), emb.limit(50), id_col="vec_id"
    )
    for r in scored.collect():
        assert r["max_cosine"] == pytest.approx(1.0, abs=1e-6), r


def test_guards_and_plan(planted):
    corpus_df, eval_df, _, _ = planted
    with pytest.raises(ValueError, match="threshold"):
        semantic_decontaminate(corpus_df, eval_df, threshold=2.0)
    with pytest.raises(ValueError, match="max_eval_rows"):
        embedding_decontaminate(corpus_df, eval_df, max_eval_rows=5)
    plan = (
        embedding_decontaminate(corpus_df, eval_df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan          # scan, not join
    assert "Exchange" not in plan      # no shuffle


def test_string_ids_both_sides(spark):
    """Id types follow the input schema (decontam.py's type-agnostic
    contract): string corpus keys and string eval names work."""
    evals = spark.createDataFrame(
        [("gsm8k/0001", [1.0, 0.0, 0.0])],
        "vec_id string, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            ("url:a", [1.0, 0.0, 0.0]),
            ("url:b", [0.0, 1.0, 0.0]),
        ],
        "doc_id string, embedding array<double>",
    )
    rows = {
        r["doc_id"]: r
        for r in embedding_decontaminate(corpus, evals).collect()
    }
    assert rows["url:a"]["max_cosine"] == pytest.approx(1.0)
    assert rows["url:a"]["nearest_eval_id"] == "gsm8k/0001"
    kept = semantic_decontaminate(corpus, evals, threshold=0.99)
    assert {r["doc_id"] for r in kept.collect()} == {"url:b"}
