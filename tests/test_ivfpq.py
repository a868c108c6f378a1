"""The similarity stack composed: IVF coarse cells + PQ codes +
ADC + exact rerank (pq.ivfpq_topk) — the full compressed-index
search over the real fixture embeddings.

Pins: the nprobe cell filter really shrinks the scanned set, recall
stays high despite scanning a fraction of the corpus, nprobe=all
degrades to plain PQ rerank exactly, and the query's own cell is
always probed (self-retrieval at distance 0).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.pq import (
    ivfpq_topk,
    pq_encode,
    pq_fit,
    pq_search_rerank,
)
from utc_cuip_kafka_aws_connector_spark.operators.similarity import (
    ivf_assign,
    kmeans_centroids,
)

SF = "/root/testdata/sf0.001"
N_CELLS = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def stack(emb):
    centroids = kmeans_centroids(emb, N_CELLS, seed=5)
    model = pq_fit(emb, m=16, nbits=5, seed=5)
    coded = (
        pq_encode(emb, model)
        .join(ivf_assign(emb, centroids).select("vec_id", "centroid_id"), "vec_id")
        .cache()
    )
    coded.count()
    return centroids, model, coded


@pytest.fixture(scope="module")
def X(emb):
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    return np.asarray([r.embedding for r in rows], dtype=np.float64)


def test_self_retrieval_and_cell_shrink(emb, stack, X):
    centroids, model, coded = stack
    q = list(X[17])
    top = ivfpq_topk(coded, emb, model, centroids, q, 5, nprobe=2).collect()
    assert top[0].vec_id == 17 and top[0].dist == 0.0
    # the probe filter scans a strict fraction of the corpus
    cd = ((np.asarray(centroids) - np.asarray(q)) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(cd)[:2]]
    scanned = coded.filter(F.col("centroid_id").isin(probes)).count()
    assert 0 < scanned < coded.count()


def test_recall_with_partial_probe(emb, stack, X):
    centroids, model, coded = stack
    recalls = []
    for qi in (3, 9, 21, 40):
        q = X[qi]
        exact = set(np.argsort(((X - q) ** 2).sum(axis=1))[:10])
        got = {
            r.vec_id
            for r in ivfpq_topk(
                coded, emb, model, centroids, list(q), 10, nprobe=4
            ).collect()
        }
        recalls.append(len(exact & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.6  # half the cells probed


def test_full_probe_equals_plain_pq_rerank(emb, stack, X):
    centroids, model, coded = stack
    q = list(X[2])
    a = ivfpq_topk(coded, emb, model, centroids, q, 10, nprobe=N_CELLS).collect()
    b = pq_search_rerank(coded, emb, model, q, 10).collect()
    assert [(r.vec_id, r.dist) for r in a] == [(r.vec_id, r.dist) for r in b]
