"""The oversized-cluster guard behind the PUBLIC entry point:
``semantic_dedup(cluster_cap=...)`` (wired at round 9; this file was
the round-8 wiring rehearsal and now pins the production path).

The scenario is the guard's reason to exist: a boilerplate flood
(300 near-identical vectors) lands in ONE coarse cluster that the
unguarded |c|^2 candidate join would make quadratic. The guarded
operator must (a) bound the refined cluster sizes, (b) still
collapse the flood to a single component with one canonical
survivor, and (c) leave genuinely distinct blobs and singletons
untouched — and with a cap no cluster reaches, it must return
EXACTLY what the unguarded operator returns.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.clusterguard import (
    recluster_oversized,
)
from utc_cuip_kafka_aws_connector_spark.operators.projection import (
    pca_fit,
    pca_transform,
)
from utc_cuip_kafka_aws_connector_spark.operators.semdedup import semantic_dedup
from utc_cuip_kafka_aws_connector_spark.operators.similarity import ivf_assign

FLOOD, BLOB, SINGLETON = 300, 20, 10
CAP = 40


@pytest.fixture(scope="module")
def corpus(spark):
    """dim-8 embeddings: a flood of 300 near-identical vectors, two
    clean 20-vector blobs, 10 far-apart singletons — all jitter
    deterministic."""
    rows = []
    for i in range(FLOOD):
        v = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        v[1] = 1e-4 * (i % 7)  # tiny, keeps cosine ~1
        rows.append((i, v))
    for b, axis in ((0, 2), (1, 3)):
        for i in range(BLOB):
            v = [0.0] * 8
            v[axis] = 1.0
            v[4] = 1e-4 * (i % 5)
            rows.append((FLOOD + b * BLOB + i, v))
    for i in range(SINGLETON):
        # distinct +-1 sign patterns over dims 4..7: pairwise cosine
        # <= 0.5, safely below every threshold used here
        v = [0.0] * 8
        for j in range(4):
            v[4 + j] = 1.0 if (i >> j) & 1 else -1.0
        rows.append((FLOOD + 2 * BLOB + i, v))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8)


CENTROIDS = np.array(
    [
        # one coarse centroid right on the flood, one per blob, one
        # for the singleton region -> the flood cluster is 7.5x CAP
        [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0],
    ]
)


def _check_semantics(rows):
    n = FLOOD + 2 * BLOB + SINGLETON
    assert len(rows) == n
    comp = {r.vec_id: r.component for r in rows}
    keep = {r.vec_id for r in rows if r.keep}
    # (b) flood -> ONE component, ONE survivor
    flood_comps = {comp[i] for i in range(FLOOD)}
    assert len(flood_comps) == 1
    assert len(keep & set(range(FLOOD))) == 1
    # (c) each blob its own single component, disjoint from the flood
    for b in range(2):
        ids = set(range(FLOOD + b * BLOB, FLOOD + (b + 1) * BLOB))
        assert len({comp[i] for i in ids}) == 1
        assert {comp[i] for i in ids}.isdisjoint(flood_comps)
        assert len(keep & ids) == 1
    # (d) singletons survive untouched
    singles = set(range(FLOOD + 2 * BLOB, n))
    assert singles <= keep
    assert len({comp[i] for i in singles}) == SINGLETON


def test_guarded_public_entry_point_bounds_cost_and_keeps_semantics(corpus):
    """The degenerate-distribution property, against semantic_dedup
    itself: a cap the flood cluster exceeds 7.5x must not change the
    dedup outcome (stitches preserve connectivity), and the refined
    assignment the operator builds internally must respect the cap —
    asserted by reproducing the guard's own input (same centroids,
    same cap: recluster_oversized is deterministic)."""
    result = semantic_dedup(
        corpus, centroids=CENTROIDS, cos_threshold=0.95, cluster_cap=CAP
    )
    _check_semantics(result.collect())
    assigned = ivf_assign(corpus, CENTROIDS).select("vec_id", "centroid_id")
    refined, _ = recluster_oversized(corpus, assigned, cap=CAP)
    sizes = [r["count"] for r in refined.groupBy("centroid_id").count().collect()]
    n = FLOOD + 2 * BLOB + SINGLETON
    assert max(sizes) <= 2 * CAP  # guard bound (salted-leaf wobble allowed)
    assert sum(s * s for s in sizes) < n * 4 * CAP  # near-linear candidates


def test_guard_idle_is_exactly_the_unguarded_result(corpus):
    """With a cap above every cluster size (the q110 fixture regime),
    the guarded operator returns row-for-row what cluster_cap=None
    returns — the identity contract the gate oracle leans on."""
    guarded = semantic_dedup(
        corpus, centroids=CENTROIDS, cos_threshold=0.95, cluster_cap=10_000
    )
    unguarded = semantic_dedup(
        corpus, centroids=CENTROIDS, cos_threshold=0.95, cluster_cap=None
    )
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, unguarded.collect())
    )


def test_projection_front_end_composes(corpus):
    """PCA-reduce to 4 dims first (the production front-end), then
    the guarded operator on the PROJECTED vectors — same semantic
    outcome, proving the modules stack."""
    model = pca_fit(corpus, k=4)
    proj = pca_transform(corpus, model, out_col="proj").select(
        "vec_id", F.col("proj").alias("embedding")
    )
    c = np.array(
        [
            r.embedding
            for r in proj.filter(F.col("vec_id").isin(0, 300, 320, 345)).collect()
        ]
    )
    result = semantic_dedup(
        proj, centroids=c, cos_threshold=0.98, cluster_cap=CAP
    )
    rows = result.collect()
    comp = {r.vec_id: r.component for r in rows}
    assert len({comp[i] for i in range(FLOOD)}) == 1  # flood still one group
    keep = {r.vec_id for r in rows if r.keep}
    assert len(keep & set(range(FLOOD))) == 1
