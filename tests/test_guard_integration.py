"""Round-9 wiring rehearsal: projection -> ivf_assign ->
clusterguard -> cosine-verified candidates -> connected components,
composed exactly the way semdedup.semantic_dedup will consume the
guard next rotation window (clusterguard.py module docstring's
wiring plan) — WITHOUT editing semdedup.py (its q110 fingerprint is
out-of-window this round).

The scenario is the guard's reason to exist: a boilerplate flood
(300 near-identical vectors) lands in ONE coarse cluster that the
unguarded |c|^2 candidate join would make quadratic. The composed
pipeline must (a) bound the candidate cost, (b) still collapse the
flood to a single component with one canonical survivor, and
(c) leave genuinely distinct blobs and singletons untouched.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.functions import cosine
from utc_cuip_kafka_aws_connector_spark.operators.clusterguard import (
    recluster_oversized,
)
from utc_cuip_kafka_aws_connector_spark.operators.dedup import dedup_clusters
from utc_cuip_kafka_aws_connector_spark.operators.projection import (
    pca_fit,
    pca_transform,
)
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


def _composed_dedup(df, centroids, cap=CAP, cos_threshold=0.95):
    """semantic_dedup's candidate path with the guard spliced in
    between assignment and the bucket join — the exact r9 shape."""
    assigned = ivf_assign(df, centroids).select("vec_id", "centroid_id")
    refined, stitches = recluster_oversized(df, assigned, cap=cap)
    left = refined.select(F.col("vec_id").alias("id_a"), "centroid_id")
    right = refined.select(F.col("vec_id").alias("id_b"), "centroid_id")
    cand = (
        left.join(right, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .unionByName(stitches)  # connectivity across split buckets
        .distinct()
    )
    va = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("v_a"))
    vb = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("v_b"))
    pairs = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .filter(cosine(F.col("v_a"), F.col("v_b")) >= cos_threshold)
        .select("id_a", "id_b")
    )
    return refined, dedup_clusters(df, pairs, id_col="vec_id", src="id_a", dst="id_b")


def test_guarded_pipeline_bounds_cost_and_keeps_semantics(corpus):
    # one coarse centroid right on the flood, one per blob, one for
    # the singleton region -> the flood cluster is 7.5x the cap
    centroids = np.array(
        [
            [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0],
        ]
    )
    refined, result = _composed_dedup(corpus, centroids)
    sizes = [r["count"] for r in refined.groupBy("centroid_id").count().collect()]
    n = FLOOD + 2 * BLOB + SINGLETON
    assert max(sizes) <= 2 * CAP  # guard bound (salted-leaf wobble allowed)
    assert sum(s * s for s in sizes) < n * 4 * CAP  # near-linear candidates
    rows = result.collect()
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


def test_projection_front_end_composes(corpus):
    """PCA-reduce to 4 dims first (the production front-end), then
    the guarded pipeline on the PROJECTED vectors — same semantic
    outcome, proving the two round-8 modules stack."""
    model = pca_fit(corpus, k=4)
    proj = pca_transform(corpus, model, out_col="proj").select(
        "vec_id", F.col("proj").alias("embedding")
    )
    c = np.array(
        [r.embedding for r in proj.filter(F.col("vec_id").isin(0, 300, 320, 345)).collect()]
    )
    refined, result = _composed_dedup(proj, c, cos_threshold=0.98)
    sizes = [r["count"] for r in refined.groupBy("centroid_id").count().collect()]
    assert max(sizes) <= 2 * CAP
    rows = result.collect()
    comp = {r.vec_id: r.component for r in rows}
    assert len({comp[i] for i in range(FLOOD)}) == 1  # flood still one group
    keep = {r.vec_id for r in rows if r.keep}
    assert len(keep & set(range(FLOOD))) == 1
