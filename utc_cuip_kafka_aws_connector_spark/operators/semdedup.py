"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): cluster the embedding space with a coarse
quantizer, compare vectors ONLY within their cluster, and collapse
groups whose pairwise cosine exceeds a threshold to one canonical
survivor -- the embedding-cluster dedup family beside the LSH one
(operators/similarity.py::lsh_ann_pairs feeding dedup_clusters).

Own module on purpose: it composes operators.similarity (cluster
assignment, centroid sources), operators.clusterguard (the oversized-
cluster cost bound, wired at round 9) and operators.dedup (transitive
closure) without adding weight to any of them. Catalog entries built
on it name all four modules so the gate fingerprint covers the whole
dependency closure.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.functions import cosine
from utc_cuip_kafka_aws_connector_spark.operators.clusterguard import (
    recluster_oversized,
)
from utc_cuip_kafka_aws_connector_spark.operators.dedup import dedup_clusters
from utc_cuip_kafka_aws_connector_spark.operators.similarity import (
    ivf_assign,
    kmeans_centroids,
)


def semantic_dedup(
    df: DataFrame,
    n_clusters: int = 16,
    cos_threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    centroid_source: str = "hash_spread",
    cluster_cap: int | None = 10_000,
) -> DataFrame:
    """Semantic dedup over an embedding column. Returns
    (id, component, keep) in ``dedup_clusters``'s contract:
    singletons are their own component, ``keep`` marks the canonical
    minimum-id survivor of each near-duplicate group.

    Scale design (the whole point vs ``lsh_ann_pairs``): the
    candidate set is a self EQUI-JOIN on ``cluster_id`` -- cost
    ~ sum_c |c|^2, never |corpus|^2 -- and mirrors SemDeDup's k-means
    bucketing rather than random hyperplanes, so candidate quality
    tracks the embedding geometry. Candidates are generated on
    (id, cluster) pairs ONLY; the float vectors join back afterwards,
    so wide arrays never ride through the bucket join. Cluster
    assignment is one BLAS matmul per Arrow batch (``ivf_assign``);
    transitive closure is pointer-jumping ``connected_components``
    (checkpointed, raises on non-convergence). Centroid sources as in
    ``ivf_topk``: ``"hash_spread"`` (deterministic uniform draw,
    oracle-friendly) or ``"kmeans"`` (distributed k-means|| -- the
    production build; tighter clusters mean fewer cross-cluster
    false negatives).

    ``cluster_cap`` bounds the one failure mode of the sum_c |c|^2
    cost model: a degenerate embedding distribution (boilerplate
    flood, collapsed encoder) that lands a huge corpus fraction in
    ONE cluster, whose |c|^2 then dominates everything. Clusters
    above the cap are geometry-aware re-clustered / salted by
    ``clusterguard.recluster_oversized`` BEFORE the candidate join,
    and the guard's connectivity stitches ride the normal
    cosine-verified candidate path -- so in the common degenerate
    case (the flood IS one near-dup group) transitive closure still
    collapses it to one component. The default (10k) keeps the worst
    per-bucket candidate volume ~1e8 pairs; when no cluster exceeds
    it the guard costs ONE driver-small aggregate (#clusters rows)
    and the plan is the unguarded identity. ``None`` disables
    (verification-grade exact-within-cluster behavior)."""
    if centroids is None:
        if centroid_source == "kmeans":
            centroids = kmeans_centroids(df, n_clusters, vec_col=vec_col)
        elif centroid_source == "hash_spread":
            sample = (
                df.select(F.col(id_col), F.col(vec_col))
                .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
                .limit(n_clusters)
                .collect()
            )
            centroids = np.array([r[1] for r in sample], dtype=np.float64)
        else:
            raise ValueError(
                f"centroid_source must be 'hash_spread' or 'kmeans', got {centroid_source!r}"
            )

    # Persist the narrow (id, centroid_id) frame EAGERLY before anything
    # consumes it: downstream it feeds the guard's size aggregate plus
    # BOTH sides of the candidate self-join, and without the pin each
    # branch re-runs ivf_assign's BLAS pass -- i.e. a second full scan
    # of the wide embedding table (the r16 phase decomposition measured
    # two identical assignment subtrees in q110's plan). The cached
    # frame is two fixed-width columns (~16 B/row), so at 100 TB of
    # embeddings the pin is GBs while the scan it saves is the corpus.
    # Eager count() because a lazy persist would still let the two
    # self-join branches race to compute it inside one job.
    pinned = (
        ivf_assign(df, centroids, id_col, vec_col)
        .select(id_col, "centroid_id")
        .persist()
    )
    pinned.count()
    try:
        assigned, stitches = pinned, None
        if cluster_cap is not None:
            # the guard may return a REBUILT frame (sub-bucketed
            # ids), so keep ``pinned`` separate: the final unpersist
            # must target the frame that was actually persisted, not
            # the guard output
            assigned, stitches = recluster_oversized(
                df, pinned, cap=cluster_cap, id_col=id_col, vec_col=vec_col
            )
        left = assigned.select(F.col(id_col).alias("id_a"), "centroid_id")
        right = assigned.select(F.col(id_col).alias("id_b"), "centroid_id")
        cand = (
            left.join(right, "centroid_id")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        if stitches is not None:
            # duplicate-free by construction: a stitch pair spans two
            # DIFFERENT sub-buckets, so it cannot also come out of
            # the within-bucket self-join, and the guard already
            # distinct()s its own output -- no dedup shuffle needed.
            cand = cand.unionByName(stitches)
        va = df.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")
        )
        vb = df.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")
        )
        pairs = (
            cand.join(va, "id_a")
            .join(vb, "id_b")
            .filter(cosine(F.col("v_a"), F.col("v_b")) >= cos_threshold)
            .select("id_a", "id_b")
        )
        return dedup_clusters(df, pairs, id_col=id_col, src="id_a", dst="id_b")
    finally:
        # dedup_clusters -> connected_components eagerly checkpoints
        # the edge list at entry (dedup.py::_cut), so by the time it
        # returns, ``pairs`` -- and with it the assignment frame --
        # is fully materialized and the returned lineage no longer
        # references it. finally: an exception mid-build (CC
        # non-convergence is a designed exit) must not leak the pin
        # either -- that daemon-timescale leak is the reason the
        # unpersist exists.
        pinned.unpersist()
