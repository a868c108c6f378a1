"""In-context pretraining ordering — similarity-coherent document
order for long-context packing (Shi et al. 2024, "In-Context
Pretraining: Language Modeling Beyond Document Boundaries": packing
RELATED documents into one context window instead of random
neighbors measurably improves long-context ability). The missing
step between this engine's embedding stack and its packing tier:
packing.py fills windows in whatever order the input arrives; this
operator produces that order.

Recipe (the paper's shape, engine-native): cluster the corpus with
the existing IVF coarse quantizer (similarity.kmeans_centroids /
ivf_assign — one BLAS pass, KBs on the driver), then chain each
cluster's documents by GREEDY NEAREST NEIGHBOR on cosine: start
from the smallest id (deterministic), repeatedly hop to the most
similar unvisited document (ties by id). The output
``(cluster_id, pack_order)`` sorts into the packer: consecutive
documents are semantic neighbors, cluster boundaries are the only
topic jumps.

Scale shape: assignment is the audited ivf_assign pass; chaining is
a per-cluster ``applyInPandas`` — O(|c|^2) BLAS per cluster, which
is why the operator enforces ``max_cluster_size`` LOUDLY (the
clusterguard doctrine: a silently quadratic cluster would OOM an
executor at corpus scale — raise n_clusters, or pre-split with
clusterguard, rather than letting one hot cluster eat the job).
Driver holds centroids only.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.similarity import (
    ivf_assign,
    kmeans_centroids,
)


def _chain(vecs: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Greedy nearest-neighbor visit order (positions into ids):
    start at the smallest id; each step hops to the unvisited vector
    with the highest cosine to the CURRENT one, ties by smaller id."""
    n = len(ids)
    norm = vecs / np.maximum(
        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12
    )
    sims = norm @ norm.T
    order = np.empty(n, dtype=np.int64)
    visited = np.zeros(n, dtype=bool)
    cur = int(np.argmin(ids))
    for k in range(n):
        order[k] = cur
        visited[cur] = True
        if k + 1 == n:
            break
        s = sims[cur].copy()
        s[visited] = -np.inf
        best = np.max(s)
        cand = np.flatnonzero(s == best)
        cur = int(cand[np.argmin(ids[cand])])
    return order


def incontext_order(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    centroids: np.ndarray | None = None,
    max_cluster_size: int = 100_000,
    seed: int = 0,
) -> DataFrame:
    """(id, cluster_id, pack_order): a packing order in which
    consecutive documents are semantic neighbors. Sort by
    ``(cluster_id, pack_order)`` and feed the packer. ``pack_order``
    is 0-based within each cluster; the chain is fully deterministic
    (smallest-id start, cosine-desc/id-asc hops). NULL ids or
    vectors are dropped (the ANN-stack contract). Pass ``centroids``
    to reuse a trained quantizer; otherwise k-means|| fits one."""
    if n_clusters < 1:
        raise ValueError(f"n_clusters must be >= 1, got {n_clusters}")
    if max_cluster_size < 2:
        raise ValueError(
            f"max_cluster_size must be >= 2, got {max_cluster_size}"
        )
    base = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).filter(F.col("vec_id").isNotNull() & F.col("embedding").isNotNull())
    if centroids is None:
        centroids = kmeans_centroids(
            base, n_clusters, vec_col="embedding", seed=seed
        )
    # ivf_assign returns (vec_id, embedding, centroid_id): keep its
    # embedding instead of re-joining the corpus against itself — the
    # join was a second full shuffle of the wide vector column
    assigned = ivf_assign(base, centroids).select(
        "vec_id", "embedding", "centroid_id"
    )

    cap = int(max_cluster_size)

    def chain_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > cap:
            raise ValueError(
                f"icp cluster {int(pdf['centroid_id'].iloc[0])} holds "
                f"{len(pdf)} > max_cluster_size={cap} documents; the "
                "greedy chain is O(n^2) per cluster — raise n_clusters "
                "(or pre-split with clusterguard), or raise the cap "
                "deliberately."
            )
        ids = pdf["vec_id"].to_numpy()
        vecs = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        order = _chain(vecs, ids)
        out = pd.DataFrame(
            {
                "vec_id": ids[order],
                "cluster_id": pdf["centroid_id"].iloc[0],
                "pack_order": np.arange(len(ids), dtype=np.int64),
            }
        )
        return out

    id_type = df.schema[id_col].dataType.simpleString()
    out = assigned.groupBy("centroid_id").applyInPandas(
        chain_cluster,
        f"vec_id {id_type}, cluster_id int, pack_order long",
    )
    return out.withColumnRenamed("vec_id", id_col)
