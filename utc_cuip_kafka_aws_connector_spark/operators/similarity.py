"""Similarity search over embedding columns (array<float>).

Two paths (SURVEY §2.B "Similarity search"):
- ``cosine_topk``: brute-force exact scan -- the correctness baseline.
  One pass, no shuffle except the final top-k; the dot product is a
  built-in higher-order fold (JVM-side, no Python).
- ``lsh_ann_pairs`` / ``lsh_buckets``: random-hyperplane (sign) LSH
  with multiple tables -- the 100 TB path. Bucket keys are computed
  per row from deterministic hash-derived hyperplanes (no model
  state to broadcast), candidates meet in an equi-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.functions import cosine, dot  # noqa: F401

I64_MAX = float(2**63 - 1)


def cosine_topk(df: DataFrame, query_vec: list[float], k: int, id_col: str = "vec_id",
                vec_col: str = "embedding", exclude_id: int | None = None) -> DataFrame:
    """Exact top-k cosine neighbors of a literal query vector.

    The query vector is a plan literal (broadcast to every task for
    free); Spark plans orderBy+limit as TakeOrderedAndProject, so the
    full corpus is never sorted -- each partition keeps k rows.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = df
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return (
        out.withColumn("cos_sim", cosine(F.col(vec_col), q))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("cos_sim", 4).alias("cos_sim"))
    )


def lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 8,
    planes_per_table: int = 16,
    dim: int = 64,
    seed: int = 0,
) -> DataFrame:
    """One row per (vector, table): sign-LSH bucket key.

    bucket[t] = bits of sign(v . h(t,p)) for p in 0..planes-1; for
    cosine s the candidate probability is
    1-(1-((1-acos(s)/pi))^planes)^tables (~0.99 at s=0.99 with 8x16,
    while 16-bit buckets keep unrelated vectors apart so the candidate
    join stays near-linear).

    The sign bits are one numpy matmul per Arrow batch (pandas UDF):
    vectorized BLAS beats 128 per-plane expression folds by orders of
    magnitude, and bucketing needs no cross-engine float determinism.
    The plane matrix is seed-deterministic and ships to executors in
    the task closure (tables*planes*dim doubles -- a few KB).
    """
    from pyspark.sql.types import ArrayType, LongType

    planes = np.random.RandomState(seed).normal(size=(num_tables * planes_per_table, dim))
    weights = (1 << np.arange(planes_per_table - 1, -1, -1, dtype=np.int64))

    @F.pandas_udf(ArrayType(LongType()))
    def bucket_keys(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        bits = (mat @ planes.T) > 0  # (n, tables*planes)
        bits = bits.reshape(len(mat), num_tables, planes_per_table)
        keys = (bits * weights).sum(axis=2)  # (n, tables)
        return pd.Series(list(keys))

    # Fan out ONLY when the scan is narrower than the target
    # parallelism (one local parquet file = one partition would
    # serialize the BLAS bucketing); when the source already carries
    # >= defaultParallelism splits — every real corpus at scale — the
    # round-robin repartition is a pure corpus-sized shuffle of the
    # embedding payload and is skipped (guide §2.4; the q94/decontam
    # precedent). Bucket keys are a pure per-row function, so results
    # are partitioning-independent. Streaming inputs cannot be
    # partition-probed (.rdd raises) — keep the unconditional fan-out.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    if df.isStreaming or df.rdd.getNumPartitions() < n_parts:
        df = df.repartition(n_parts)
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(bucket_keys(F.col(vec_col))).alias("table_id", "bucket"),
    )


def lsh_ann_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 8,
    planes_per_table: int = 16,
    cos_threshold: float = 0.9,
    dim: int | None = None,
) -> DataFrame:
    """Approximate near-neighbor pairs: vectors sharing any
    (table, bucket) are candidates; exact cosine verifies. The join is
    an equi-join on the bucket key -- candidate volume, not n^2,
    drives cost.

    Pass ``dim`` (the embedding width) explicitly when known -- it is
    schema metadata, and the fallback probe is a driver-side
    ``head()`` that runs a (tiny, first-partition-only) Spark job
    before the real plan is even built."""
    if dim is None:
        dim = len(df.select(vec_col).head()[0])
    b = lsh_buckets(df, id_col, vec_col, num_tables, planes_per_table, dim=dim)
    # candidate generation on ids only -- deduping (id_a, id_b) pairs is
    # a cheap long-pair distinct; vectors join back afterwards, so the
    # float arrays never ride through the bucket join or the distinct.
    left = b.select(F.col(id_col).alias("id_a"), "table_id", "bucket")
    right = b.select(F.col(id_col).alias("id_b"), "table_id", "bucket")
    cand = (
        left.join(right, ["table_id", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_sim", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos_sim") >= cos_threshold)
        .select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))
    )


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse
    quantizer). One BLAS matmul per Arrow batch; centroids ship in the
    task closure (n_centroids x dim doubles -- KBs)."""
    from pyspark.sql.types import IntegerType

    c = np.asarray(centroids, dtype=np.float64)
    c_norm = c / np.linalg.norm(c, axis=1, keepdims=True)

    @F.pandas_udf(IntegerType())
    def nearest(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series((mat @ c_norm.T).argmax(axis=1).astype("int32"))

    # Scale-conditional fan-out, as in lsh_buckets: skip the
    # corpus-sized embedding shuffle whenever the scan already
    # carries enough splits (guide §2.4). Assignment is per-row
    # deterministic, so results are partitioning-independent.
    # Streaming inputs cannot be partition-probed — fan out as before.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    if df.isStreaming or df.rdd.getNumPartitions() < n_parts:
        df = df.repartition(n_parts)
    return df.select(
        F.col(id_col), F.col(vec_col), nearest(F.col(vec_col)).alias("centroid_id")
    )


def kmeans_centroids(
    df: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    seed: int = 0,
    max_iter: int = 20,
) -> np.ndarray:
    """Learn IVF centroids with Spark ML's distributed KMeans
    (k-means|| initialization -- the scalable parallel variant of
    k-means++ seeding): the production-grade coarse quantizer.
    Distributed end-to-end: Lloyd iterations are map-side partial
    aggregates over the corpus, only the (n_centroids x dim) centers
    come back to the driver."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, initMode="k-means||"
    ).fit(feat)
    return np.array(model.clusterCenters(), dtype=np.float64)


def ivf_topk(
    df: DataFrame,
    query_vecs: list[tuple[int, list[float]]],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    centroid_source: str = "hash_spread",
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into centroid buckets,
    then search each query only in its ``nprobe`` nearest buckets.

    Two built-in centroid sources (or pass ``centroids`` directly):

    - ``"hash_spread"`` (default): the n_centroids rows with the
      smallest xxhash64(id) -- a seedless deterministic uniform draw
      independent of row order, so a corpus sorted or clustered by id
      still yields centroids spread across the whole collection
      (taking the FIRST n rows would degenerate the coarse quantizer
      on such corpora and collapse recall). Zero extra passes; the
      oracle-friendly choice.
    - ``"kmeans"``: distributed k-means|| via ``kmeans_centroids`` --
      the production build; tighter buckets (better recall per probe)
      at the cost of the clustering passes.

    The operator contract and plan shape are identical either way.
    The probe list per query is computed on the driver (queries are
    few); candidates meet the corpus in a bucket equi-join, so cost
    ~ corpus/n_centroids * nprobe * |Q|, never |corpus| * |Q|.

    Returns (query_id, vec_id, cos_sim) with per-query top-k.
    """
    from pyspark.sql.window import Window as W

    if centroids is None:
        if centroid_source == "kmeans":
            centroids = kmeans_centroids(df, n_centroids, vec_col=vec_col)
        elif centroid_source == "hash_spread":
            sample = (
                df.select(F.col(id_col), F.col(vec_col))
                .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
                .limit(n_centroids)
                .collect()
            )
            centroids = np.array([r[1] for r in sample], dtype=np.float64)
        else:
            raise ValueError(
                f"centroid_source must be 'hash_spread' or 'kmeans', got {centroid_source!r}"
            )
    c_norm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    assigned = ivf_assign(df, centroids, id_col, vec_col)

    probe_rows = []
    for qid, qv in query_vecs:
        q = np.asarray(qv, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-12)
        for cid in (q @ c_norm.T).argsort()[::-1][:nprobe]:
            probe_rows.append((qid, int(cid), [float(x) for x in qv]))
    spark = df.sparkSession
    probes = spark.createDataFrame(
        probe_rows, f"query_id long, centroid_id int, q_vec array<double>"
    )

    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .withColumn("cos_sim", cosine(F.col(vec_col), F.col("q_vec")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, F.round("cos_sim", 4).alias("cos_sim"))
    )
