"""Distributed PCA / whitening for embedding columns.

The missing front-end of the clustering family (semdedup.py's
SemDeDup, similarity.py's IVF): production semantic-dedup and ANN
pipelines reduce/whiten raw encoder embeddings before k-means so
distances are not dominated by a few high-variance axes (the
standard preprocessing in the SemDeDup paper's setting, Abbas et
al. 2023, and in FAISS's OPQ/PCAMatrix stage — public knowledge,
reimplemented here from the algorithm).

Scale story (the reason this is NOT `RowMatrix.computeSVD`-shaped):
the only distributed pass is a Gram-matrix sweep — each Arrow batch
contributes (count, sum x, X^T X), d*(d+1)/2 + d + 1 doubles — which
is associative partial aggregation, so executors stream 100 TB of
vectors and ship back a few KB per batch. The d x d eigenproblem
(d = embedding width, 64 for the fixtures, 256-4096 in production —
driver-trivial either way) is solved ONCE on the driver with numpy,
and the k components are broadcast back as literal arrays.
``pca_transform`` is then pure JVM expression work: one ordered-fold
dot product per component (functions.dot), no Python in the row
path, fully codegen'd and column-pruned.

Float determinism (see tests): batch partials are summed on the
driver in a content-keyed sort order, numpy's `eigh` is
deterministic for a fixed matrix, and eigenvector sign is fixed by
convention (largest-|coordinate| entry made positive, first index on
ties), so two fits over the same partitioning produce bit-identical
models. Across DIFFERENT partitionings the per-batch Gram partials
sum in a different order, so agreement is float-tolerance-level,
not bitwise — which is why this stays a pytest-differential module
rather than a hash-exact oracle query.

Reference basis: the reference repo has no embedding surface at all
(its 389 lines move dicts from a Kafka queue to csv/S3 —
run.py:27-56); this module exists for SURVEY.md §2.D's
training-data-pipeline scope.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.functions import dot


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
) -> dict:
    """One distributed Gram pass + a driver-side eigensolve.

    Returns a plain-python model dict:
      ``n``        rows seen
      ``mean``     length-d list (column means)
      ``components`` k x d nested list, rows = principal axes,
                   descending eigenvalue, sign-normalized
      ``variance`` length-k list of explained variances (eigenvalues
                   of the sample covariance, ddof=1)
    """
    schema = "key string, n long, s binary, g binary"

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            s = X.sum(axis=0)
            g = X.T @ X
            payload = s.tobytes() + g.tobytes()
            yield pd.DataFrame(
                {
                    # content-keyed so the driver can merge partials in
                    # an arrival-order-independent (deterministic) order
                    "key": [hashlib.sha256(payload).hexdigest()],
                    "n": [len(X)],
                    "s": [s.tobytes()],
                    "g": [g.tobytes()],
                }
            )

    rows = sorted(
        df.select(F.col(vec_col).alias(vec_col))
        .mapInPandas(partials, schema=schema)
        .collect(),
        key=lambda r: (r.key, r.n),
    )
    if not rows:
        raise ValueError("pca_fit: empty input")
    d = len(np.frombuffer(rows[0].s, dtype=np.float64))
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    n = 0
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        n += r.n
        s += np.frombuffer(r.s, dtype=np.float64)
        g += np.frombuffer(r.g, dtype=np.float64).reshape(d, d)
    if n < 2:
        raise ValueError(f"pca_fit: need >= 2 rows, got {n}")
    mean = s / n
    cov = (g - np.outer(mean, s)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    # sign convention: the largest-|coordinate| entry of each axis is
    # positive (first index on exact ties) -> fits are reproducible
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "n": int(n),
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "variance": [float(vals[o]) for o in order],
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "proj",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project ``vec_col`` onto the fitted axes — pure JVM expressions
    (one ordered-fold dot per component over the mean-centered
    vector), so the row path stays in whole-stage codegen with no
    Python worker. ``whiten=True`` scales each coordinate by
    1/sqrt(variance + eps), giving unit-variance outputs."""
    mean = F.array(*[F.lit(float(m)) for m in model["mean"]])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), mean, lambda x, m: x - m
    )
    coords = []
    for comp, var in zip(model["components"], model["variance"]):
        c = dot(centered, F.array(*[F.lit(float(x)) for x in comp]))
        if whiten:
            c = c / float(np.sqrt(var + eps))
        coords.append(c)
    return df.withColumn(out_col, F.array(*coords))
