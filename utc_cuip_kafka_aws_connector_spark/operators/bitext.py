"""Margin-based bitext mining over aligned sentence embeddings —
the parallel-corpus construction op (Artetxe & Schwenk 2019,
"Margin-based Parallel Corpus Mining with Multilingual Sentence
Embeddings"; the recipe behind WikiMatrix / CCMatrix: score every
candidate (src, tgt) pair by its cosine RELATIVE to each side's
k-NN neighborhood density, so hub sentences that are close to
everything don't flood the mined corpus).

Ratio-margin score for a candidate pair (x, y):

    margin(x, y) = cos(x, y) / (mean_kNN(x)/2 + mean_kNN(y)/2)

where mean_kNN(x) is the mean cosine of x to its k nearest
neighbors in the TARGET corpus and mean_kNN(y) the mean cosine of
y to its k nearest in the SOURCE corpus. Candidates are the union
of both directions' top-k neighbor pairs; a pair scores > 1 only
when its cosine beats its endpoints' neighborhood averages.

Spark shape: each direction's top-k is one bucketed candidate join
(the negatives.py / similarity.py IVF pattern — corpus
cell-bucketed once, anchors multi-probe ``nprobe`` cells, cost ~
|anchors| * |corpus| / n_centroids * nprobe, never all-pairs) plus
one per-anchor window; the k-NN means are two small groupBy
aggregates over those top-k rows; margin scoring is a pair of
broadcast-sized equi-joins back onto the candidate set. No global
sort, no driver-side corpus data. ``method="brute"`` is the exact
all-pairs baseline (eval scale / tests), and ``nprobe >=
n_centroids`` makes the IVF path equal it row-for-row — pinned by
the tests.

Both corpora must live in ONE aligned embedding space (LASER-style
multilingual encoders) — that is the published method's contract,
not something the operator can check.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from utc_cuip_kafka_aws_connector_spark.functions import cosine
from utc_cuip_kafka_aws_connector_spark.operators.negatives import (
    _gemm_cell_kernel,
    _probe_cells,
)
from utc_cuip_kafka_aws_connector_spark.operators.similarity import (
    kmeans_centroids,
)


def _topk_pairs(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    a_alias: str,
    c_alias: str,
    method: str,
    centroids: np.ndarray | None,
    nprobe: int,
    kernel: str = "fold",
) -> DataFrame:
    """(a_alias, c_alias, cos_sim) — each anchor's top-k corpus
    neighbors by (cos desc, id asc), via brute cross-join or the
    IVF cell equi-join. Anchors landing in empty probe cells yield
    no rows (approximate path — raise nprobe for recall).

    ``kernel="fold"`` scores every candidate pair with the
    index-ordered zip_with/aggregate fold (bit-identical to the SQL
    oracle); ``kernel="gemm"`` (IVF only) scores each CELL as one
    numpy GEMM inside a cogrouped applyInPandas — the
    negatives.hard_negatives_gemm design (r18: measured 2.9-7.9x on
    the same candidate structure), with NO self/label exclusion mask
    (src and tgt are different corpora; an id collision across them
    is a legitimate pair). Top-k membership at an exact cosine tie
    follows the shared (sim desc, id asc) law in both kernels."""
    a = anchors.select(
        F.col(id_col).alias(a_alias), F.col(vec_col).alias("_a_vec")
    )
    c = corpus.select(
        F.col(id_col).alias(c_alias), F.col(vec_col).alias("_c_vec")
    )
    if kernel == "gemm":
        a_cells = a.withColumn(
            "_cell", F.explode(_probe_cells(F.col("_a_vec"), centroids, nprobe))
        )
        c_cells = c.withColumn(
            "_cell", F.explode(_probe_cells(F.col("_c_vec"), centroids, 1))
        )
        a_type = dict(anchors.dtypes)[id_col]
        c_type = dict(corpus.dtypes)[id_col]
        out_schema = f"{a_alias} {a_type}, {c_alias} {c_type}, cos_sim double"
        # the shared per-cell GEMM (negatives._gemm_cell_kernel),
        # with NO exclusion mask: src and tgt are distinct corpora,
        # so an id collision across them is a legitimate pair
        scored = (
            a_cells.groupby("_cell")
            .cogroup(c_cells.groupby("_cell"))
            .applyInPandas(
                _gemm_cell_kernel(
                    a_alias, c_alias, "_a_vec", "_c_vec", int(k)
                ),
                out_schema,
            )
        )
    else:
        if method == "brute":
            cand = a.crossJoin(c)
        else:
            cand = a.withColumn(
                "_cell",
                F.explode(_probe_cells(F.col("_a_vec"), centroids, nprobe)),
            ).join(
                c.withColumn(
                    "_cell",
                    F.explode(_probe_cells(F.col("_c_vec"), centroids, 1)),
                ),
                "_cell",
            )
        scored = cand.select(
            a_alias,
            c_alias,
            cosine(F.col("_a_vec"), F.col("_c_vec")).alias("cos_sim"),
        )
    # no dedup needed even at nprobe > 1 (the negatives.py r19 law):
    # the corpus side is SINGLE-probed, so a candidate pair shares at
    # most one cell and the join/cogroup emits it at most once — the
    # distinct this replaced dropped zero rows
    w = W.partitionBy(a_alias).orderBy(
        F.col("cos_sim").desc(), F.col(c_alias).asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    threshold: float = 1.0,
    strategy: str = "forward",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "brute",
    n_centroids: int = 16,
    nprobe: int = 2,
    centroids: np.ndarray | None = None,
    centroid_source: str = "hash_spread",
    kernel: str = "fold",
) -> DataFrame:
    """(src_id, tgt_id, cos_sim, margin): candidate parallel pairs
    with ratio-margin > ``threshold``, from two corpora embedded in
    one aligned space.

    Candidates are the union of src->tgt and tgt->src top-``k``
    neighbor pairs, deduped by pair KEY (under the fold kernel both
    directions' cosines are bit-identical; under the GEMM kernel the
    two differently-shaped GEMMs may disagree in the last ulp, so
    the dedup picks max(cos) deterministically). ``strategy``:

    - ``"all"``: every candidate above threshold.
    - ``"forward"`` (default, the paper's *max* strategy): per
      src_id keep only the best pair by (margin desc, tgt_id asc),
      then threshold — each source sentence mines at most one
      translation.
    - ``"mutual"`` (the *intersection* strategy): keep pairs that
      are BOTH their src's best and their tgt's best, then
      threshold — highest precision, lowest recall.

    ``method="ivf"`` buckets both corpora with one shared centroid
    set (``centroid_source``: "hash_spread" draws deterministically
    from the union of both corpora; "kmeans" trains k-means|| on
    the union; or pass ``centroids``). Approximate: a pair whose
    endpoints never co-occur in a probed cell is missed, and a pair
    whose endpoint has NO scored neighbors (empty probe) is dropped
    at margin time (inner join on the k-NN means); ``nprobe >=
    n_centroids`` is exhaustive and equals brute exactly.
    ``method="brute"`` runs |src| x |tgt| both ways — tests and
    eval scale only, never the 100 TB path.

    ``kernel`` picks the scoring engine (r19, the negatives.py
    design propagated per VERDICT r18 #6): ``"fold"`` is the
    index-ordered zip_with/aggregate fold, bit-identical to the SQL
    oracle — the verification path; ``"gemm"`` (requires
    ``method="ivf"``; ``nprobe >= n_centroids`` remains exhaustive)
    scores each cell as one numpy GEMM through a cogrouped
    applyInPandas — each vector ships through Arrow once per cell it
    lands in, never once per pair; the production path at high dim.
    GEMM summation order can differ from the fold in the last ulps,
    so the two kernels may tie-break differently where cosines tie
    only approximately; tests pin rank agreement on non-degenerate
    data and value agreement to 1e-12.

    Vectors must be non-null (ANN-stack contract). With fewer than
    ``k`` neighbors available (tiny corpus or sparse probes), the
    k-NN mean is over what exists — mirroring a truncated FAISS
    result list."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if method not in ("brute", "ivf"):
        raise ValueError(f"method must be brute|ivf, got {method!r}")
    if strategy not in ("all", "forward", "mutual"):
        raise ValueError(
            f"strategy must be all|forward|mutual, got {strategy!r}"
        )
    if kernel not in ("fold", "gemm"):
        raise ValueError(f"kernel must be fold|gemm, got {kernel!r}")
    if kernel == "gemm" and method != "ivf":
        raise ValueError(
            "kernel='gemm' scores per IVF cell — use method='ivf' "
            "(nprobe >= n_centroids for the exhaustive setting)"
        )

    if method == "ivf" and centroids is None:
        both = src.select(F.lit("s").alias("_side"), F.col(id_col), F.col(vec_col)).unionByName(
            tgt.select(F.lit("t").alias("_side"), F.col(id_col), F.col(vec_col))
        )
        if centroid_source == "kmeans":
            centroids = kmeans_centroids(both, n_centroids, vec_col=vec_col)
        elif centroid_source == "hash_spread":
            # seedless uniform draw over BOTH corpora; the side tag
            # keeps the hash well-defined when id spaces collide
            sample = (
                both.orderBy(
                    F.xxhash64(F.concat_ws("|", F.col("_side"), F.col(id_col).cast("string"))),
                    F.col("_side"),
                    F.col(id_col),
                )
                .limit(n_centroids)
                .collect()
            )
            centroids = np.array([r[2] for r in sample], dtype=np.float64)
        else:
            raise ValueError(
                "centroid_source must be 'hash_spread' or 'kmeans', "
                f"got {centroid_source!r}"
            )

    fwd = _topk_pairs(
        src, tgt, k, id_col, vec_col, "src_id", "tgt_id",
        method, centroids, nprobe, kernel,
    )
    bwd = _topk_pairs(
        tgt, src, k, id_col, vec_col, "tgt_id", "src_id",
        method, centroids, nprobe, kernel,
    )

    # per-endpoint neighborhood density — the margin denominators
    src_knn = fwd.groupBy("src_id").agg(F.avg("cos_sim").alias("_src_knn"))
    tgt_knn = bwd.groupBy("tgt_id").agg(F.avg("cos_sim").alias("_tgt_knn"))

    # candidate pool = union of both directions, one row per (src,
    # tgt) pair. Under the fold kernel the two directions' cosines
    # are bit-identical (one ordered fold), so this aggregate
    # collapses exactly like the distinct() it generalizes; under the
    # GEMM kernel the two directions run DIFFERENTLY-SHAPED GEMMs
    # whose blocking may disagree in the last ulp, so the dedup keys
    # on ids and picks max(cos) deterministically
    cand = (
        fwd.select("src_id", "tgt_id", "cos_sim")
        .unionByName(bwd.select("src_id", "tgt_id", "cos_sim"))
        .groupBy("src_id", "tgt_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )

    scored = (
        cand.join(src_knn, "src_id")
        .join(tgt_knn, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            "cos_sim",
            (
                F.col("cos_sim")
                / (F.col("_src_knn") / 2.0 + F.col("_tgt_knn") / 2.0)
            ).alias("margin"),
        )
    )

    if strategy == "forward":
        w = W.partitionBy("src_id").orderBy(
            F.col("margin").desc(), F.col("tgt_id").asc()
        )
        scored = (
            scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
    elif strategy == "mutual":
        ws = W.partitionBy("src_id").orderBy(
            F.col("margin").desc(), F.col("tgt_id").asc()
        )
        wt = W.partitionBy("tgt_id").orderBy(
            F.col("margin").desc(), F.col("src_id").asc()
        )
        scored = (
            scored.withColumn("_rs", F.row_number().over(ws))
            .withColumn("_rt", F.row_number().over(wt))
            .filter((F.col("_rs") == 1) & (F.col("_rt") == 1))
            .drop("_rs", "_rt")
        )

    return scored.filter(F.col("margin") > threshold)
