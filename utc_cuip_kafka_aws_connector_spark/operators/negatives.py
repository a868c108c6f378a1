"""Hard-negative mining over an embedding column — the
contrastive-training data op (dense retrievers / embedding models
train on (anchor, positive, hard-negative) triples; the standard
recipe mines the negatives as each anchor's nearest NON-positive
neighbors, e.g. DPR, Karpukhin et al. 2020, and the ANCE family).

Composes the existing ANN stack (operators/similarity.py's
kmeans_centroids coarse quantizer + an ivf_assign-mirroring
multi-probe kernel, functions.cosine)
without editing it: the corpus is cell-bucketed once, each anchor
probes its ``nprobe`` nearest cells, candidates meet the corpus in a
cell EQUI-join (cost ~ |corpus|/n_centroids * nprobe per anchor,
never |anchors| x |corpus|), positives are excluded by label, and a
per-anchor window keeps the top-k by cosine. ``method="brute"`` is
the verification-grade exact baseline (all candidate pairs through
the same scoring/exclusion/rank tail — the q48 cosine-top-k pattern),
and ``nprobe >= n_centroids`` makes the IVF path exactly equal to it,
which is how the tests pin the composition.

Scale shape: one BLAS assignment pass over the corpus and one over
the anchors (Arrow-batched mapInPandas-style pandas_udfs, centroids
ship in the task closure — KBs), per-side norm folds BEFORE the join
(each candidate pair then costs one cross-dot, not three folds), one
bucket equi-join, one per-anchor-partitioned window. No global sort,
no driver-side corpus data, no all-pairs join on the IVF path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from utc_cuip_kafka_aws_connector_spark.functions import dot
from utc_cuip_kafka_aws_connector_spark.operators.similarity import (
    kmeans_centroids,
)


def _probe_cells(vec_col, centroids: np.ndarray, nprobe: int):
    """array<int> of each vector's ``nprobe`` nearest centroid ids,
    nearest first — the anchor-side multi-probe twin of
    similarity.ivf_assign's single-cell assignment (same normalized
    BLAS matmul per Arrow batch, same task-closure centroid
    shipping); defined here because similarity.py's single-probe
    contract is pinned by its gate queries."""
    from pyspark.sql.types import ArrayType, IntegerType

    c = np.asarray(centroids, dtype=np.float64)
    c_norm = c / np.linalg.norm(c, axis=1, keepdims=True)
    n = min(int(nprobe), c.shape[0])

    @F.pandas_udf(ArrayType(IntegerType()))
    def probes(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        mat = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
        )
        sims = mat @ c_norm.T
        # argsort ascending on (-sim, cell_id): nearest first with a
        # deterministic cell-id tie-break, layout-independent
        order = np.lexsort(
            (np.broadcast_to(np.arange(c_norm.shape[0]), sims.shape), -sims),
            axis=1,
        )[:, :n]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return probes(vec_col)


def _resolve_centroids(
    df: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray | None,
    centroid_source: str,
) -> np.ndarray:
    """The coarse-quantizer centers, as similarity.ivf_topk picks
    them: caller-supplied, k-means||, or the seedless hash_spread
    draw (smallest xxhash64(id) rows — layout-independent, spread
    across a sorted/clustered corpus)."""
    if centroids is not None:
        return np.asarray(centroids, dtype=np.float64)
    if centroid_source == "kmeans":
        return kmeans_centroids(df, n_centroids, vec_col=vec_col)
    if centroid_source == "hash_spread":
        sample = (
            df.select(F.col(id_col), F.col(vec_col))
            .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
            .limit(n_centroids)
            .collect()
        )
        return np.array([r[1] for r in sample], dtype=np.float64)
    raise ValueError(
        "centroid_source must be 'hash_spread' or 'kmeans', "
        f"got {centroid_source!r}"
    )


def hard_negatives(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str | None = None,
    anchors: DataFrame | None = None,
    method: str = "ivf",
    n_centroids: int = 16,
    nprobe: int = 2,
    centroids: np.ndarray | None = None,
    centroid_source: str = "hash_spread",
) -> DataFrame:
    """(anchor_id, neg_id, cos_sim, rank): for every anchor, its
    ``k`` most-cosine-similar corpus vectors that are NOT positives —
    self is always excluded, and when ``label_col`` is given, any
    vector sharing the anchor's label is too (label == positive set,
    the in-batch-negatives convention). ``rank`` is 1-based by
    (cos_sim desc, neg_id asc) — fully deterministic, duplicate
    vectors included. Anchors with fewer than ``k`` eligible
    candidates yield fewer rows (never padded).

    ``anchors`` defaults to the corpus itself (mine negatives for
    every vector); pass a subset frame with the same id/vec(/label)
    columns to mine for a query set only.

    ``method="ivf"``: candidates come from each anchor's ``nprobe``
    nearest of ``n_centroids`` cells (centroid sources as in
    similarity.ivf_topk: "hash_spread" deterministic draw or
    "kmeans" k-means|| — or pass ``centroids``). Approximate: a true
    neighbor outside the probed cells is missed; raise ``nprobe``
    for recall (``nprobe >= n_centroids`` is exhaustive and equals
    brute exactly). ``method="brute"``: every (anchor, candidate)
    pair — the exact baseline; |anchors| x |corpus| comparisons, for
    eval-scale query sets and tests, never the 100 TB path.

    The candidate cross-dot is the index-ordered zip_with/aggregate
    fold — bit-identical to the SQL oracle. A per-pair Arrow/numpy
    einsum kernel was built and MEASURED against it (r18): 1.4x
    slower at dim 64 and 2x slower at dim 768 on the IVF candidate
    stream, because shipping both vectors per PAIR through Arrow
    costs more than the fold saves — so there is deliberately no
    "blas" pair kernel HERE. The design that does win —
    :func:`hard_negatives_gemm`, one GEMM per cell group, each
    vector shipped once per cell — measured 2.9x faster at dim 64
    and 7.9x at dim 768; use it for production mining, this fold
    path for oracle-exact verification (GEMM summation order can
    split an exact cosine tie differently).

    Vectors must be non-null (the ANN-stack contract; nulls would
    poison the BLAS batch)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if method not in ("ivf", "brute"):
        raise ValueError(f"method must be ivf|brute, got {method!r}")
    if anchors is None:
        anchors = df

    # Norms are per-ROW facts: fold them once per side here, so each
    # candidate pair costs ONE array fold (the cross dot) instead of
    # three. The emitted value is bit-identical to functions.cosine —
    # the same dot/(sqrt*sqrt) IEEE sequence, just not re-derived per
    # pair (at |anchors| x |corpus|/cell candidates the two self-dots
    # were ~2/3 of the gate's runtime).
    a_cols = [
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("a_vec"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("a_norm"),
    ]
    c_cols = [
        F.col(id_col).alias("neg_id"),
        F.col(vec_col).alias("n_vec"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("n_norm"),
    ]
    if label_col is not None:
        a_cols.append(F.col(label_col).alias("a_label"))
        c_cols.append(F.col(label_col).alias("n_label"))

    if method == "brute":
        cand = anchors.select(*a_cols).crossJoin(df.select(*c_cols))
    else:
        centroids = _resolve_centroids(
            df, n_centroids, id_col, vec_col, centroids, centroid_source
        )
        # corpus side: single-probe assignment through the same
        # kernel (nprobe=1 == similarity.ivf_assign's argmax, same
        # lowest-cell-id tie-break) — ivf_assign itself projects away
        # every non-vector column, and the label must ride along
        corpus_cells = df.select(
            *c_cols,
            F.explode(
                _probe_cells(F.col(vec_col), centroids, 1)
            ).alias("centroid_id"),
        )
        anchor_cells = anchors.select(
            *a_cols,
            F.explode(
                _probe_cells(F.col(vec_col), centroids, nprobe)
            ).alias("centroid_id"),
        )
        cand = anchor_cells.join(corpus_cells, "centroid_id")

    cand = cand.filter(F.col("neg_id") != F.col("anchor_id"))
    if label_col is not None:
        # null-safe: a null-labeled candidate is nobody's positive
        cand = cand.filter(
            ~F.col("a_label").eqNullSafe(F.col("n_label"))
        ).drop("a_label", "n_label")

    scored = cand.select(
        "anchor_id",
        "neg_id",
        (
            dot(F.col("a_vec"), F.col("n_vec"))
            / (F.col("a_norm") * F.col("n_norm"))
        ).alias("cos_sim"),
    )
    # No dedup needed even at nprobe > 1 (VERDICT r18 #1): the CORPUS
    # side is SINGLE-probed, so a given neg_id lives in exactly one
    # cell and an (anchor, neg) pair can share at most that one cell —
    # the join emits each pair at most once by construction. The
    # distinct() this replaced was the gate's largest Exchange and
    # provably dropped zero rows.
    w = W.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("neg_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _gemm_cell_kernel(
    a_id: str,
    c_id: str,
    a_vec: str,
    c_vec: str,
    k: int,
    mask_fn=None,
):
    """Builds the cogrouped-applyInPandas cell function both GEMM
    consumers share (review r19 — this was duplicated between
    hard_negatives_gemm and bitext's kernel="gemm"): normalize each
    side, one GEMM for the whole cell, optional exclusion mask
    (``mask_fn(a_pdf, c_pdf) -> bool ndarray`` of masked-OUT pairs —
    hard negatives' self/label law; None for bitext, where src and
    tgt are distinct corpora), then the deterministic per-row
    ``_row_topk``. Zero-norm vectors are the ANN-stack contract's
    exclusion (non-null, non-zero) in BOTH consumers — deliberately
    NOT clamped here, so the GEMM result stays comparable to the
    fold kernels, which don't clamp either."""

    def cell_topk(a_pdf: pd.DataFrame, c_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({a_id: [], c_id: [], "cos_sim": []})
        if a_pdf.empty or c_pdf.empty:
            return empty
        A = np.array(a_pdf[a_vec].tolist(), dtype=np.float64)
        C = np.array(c_pdf[c_vec].tolist(), dtype=np.float64)
        A = A / np.linalg.norm(A, axis=1, keepdims=True)
        C = C / np.linalg.norm(C, axis=1, keepdims=True)
        sims = A @ C.T  # (n_anchors, n_cands)
        a_ids = a_pdf[a_id].to_numpy()
        c_ids = c_pdf[c_id].to_numpy()
        if mask_fn is not None:
            sims = np.where(mask_fn(a_pdf, c_pdf), -np.inf, sims)
        kk = min(k, sims.shape[1])
        rows = []
        for i in range(sims.shape[0]):
            cand = _row_topk(sims[i], c_ids, kk)
            rows.append(
                pd.DataFrame(
                    {
                        # cand indexes CANDIDATES — the anchor is row i
                        a_id: np.repeat(a_ids[i], len(cand)),
                        c_id: c_ids[cand],
                        "cos_sim": sims[i, cand],
                    }
                )
            )
        return pd.concat(rows, ignore_index=True) if rows else empty

    return cell_topk


def _row_topk(sim_row: np.ndarray, c_ids: np.ndarray, kk: int) -> np.ndarray:
    """Indices of one anchor row's top-``kk`` candidates, ORDERED by
    the (sim desc, id asc) law; ``-inf``-masked entries never
    selected. argpartition finds the value boundary in O(n);
    membership at an EXACT tie on that boundary is then resolved by
    id asc over ALL tied candidates — never by within-cell row order,
    so results are layout-independent (ADVICE r18). Shared by the
    GEMM cell kernels here and in bitext.py."""
    part = np.argpartition(-sim_row, kk - 1)[:kk]
    thresh = sim_row[part].min()
    if thresh > -np.inf and (sim_row == thresh).sum() > 1:
        # boundary value is shared: keep everything strictly above
        # it, then fill the remaining slots from ALL tied candidates
        # by id asc (not argpartition's pick)
        above = np.flatnonzero(sim_row > thresh)
        tied = np.flatnonzero(sim_row == thresh)
        tied = tied[np.argsort(c_ids[tied], kind="stable")]
        cand = np.concatenate([above, tied[: kk - len(above)]])
    else:
        cand = part
    s = sim_row[cand]
    cand = cand[s > -np.inf]
    order = np.lexsort((c_ids[cand], -sim_row[cand]))
    return cand[order]


def hard_negatives_gemm(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str | None = None,
    anchors: DataFrame | None = None,
    n_centroids: int = 16,
    nprobe: int = 2,
    centroids: np.ndarray | None = None,
    centroid_source: str = "hash_spread",
) -> DataFrame:
    """``hard_negatives``'s high-dimension production kernel: the
    same IVF candidate structure (multi-probe anchors, single-probe
    corpus, per-anchor top-k by cosine, label/self exclusion), but
    each CELL scores as one numpy GEMM inside a cogrouped
    applyInPandas — every vector ships through Arrow once per cell
    it lands in, never once per PAIR. Measured (r18, 1k anchors,
    nprobe 4): 3.75 s vs the fold's 10.97 s at dim 64/100k corpus,
    4.79 s vs 37.73 s at dim 768/20k corpus — 2.9-7.9x, and nearly
    dim-insensitive where the fold scales linearly with dim.

    Exactness contract: the GEMM sums products in a different order
    than the fold, so ``cos_sim`` can differ from ``hard_negatives``
    in the last ulps — this kernel is for production mining, the fold
    kernel for oracle-exact verification; tests pin rank agreement
    on non-degenerate data and value agreement to 1e-12. On the
    GEMM-computed sims the result IS deterministic and
    layout-independent (ADVICE r18): an exact tie at the top-k
    boundary is resolved by the fold path's own (sim desc, neg_id
    asc) law, never by within-cell row order. The residual
    divergence between the kernels is therefore only that summation
    order can make two pairs tie under one kernel and not the other.

    Per-cell top-k is globally sound: a pair's corpus vector lives in
    exactly one cell, and any candidate that beats it there beats it
    globally, so every global top-k member is inside its own cell's
    top-k — the final window over the pooled per-cell winners
    (~|anchors| * nprobe * k rows) loses nothing.

    Scale shape: one BLAS probe pass per side, one cogrouped Python
    stage keyed by cell (parallelism = n_centroids; size each cell's
    anchor x corpus block to executor memory via n_centroids), one
    window over the pooled winners. No per-pair rows ever
    materialize outside the kernel."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if anchors is None:
        anchors = df
    centroids = _resolve_centroids(
        df, n_centroids, id_col, vec_col, centroids, centroid_source
    )

    a_cols = [
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("a_vec"),
    ]
    c_cols = [
        F.col(id_col).alias("neg_id"),
        F.col(vec_col).alias("n_vec"),
    ]
    if label_col is not None:
        a_cols.append(F.col(label_col).alias("a_label"))
        c_cols.append(F.col(label_col).alias("n_label"))
    corpus_cells = df.select(
        *c_cols,
        F.explode(_probe_cells(F.col(vec_col), centroids, 1)).alias(
            "centroid_id"
        ),
    )
    anchor_cells = anchors.select(
        *a_cols,
        F.explode(_probe_cells(F.col(vec_col), centroids, nprobe)).alias(
            "centroid_id"
        ),
    )

    id_type = dict(df.dtypes)[id_col]
    out_schema = (
        f"anchor_id {id_type}, neg_id {id_type}, cos_sim double"
    )
    use_labels = label_col is not None

    def exclude(a_pdf: pd.DataFrame, c_pdf: pd.DataFrame) -> np.ndarray:
        mask = (
            a_pdf["anchor_id"].to_numpy()[:, None]
            == c_pdf["neg_id"].to_numpy()[None, :]
        )  # self-pairs
        if use_labels:
            # joint factorize == eqNullSafe: NaN/None gets its own
            # code, so null==null excludes (the fold path's law)
            codes, _ = pd.factorize(
                pd.concat(
                    [a_pdf["a_label"], c_pdf["n_label"]],
                    ignore_index=True,
                ),
                use_na_sentinel=False,
            )
            a_lab = codes[: len(a_pdf)]
            c_lab = codes[len(a_pdf):]
            mask |= a_lab[:, None] == c_lab[None, :]
        return mask

    cell_topk = _gemm_cell_kernel(
        "anchor_id", "neg_id", "a_vec", "n_vec", int(k), mask_fn=exclude
    )

    pooled = (
        anchor_cells.groupby("centroid_id")
        .cogroup(corpus_cells.groupby("centroid_id"))
        .applyInPandas(cell_topk, out_schema)
    )
    w = W.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("neg_id").asc()
    )
    return (
        pooled.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
