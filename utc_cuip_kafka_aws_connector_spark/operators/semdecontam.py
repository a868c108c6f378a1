"""Embedding-based benchmark decontamination: flag corpus documents
semantically close to an evaluation set, catching the paraphrase
leakage n-gram decontamination (operators/decontam.py) misses.

Why this exists: the public contamination literature (GPT-3 app. C;
the Llama/Phi data cards; "Rethinking Benchmarks" lines of work)
shows verbatim n-gram matching misses reworded eval items; the
standard complement is cosine similarity between document and
benchmark EMBEDDINGS at a high threshold. This module is that step,
built to the same contract as `ngram_decontaminate`: a per-document
contamination frame you threshold and anti-join.

Spark-first shape — the benchmark side is SMALL (eval suites are
10^3..10^5 items), the corpus side is 100 TB, so the right plan is a
SCAN, not a join:

- ``embedding_decontaminate``: one Arrow-batched ``mapInPandas``
  over the corpus; each batch computes ``batch_matrix @
  eval_matrix.T`` with numpy against the closure-broadcast
  (L2-normalized) eval matrix and keeps each row's max cosine +
  argmax eval id. No shuffle, no join, no candidate explosion;
  executors stream the corpus once. Eval memory: 10^5 x 768 floats
  = ~300 MB per executor — the documented ceiling; above it, chunk
  the eval matrix (``eval_chunk_rows``) and fold maxima, same scan.
- At radically larger eval sets the LSH route (similarity.py /
  annindex.py's banded candidates) becomes the right plan; that
  composition is deliberately NOT duplicated here — this module owns
  the broadcast-scan regime it is best at.

Float caveat: cosines are float32-promoted-to-float64 dot products
— tolerance-stable; tests pin planted copies at ~1.0 and use
threshold margins, not bit equality.

Reference basis: SURVEY §2.D training-data-pipeline scope; the
reference repo (389 lines, Kafka->csv/S3) has no decontamination
surface.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized_matrix(rows: list[tuple[object, list[float]]]):
    """(ids, unit-row matrix) from collected eval vectors; zero
    vectors are dropped (no direction, nothing can be 'similar' to
    them). Ids stay a plain Python list — any orderable id type
    works (long, string, ...)."""
    import numpy as np

    ids: list = []
    vecs = []
    for vid, vec in rows:
        arr = np.asarray(vec, dtype=np.float64)
        n = float(np.linalg.norm(arr))
        if n > 0.0 and math.isfinite(n):
            ids.append(vid)
            vecs.append(arr / n)
    if not vecs:
        return [], np.zeros((0, 0))
    return ids, np.stack(vecs)


def embedding_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
    eval_chunk_rows: int = 100_000,
    max_eval_rows: int = 2_000_000,
) -> DataFrame:
    """Per-corpus-document semantic contamination:
    ``(id_col, max_cosine, nearest_eval_id)`` — threshold
    ``max_cosine`` and anti-join to decontaminate (mirror of
    ``decontam.ngram_decontaminate``'s contract).

    The eval set is collected to the driver once (guarded by
    ``max_eval_rows`` — eval suites are small BY DEFINITION here;
    a corpus-sized right side belongs to the LSH pair route in
    operators/similarity.py) and shipped normalized in the task
    closure. Corpus rows with null/zero embeddings score null.
    """
    import numpy as np

    n_eval = eval_df.count()
    if n_eval > max_eval_rows:
        raise ValueError(
            f"eval set has {n_eval} rows > max_eval_rows={max_eval_rows}; "
            "a corpus-sized 'eval' side is not a broadcast-scan problem — "
            "use similarity.lsh_ann_pairs / annindex for that regime"
        )
    rows = [
        (r[0], r[1])
        for r in eval_df.select(eval_id_col, eval_vec_col).collect()
        if r[1] is not None
    ]
    eval_ids, eval_mat = _normalized_matrix(rows)
    chunks = [
        (
            eval_ids[i : i + eval_chunk_rows],
            eval_mat[i : i + eval_chunk_rows],
        )
        for i in range(0, len(eval_ids), eval_chunk_rows)
    ]

    # id columns keep their INPUT types (string keys are as common as
    # integer ones — decontam.ngram_decontaminate is type-agnostic
    # and this mirrors it)
    id_type = corpus.schema[id_col].dataType.simpleString()
    eval_id_type = eval_df.schema[eval_id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, max_cosine double, "
        f"nearest_eval_id {eval_id_type}"
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col]
            best = np.full(len(pdf), -np.inf)
            best_id: list = [None] * len(pdf)
            valid = np.zeros(len(pdf), dtype=bool)
            vecs = []
            for v in pdf[vec_col]:
                if v is None or len(v) == 0:
                    vecs.append(None)
                    continue
                arr = np.asarray(v, dtype=np.float64)
                n = float(np.linalg.norm(arr))
                if n > 0.0 and math.isfinite(n):
                    vecs.append(arr / n)
                else:
                    vecs.append(None)
            idx = [i for i, v in enumerate(vecs) if v is not None]
            if idx and chunks:
                m = np.stack([vecs[i] for i in idx])
                for cids, cmat in chunks:
                    sims = m @ cmat.T
                    arg = sims.argmax(axis=1)
                    mx = sims[np.arange(len(idx)), arg]
                    for row, (i, a, s) in enumerate(zip(idx, arg, mx)):
                        if s > best[i]:
                            best[i] = s
                            best_id[i] = cids[a]
                    valid[idx] = True
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "max_cosine": [
                        best[i] if valid[i] else None
                        for i in range(len(pdf))
                    ],
                    "nearest_eval_id": [
                        best_id[i] if valid[i] else None
                        for i in range(len(pdf))
                    ],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(run, out_schema)


def semantic_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
) -> DataFrame:
    """The composed step: corpus rows whose max eval cosine is BELOW
    ``threshold`` (rows with no scorable embedding are KEPT — absence
    of evidence; filter upstream if embeddings are mandatory)."""
    if not -1.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [-1, 1], got {threshold}")
    scored = embedding_decontaminate(
        corpus, eval_df, id_col, vec_col, eval_id_col, eval_vec_col
    )
    tainted = scored.where(
        F.col("max_cosine") >= F.lit(float(threshold))
    ).select(id_col)
    return corpus.join(tainted, on=id_col, how="left_anti")
