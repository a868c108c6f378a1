"""sf1-equivalent scale probe for the r19 operators (the
scale_probe_sf1 / r16ops / r17ops / r18ops recipe: no sf1 fixture
exists, so corpora are synthesized at sf1's scale at the shape the
operator actually consumes).

Probes (each timed to a materialized count, best-of-2 warm; sizes
chosen so the per-direction candidate-pair count matches the r18
negatives probe's regime — bitext runs BOTH directions, so 5k x 50k
here produces ~2x the pair volume of r18's 1k x 100k):
  bitext/fold-d64    mine_bitext forward strategy, 5k src x 50k
                     tgt, dim 64, 64 cells, nprobe 4 — the fold
                     (oracle-exact) kernel (~31M scored pairs/run)
  bitext/gemm-d64    the same setting through kernel="gemm" (one
                     GEMM per cell per direction; vectors ship once
                     per cell) — the r19 production kernel
  bitext/fold-d768   5k x 5k at dim 768 (high-dim regime where
                     the fold scales linearly with dim)
  bitext/gemm-d768   same through the GEMM kernel
  negatives/ivf-d64  hard_negatives at the r18 production setting
                     (100k corpus x 1k anchors, 64 cells, nprobe 4)
                     on the r19 tree — the no-op distinct removed;
                     comparable to r18's 7.46 s BENCH_NOTES row

Prints one line per probe; paste the table into BENCH_NOTES.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.session import get_spark


def timed(label, fn, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:<20s} {best:7.2f}s  (rows={n})", flush=True)


def _emb_frame(spark, n, dim, seed_off=0):
    # deterministic pseudo-random embeddings synthesized JVM-side
    # (hash-folded), no driver data path
    cols = [
        (
            (F.pmod(F.xxhash64(F.col("id") + seed_off, F.lit(j)), 1000)
             .cast("double") / 500.0 - 1.0)
        )
        for j in range(dim)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
    )


def main():
    from utc_cuip_kafka_aws_connector_spark.operators.bitext import (
        mine_bitext,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.negatives import (
        hard_negatives,
    )

    spark = get_spark()

    src64 = _emb_frame(spark, 5_000, 64).persist()
    tgt64 = _emb_frame(spark, 50_000, 64, seed_off=7_777_777).persist()
    src64.count(), tgt64.count()
    kw64 = dict(
        k=4, threshold=1.0, strategy="forward",
        method="ivf", n_centroids=64, nprobe=4,
    )
    timed("bitext/fold-d64", lambda: mine_bitext(src64, tgt64, **kw64).count())
    timed(
        "bitext/gemm-d64",
        lambda: mine_bitext(src64, tgt64, kernel="gemm", **kw64).count(),
    )
    src64.unpersist(), tgt64.unpersist()

    src768 = _emb_frame(spark, 5_000, 768).persist()
    tgt768 = _emb_frame(spark, 5_000, 768, seed_off=7_777_777).persist()
    src768.count(), tgt768.count()
    kw768 = dict(
        k=4, threshold=1.0, strategy="forward",
        method="ivf", n_centroids=64, nprobe=4,
    )
    timed(
        "bitext/fold-d768", lambda: mine_bitext(src768, tgt768, **kw768).count()
    )
    timed(
        "bitext/gemm-d768",
        lambda: mine_bitext(src768, tgt768, kernel="gemm", **kw768).count(),
    )
    src768.unpersist(), tgt768.unpersist()

    corpus = _emb_frame(spark, 100_000, 64).withColumn(
        "label", F.pmod(F.xxhash64("vec_id"), 50)
    ).persist()
    corpus.count()
    anchors = corpus.filter(F.col("vec_id") % 100 == 0)
    timed(
        "negatives/ivf-d64",
        lambda: hard_negatives(
            corpus, k=5, label_col="label", anchors=anchors,
            method="ivf", n_centroids=64, nprobe=4,
        ).count(),
    )
    corpus.unpersist()


if __name__ == "__main__":
    main()
