"""sf1-equivalent scale probe for langid and count-only Stupid
Backoff (owed since the r14 brief: extend BENCH_NOTES' scale-shapes
table past the 1.5M gram rows sf0.1 produces, and check the
broadcast_model guidance at ~15M exploded rows).

No sf1 fixture exists, so the corpus is synthesized AT sf1's scale
from sf0.1: each document replicated 10x under shifted doc_ids with a
distinct word prepended per replica (so texts are near- but not
exact-copies and per-replica gram sets differ at the margin). ~50k
docs / ~15M chars — langid's char-trigram explode produces ~15M gram
rows, the crossover regime the r13/r14 guidance tables stop short of.

Probes (each timed to a materialized count; predict/score are
best-of-2 warm, the two TRAIN probes are deliberately single-run
COLD — training runs once in real pipelines, and a second run would
hit the freshly-cached model tables and measure nothing):
  langid train        one count aggregation over the exploded grams
  langid predict      broadcast_model=True vs False at ~15M rows
  sb_train (order 2)  count-only tables on the doc_id%4 quarter
  sb_score            broadcast_model=True vs False over all docs

Usage (repo root, quiet host): python tools/scale_probe_sf1.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def timed(label: str, fn, runs: int = 2) -> float:
    best = min(_once(fn) for _ in range(runs))
    print(f"{label}: {best:.2f} s", flush=True)
    return best


def _once(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from utc_cuip_kafka_aws_connector_spark.operators.langid import (
        langid_predict,
        langid_train,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
        sb_score,
        sb_train,
    )
    from utc_cuip_kafka_aws_connector_spark.session import get_spark
    from utc_cuip_kafka_aws_connector_spark.sources.batch import load_table

    spark = get_spark(app_name="sf1-scale-probe")
    base = tempfile.mkdtemp(prefix="sf1_")
    src = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", "lang"
    )
    reps = spark.range(10).select(F.col("id").alias("rep"))
    corpus_path = os.path.join(base, "docs")
    (
        src.crossJoin(reps)
        .select(
            (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
            F.concat(
                F.lit("rep"), F.col("rep").cast("string"), F.lit(" "),
                F.col("text"),
            ).alias("text"),
            "lang",
        )
        .repartition(32)
        .write.parquet(corpus_path)
    )
    docs = spark.read.parquet(corpus_path)
    n, chars = docs.agg(
        F.count(F.lit(1)), F.sum(F.length("text"))
    ).first()
    print(f"corpus: {n} docs, {chars} chars "
          f"(~{chars // 1_000_000}M char-trigram gram rows)")

    model = {}

    def train():
        model["m"] = langid_train(
            docs.where(F.col("doc_id") % 4 == 0), label_col="lang"
        )
        for t in ("likelihood", "priors"):
            model["m"][t] = model["m"][t].cache()
            model["m"][t].count()

    timed("langid train (quarter corpus)", train, runs=1)
    for bc in (True, False):
        timed(
            f"langid predict broadcast_model={bc}",
            lambda bc=bc: langid_predict(
                docs, model["m"], broadcast_model=bc
            ).select(F.count(F.lit(1))).collect(),
        )

    sb = {}

    def sbt():
        sb["m"] = sb_train(
            docs.where(F.col("doc_id") % 4 == 0).select("text"),
            text_col="text", order=2,
        )
        for t in sb["m"]["raw"].values():
            t.cache().count()

    timed("sb_train order-2 (quarter corpus)", sbt, runs=1)
    for bc in (True, False):
        timed(
            f"sb_score broadcast_model={bc}",
            lambda bc=bc: sb_score(
                docs, sb["m"], broadcast_model=bc
            ).select(F.count(F.lit(1))).collect(),
        )
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
