"""sf1-equivalent scale probe for the r19 WordPiece trainer
(tools/scale_probe_* recipe): synthesizes a 500k-document corpus of
Zipf-drawn words from a 30k-word synthetic vocabulary — the histogram
shape real text produces under Heaps' law — and times:

  wptrain/histogram   the corpus-scale leg alone (Arrow
                      normalize+pretokenize scan -> map-side-combined
                      groupBy), materialized to a count
  wptrain/train-8k    the full wordpiece_train at vocab_size=8000
                      (histogram + driver likelihood loop + id
                      assignment) — the production-sized call
  bpetrain/train-1k   bpe_train_merges at 1000 merges over the SAME
                      corpus, for a like-for-like reference point
                      (different algorithm: count argmax + heap vs
                      likelihood rescore)

Prints one line per probe; paste into BENCH_NOTES.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.session import get_spark


def timed(label, fn, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:<20s} {best:7.2f}s  (n={n})", flush=True)


def main():
    from utc_cuip_kafka_aws_connector_spark.operators.bpetrain import (
        bpe_train_merges,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.wptrain import (
        word_histogram,
        wordpiece_train,
    )

    spark = get_spark()

    # 500k docs x 40 words; each word is the base-36 spelling of a
    # skewed rank (two independent uniform draws multiplied, giving a
    # heavy head + long tail), prefixed 'w' so every word starts
    # alphabetic — ~30k distinct words, the Heaps'-law histogram
    # shape real text produces (verified in-run: the histogram count
    # is printed)
    words_per_doc = 40
    word = lambda j: F.concat(  # noqa: E731
        F.lit("w"),
        F.lower(
            F.conv(
                (
                    (
                        F.pmod(F.xxhash64(F.col("id"), F.lit(j)), 10_000)
                        * F.pmod(
                            F.xxhash64(F.col("id"), F.lit(j), F.lit(1)), 3
                        )
                    )
                    % 30_000
                ).cast("string"),
                10,
                36,
            )
        ),
    )
    corpus = (
        spark.range(500_000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ", *[word(j) for j in range(words_per_doc)]
            ).alias("text"),
        )
        .persist()
    )
    corpus.count()

    timed("wptrain/histogram", lambda: word_histogram(corpus).count())
    timed(
        "wptrain/train-8k",
        lambda: len(wordpiece_train(corpus, vocab_size=8000)),
        runs=1,
    )
    timed(
        "bpetrain/train-1k",
        lambda: len(bpe_train_merges(corpus, 1000)),
        runs=1,
    )
    corpus.unpersist()


if __name__ == "__main__":
    main()
