"""sf1-equivalent scale probe for the r17 operators (the
scale_probe_sf1 / scale_probe_r16ops recipe: no sf1 fixture exists,
so corpora are synthesized at sf1's scale from sf0.1 or generated at
the shape the operator actually consumes).

Probes (each timed to a materialized count, best-of-2 warm):
  lenbatch/length   bucketed_batches order=length over 500k measured
                    docs (pow2 buckets, shard_hex=1) + padding_report
                    — the applyInPandas group-sort path
  lenbatch/hash     the same corpus through the random-batch baseline
                    (prices the sort against the shuffle-free order)
  bestof            best_of_n n=4 over 500k responses / 50k prompts
                    — the single-exchange window shape
  doremi/agg        domain_excess_loss over 1M per-example loss rows
                    x 20 domains x 50 steps — the one-aggregation
                    corpus pass
  doremi/fold       doremi_weights per-step replay on the aggregate
                    (20 x 50 = 1000 collected cells) — driver fold,
                    should be milliseconds
  q127/encode       the registered q127 builder at sf0.1 (the
                    mapInPandas heap-encode scan it pins)

Prints one line per probe; paste the table into BENCH_NOTES.
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
    print(f"{label:<20s} {best:7.2f}s  (rows={n})", flush=True)


def main():
    from utc_cuip_kafka_aws_connector_spark.operators.doremi import (
        domain_excess_loss,
        doremi_weights,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.lenbatch import (
        bucketed_batches,
        padding_report,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.prefpairs import (
        best_of_n,
    )
    from utc_cuip_kafka_aws_connector_spark.plans.catalog import (
        staged_q127_bytelevel_encode,
    )

    spark = get_spark(app_name="scale_probe_r17ops")

    # 500k measured docs, Zipf-ish lengths 1..16k (deterministic)
    measured = spark.range(500_000).select(
        F.col("id").alias("doc_id"),
        (
            F.pmod(F.xxhash64(F.col("id")), F.lit(16_384)) + 1
        ).alias("n_tokens"),
    )
    for order in ("length", "hash"):
        def run(o=order):
            b = bucketed_batches(
                measured, batch_size=64, shard_hex=1, order=o
            )
            rep = padding_report(b).head()
            print(
                f"    waste_frac[{o}] = {rep['waste_frac']:.4f} "
                f"({rep['n_batches']} batches, "
                f"{rep['n_remainder_batches']} remainders)",
                flush=True,
            )
            return rep["n_rows"]

        timed(f"lenbatch/{order}", run)

    responses = spark.range(500_000).select(
        F.pmod(F.col("id"), F.lit(50_000)).alias("prompt_id"),
        F.col("id").alias("response_id"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(10_000)) / 1000.0)
        .alias("score"),
    )
    timed(
        "bestof",
        lambda: best_of_n(responses, n=4, min_score=1.0).count(),
    )

    losses = spark.range(1_000_000).select(
        F.pmod(F.col("id"), F.lit(50)).alias("step"),
        F.concat(
            F.lit("dom"), F.pmod(F.xxhash64(F.col("id")), F.lit(20))
        ).alias("domain"),
        (2.0 + F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1000)) / 500.0)
        .alias("proxy_loss"),
        (2.0 + F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(1000)) / 1000.0)
        .alias("ref_loss"),
    )
    timed(
        "doremi/agg",
        lambda: domain_excess_loss(losses, step_col="step").count(),
    )
    lam = domain_excess_loss(losses, step_col="step").cache()
    lam.count()
    timed(
        "doremi/fold",
        lambda: doremi_weights(lam, step_col="step").count(),
    )
    lam.unpersist()

    timed(
        "q127/encode",
        lambda: staged_q127_bytelevel_encode(
            spark, "/root/testdata/sf0.1"
        ).count(),
    )

    from utc_cuip_kafka_aws_connector_spark.operators.epochs import (
        materialize_epochs,
    )

    corpus = spark.range(500_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("dom"), F.pmod(F.xxhash64(F.col("id"), F.lit(9)), F.lit(20))
        ).alias("lang"),
    )
    alloc = spark.createDataFrame(
        [(f"dom{i}", 1.0 + (i % 7) * 0.35) for i in range(20)],
        "lang string, epochs double",
    )

    def run_epochs():
        out = materialize_epochs(corpus, alloc)
        n = out.count()
        print(f"    materialized {n} rows from 500k", flush=True)
        return n

    timed("epochs/materialize", run_epochs)


if __name__ == "__main__":
    main()
