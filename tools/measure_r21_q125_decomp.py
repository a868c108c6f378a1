"""Optimization round-1 MEASUREMENT (stamped in OPTIMIZATION_r20.md).

q125_sb_match_profile decomposition at sf0.1 — where does the time go?
ngramlm.py is frozen this round (r19-cohort fingerprint freeze), so this
script only MEASURES the existing pipeline stage by stage to turn the
round-2 stamp ("needs a decomposition measurement before a specific
rewrite") into a concrete design. Timed with the bench methodology:
warm engine (one untimed run of each timed plan), cold data
(clearCache + unpersist), noop sink as the action (guide §1.4) so the
result set size cannot dominate.

Stages measured:
  A. train-side: sb_train count tables + stupid_backoff_tables derivation
     (materialize every per-order score table with noop).
  B. events-frame construction alone (explode + per-order gram strings,
     NO score joins) over the full corpus.
  C. events + per-order broadcast left joins (_sb_events complete).
  D. the full q125 builder (profile aggregation on top of C).

Run: PYTHONPATH=/root/repo python tools/measure_r21_q125_decomp.py
"""
import time
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.session import get_spark
from utc_cuip_kafka_aws_connector_spark.operators import ngramlm
from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
    sb_match_profile,
    sb_train,
    stupid_backoff_tables,
    _sb_events,
    _padded,
    _tokens,
)

spark = get_spark(app_name="q125decomp")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"


def drop_all_blocks():
    spark.catalog.clearCache()
    for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        jrdd.unpersist()


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(label, fn, reps=3):
    fn()  # warm the plan
    ts = []
    for _ in range(reps):
        drop_all_blocks()
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:28s} {['%.2f' % t for t in ts]} min {min(ts):.2f}", flush=True)
    return min(ts)


docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
train = docs.where(F.col("doc_id") % 4 == 0)


def stage_a():
    model = sb_train(train.select("text"), text_col="text", order=2)
    tables, _n = stupid_backoff_tables(model)
    for k in sorted(tables):
        noop(tables[k])


def _events_frame():
    order = 2
    padded = docs.select("doc_id", _padded(_tokens("text"), order).alias("p"))
    pos = padded.select(
        "doc_id",
        F.col("p"),
        F.explode(F.sequence(F.lit(order), F.size(F.col("p")))).alias("j"),
    )
    gram_cols = [
        F.array_join(F.slice(F.col("p"), F.col("j") - F.lit(k - 1), k), " ").alias(f"g{k}")
        for k in range(1, order + 1)
    ]
    return pos.select("doc_id", *gram_cols)


def stage_b():
    noop(_events_frame())


def stage_c():
    model = sb_train(train.select("text"), text_col="text", order=2)
    tables, _n = stupid_backoff_tables(model)
    noop(_sb_events(docs, model, tables, "text", "doc_id", True))


def stage_d():
    model = sb_train(train.select("text"), text_col="text", order=2)
    noop(sb_match_profile(docs, model, text_col="text", id_col="doc_id"))


probe0 = time.perf_counter()
spark.range(50_000_000).selectExpr("sum(id * 2) AS s").collect()
spark.range(50_000_000).selectExpr("sum(id * 2) AS s").collect()
t0 = time.perf_counter()
spark.range(50_000_000).selectExpr("sum(id * 2) AS s").collect()
print(f"probe {time.perf_counter() - t0:.4f}", flush=True)

timeit("A train+score tables", stage_a)
timeit("B events frame only", stage_b)
timeit("C events + joins", stage_c)
timeit("D full profile", stage_d)
