"""Round-21 q128 measurement: fold-kernel IVF (the r18-r20 declared
shape) vs the GEMM cell kernel (negatives.hard_negatives_gemm, the
documented production path) at the exhaustive nprobe == n_centroids
setting where both provably equal the brute baseline.

Checks, per scale factor:
  1. row-for-row equality (oracle_utils.normalize, full float bits on
     the ROUNDED output surface) of old vs new Spark builders;
  2. both against the DuckDB all-pairs oracle (the driver's check).
Then interleaved ABAB timing at sf0.1 with the bench methodology
(warm engine, cold data, collect()).

Run: PYTHONPATH=/root/repo:/root/repo/tests python tools/measure_r21_q128_gemm.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import functions as F

from oracle_utils import normalize, run_duckdb
from utc_cuip_kafka_aws_connector_spark.session import get_spark
from utc_cuip_kafka_aws_connector_spark.operators.negatives import (
    hard_negatives,
    hard_negatives_gemm,
)
from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG
from utc_cuip_kafka_aws_connector_spark.sources.batch import load_table

spark = get_spark(app_name="q128gemm")
spark.sparkContext.setLogLevel("ERROR")

ORACLE = CATALOG["q128_hard_negatives"].oracle


def old_builder(sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    out = hard_negatives(
        emb, k=5, id_col="vec_id", vec_col="embedding", label_col="label",
        anchors=emb.filter(F.col("vec_id") % 10 == 0),
        method="ivf", n_centroids=8, nprobe=8,
    )
    return out.select(
        "anchor_id", "neg_id", F.round(F.col("cos_sim"), 4).alias("cos_sim"), "rank"
    )


def new_builder(sf_dir: str, n_cells: int = 32):
    emb = load_table(spark, sf_dir, "embeddings")
    out = hard_negatives_gemm(
        emb, k=5, id_col="vec_id", vec_col="embedding", label_col="label",
        anchors=emb.filter(F.col("vec_id") % 10 == 0),
        n_centroids=n_cells, nprobe=n_cells,
    )
    return out.select(
        "anchor_id", "neg_id", F.round(F.col("cos_sim"), 4).alias("cos_sim"), "rank"
    )


def drop_all_blocks():
    spark.catalog.clearCache()
    for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        jrdd.unpersist()


for sf in ("sf0.001", "sf0.01", "sf0.1"):
    sf_dir = f"/root/testdata/{sf}"
    old_rows = normalize(old_builder(sf_dir).toPandas())
    new_rows = normalize(new_builder(sf_dir).toPandas())
    duck = normalize(run_duckdb(ORACLE, sf_dir))
    print(
        f"{sf}: n={len(old_rows)} old==new: {old_rows == new_rows} "
        f"old==oracle: {old_rows == duck} new==oracle: {new_rows == duck}",
        flush=True,
    )

# interleaved ABAB timing at sf0.1
sf_dir = "/root/testdata/sf0.1"
for fn in (old_builder, new_builder):  # warm both plans
    fn(sf_dir).collect()
times = {"old": [], "new": []}
for _ in range(4):
    for name, fn in (("old", old_builder), ("new", new_builder)):
        drop_all_blocks()
        t0 = time.perf_counter()
        fn(sf_dir).collect()
        times[name].append(time.perf_counter() - t0)
for name, ts in times.items():
    ts_s = sorted(ts)
    print(f"{name}: {['%.2f' % t for t in ts]} min {ts_s[0]:.2f} med {ts_s[len(ts_s)//2]:.2f}", flush=True)
