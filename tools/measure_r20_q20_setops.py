"""Optimization round-1 MEASUREMENT: q20_set_ops count-based rewrite A/B.

All four set-op semantics over the same two inputs (INTERSECT, EXCEPT,
INTERSECT ALL, EXCEPT ALL) are pure functions of the per-key
multiplicities (cf, co) of the key in each side:

  intersect      -> 1 copy  iff cf > 0 and co > 0
  except         -> 1 copy  iff cf > 0 and co == 0
  intersect_all  -> min(cf, co) copies
  except_all     -> max(cf - co, 0) copies

so the whole query is ONE scan of orders + ONE map-side-combined
aggregate on o_custkey + a scan-local explode, instead of two
localCheckpoint materializations re-shuffled by four set operators
(8 Exchanges of the key column). Guide §2.3 (aggregate before you
shuffle) + §2.4 (remove shuffles outright).

This script (a) verifies the rewrite is row-multiset-identical to the
current builder on sf0.1, (b) times both interleaved ABAB with the
bench methodology (warm engine, cold data, collect() as the timed
action), (c) brackets the window with /proc/stat steal.

Run: PYTHONPATH=/root/repo python tools/measure_r20_q20_setops.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.session import get_spark
from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG
from utc_cuip_kafka_aws_connector_spark.sources.batch import load_table

spark = get_spark(app_name="q20ab")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"


def steal_jiffies() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def drop_all_blocks():
    spark.catalog.clearCache()
    for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        jrdd.unpersist()


def old_builder():
    return CATALOG["q20_set_ops"].builder(spark, SF)


def new_builder():
    orders = load_table(spark, SF, "orders")
    cnt = (
        orders.filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("cf"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("co"),
        )
    )
    cf, co = F.col("cf"), F.col("co")
    ops = F.array(
        F.struct(
            F.lit("intersect").alias("op"),
            F.when((cf > 0) & (co > 0), F.lit(1)).otherwise(F.lit(0)).cast("long").alias("reps"),
        ),
        F.struct(
            F.lit("except").alias("op"),
            F.when((cf > 0) & (co == 0), F.lit(1)).otherwise(F.lit(0)).cast("long").alias("reps"),
        ),
        F.struct(F.lit("intersect_all").alias("op"), F.least(cf, co).cast("long").alias("reps")),
        F.struct(
            F.lit("except_all").alias("op"),
            F.greatest(cf - co, F.lit(0)).cast("long").alias("reps"),
        ),
    )
    return (
        cnt.select("o_custkey", F.explode(ops).alias("e"))
        .filter(F.col("e.reps") > 0)
        .select(
            F.col("e.op").alias("op"),
            "o_custkey",
            F.explode(F.sequence(F.lit(1), F.col("e.reps"))).alias("_i"),
        )
        .select("op", "o_custkey")
    )


# --- bit-identity: multiset of rows ---------------------------------------
a = sorted(tuple(r) for r in old_builder().collect())
b = sorted(tuple(r) for r in new_builder().collect())
print(f"rows old={len(a)} new={len(b)} identical={a == b}", flush=True)
assert a == b, "REWRITE NOT IDENTICAL"

# schema must match too (op string, o_custkey same type)
print("old schema:", old_builder().schema.simpleString())
print("new schema:", new_builder().schema.simpleString())

# --- plans -----------------------------------------------------------------
for label, b_ in (("old", old_builder), ("new", new_builder)):
    plan = b_()._sc._jvm.PythonSQLUtils.explainString(
        b_()._jdf.queryExecution(), "formatted"
    )
    n_ex = plan.count("Exchange")
    print(f"{label}: {n_ex} Exchange mentions, plan lines {len(plan.splitlines())}")

# --- interleaved ABAB timing ------------------------------------------------
probe_t0 = time.perf_counter()
spark.range(50_000_000).selectExpr("sum(id * 2) AS s").collect()
spark.range(50_000_000).selectExpr("sum(id * 2) AS s").collect()
probe = time.perf_counter() - probe_t0
print(f"codegen probe (2x50M): {probe:.3f}s", flush=True)

old_builder().collect()  # warm both plans
new_builder().collect()

s0 = steal_jiffies()
times = {"old": [], "new": []}
for rep in range(4):
    for label, b_ in (("old", old_builder), ("new", new_builder)):
        drop_all_blocks()
        t0 = time.perf_counter()
        b_().collect()
        times[label].append(time.perf_counter() - t0)
s1 = steal_jiffies()
print(f"steal bracket: +{s1 - s0} jiffies")
for label, ts in times.items():
    print(f"{label}: {['%.3f' % t for t in ts]} min={min(ts):.3f} med={sorted(ts)[len(ts)//2]:.3f}")
