"""Benchmark harness: times every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology: warm engine, cold data. Each query runs twice -- an
untimed warmup that absorbs one-time JVM/codegen/Python-worker
startup, then the timed run. ``spark.catalog.clearCache()`` runs
between the two so any ``.cache()`` an operator builds internally
(sketch frames etc.) is dropped: the timed run re-does ALL data work
from the parquet scan up; only engine warmup (JIT, codegen cache,
worker processes) carries over. That is the steady-state throughput a
long-running cluster job sees, and it makes per-query numbers
independent of catalog ordering. Queries that intentionally memoize
scratch results across runs (streaming replay) are timed on their
first, materializing run instead.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _bench_reference_pipeline(spark, sf_dir: str) -> float:
    """Reference-parity ingest throughput (the workload the original
    repo actually runs): JSON lines -> schema-drift repair ->
    epoch-ms normalization -> Hive-partitioned sink. Vision-shaped
    messages are synthesized from the events table (one JSON object
    per event) outside the timed region."""
    import time

    from pyspark.sql import functions as F

    from utc_cuip_kafka_aws_connector_spark.pipeline import VISION_SCHEMA, normalize_vision
    from utc_cuip_kafka_aws_connector_spark.sources.batch import load_table, read_json_lines
    from utc_cuip_kafka_aws_connector_spark.sources.sinks import write_partitioned

    scratch = "/tmp/spark_graft_io/bench_pipeline"
    ev = load_table(spark, sf_dir, "events")
    msgs = ev.select(
        F.to_json(
            F.struct(
                F.unix_millis("ts").alias("timestamp"),
                F.concat(F.lit("cam-"), (F.col("user_id") % 4).cast("string")).alias("camera_id"),
                F.array(
                    F.struct(
                        F.col("value").alias("x"),
                        F.col("value").alias("y"),
                        F.col("event_type").alias("label"),
                    )
                ).alias("locations"),
            )
        ).alias("value")
    )
    msgs.write.mode("overwrite").text(f"{scratch}/input")

    t0 = time.perf_counter()
    df = normalize_vision(read_json_lines(spark, f"{scratch}/input", VISION_SCHEMA))
    write_partitioned(df, f"{scratch}/lake", entity_col="camera_id", mode="overwrite")
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG
    from utc_cuip_kafka_aws_connector_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # warmup: trigger JVM init + whole-stage codegen + shuffle machinery
    # once, so per-query numbers reflect steady-state execution
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10).collect()
    CATALOG["q01_pricing_summary"].builder(spark, sf_dir).collect()

    # Queries that memoize scratch state across invocations (the
    # streaming replay materializes once per SF): a second run would
    # measure only the read-back, so time the first run for these.
    single_run = {"q60_streaming_tumbling"}

    def drop_all_blocks() -> None:
        """clearCache only drops table caches; localCheckpoint blocks
        (q74/q20/connected-components rounds) persist until their RDD
        is GC'd and otherwise accumulate across the run, squeezing
        execution memory for later queries and skewing per-query
        numbers by run position. Unpersist every persistent RDD."""
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            jrdd.unpersist()

    timings: dict[str, float] = {}
    for name, entry in CATALOG.items():
        if name not in single_run:
            entry.builder(spark, sf_dir).collect()  # warmup (untimed)
            drop_all_blocks()  # timed run starts data-cold
            # Pay accumulated GC debt OUTSIDE the timed region: 150+
            # query executions in one JVM otherwise tax late-catalog
            # queries with garbage from earlier ones, skewing
            # per-query numbers by run position.
            spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        entry.builder(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)
        drop_all_blocks()
        print(f"  {name}: {timings[name]}s", file=sys.stderr, flush=True)

    timings["pipeline_ingest"] = round(_bench_reference_pipeline(spark, sf_dir), 4)
    print(f"  pipeline_ingest: {timings['pipeline_ingest']}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
