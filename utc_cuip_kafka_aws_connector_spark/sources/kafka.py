"""Kafka source (reference R1/R2, run.py:27-56) as Structured Streaming.

The reference ran N consumer processes with a bounded queue
(run.py:84-115); here the Kafka source handles partition-parallel
ingest, back-pressure (maxOffsetsPerTrigger) and offset tracking
(checkpointLocation) natively. The per-message ``json.loads`` +
drift-repair worker (run.py:45-51) becomes a declarative column
transform that runs distributed on executors.

The spark-sql-kafka package is not bundled in this image, so
``kafka_reader`` only *builds* the reader (validated at ``.load()``
by Spark); ``decode_json_payload`` is format-agnostic and fully
testable on any DataFrame with (topic, value) columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamReader


def kafka_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str],
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
) -> DataStreamReader:
    """R1: subscribe to topics from the beginning (reference
    ``auto.offset.reset=beginning``, run.py:31). Rate control via
    maxOffsetsPerTrigger replaces the bounded queue (run.py:85);
    minPartitions replaces the worker pool (run.py:87-115)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader


def file_message_reader(
    spark: SparkSession,
    input_dir: str,
    topic: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Broker-less stand-in for ``kafka_reader(...).load()``: streams
    text files as (topic, value) rows -- the exact column contract the
    Kafka source produces -- so decode -> route -> sink pipelines run
    end-to-end (reference run.py:27-56's poll loop) without broker
    jars. Swapping this for the real Kafka source changes ONE call;
    every downstream operator is identical.

    ``max_files_per_trigger`` bounds each micro-batch the way
    ``maxOffsetsPerTrigger`` bounds the Kafka source -- the
    reference's count-based flush cadence (run.py:122-125: buffer N
    messages, flush, repeat) expressed as source-side back-pressure:
    every N units of input becomes one flush through the sink."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(input_dir).select(F.lit(topic).alias("topic"), F.col("value"))


def decode_json_payload(df: DataFrame, schema) -> DataFrame:
    """R2: JSON-deserialize the Kafka ``value`` into typed columns,
    keeping ``topic`` for routing (R5). PERMISSIVE mode tolerates
    schema drift the way the reference's dict-of-whatever did
    (run.py:45); repair expressions live in pipeline.normalize_*."""
    return df.select(
        F.col("topic"),
        F.from_json(F.col("value").cast("string"), schema, {"mode": "PERMISSIVE"}).alias("e"),
    ).select("topic", "e.*")
