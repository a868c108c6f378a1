"""CLI entry point (reference R24 parity, run.py:134-264).

The reference parsed argv by hand, validated AWS env vars, loaded a
YAML config, and launched consumer processes. Here the equivalent is
an argparse front-end over the declarative pipeline: JSON input ->
topic-family normalization -> Hive-partitioned sink, with unknown
topics quarantined (R19 fixed: routed, not dropped).

    python -m utc_cuip_kafka_aws_connector_spark ingest \
        --topic cuip_vision_events --input events.jsonl --output ./lake

S3 output works by pointing --output at s3a:// with fs.s3a.*
credentials configured on the cluster (instance profile preferred) --
no env-var checks in code, unlike the reference's hard exit
(run.py:224-248).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

from utc_cuip_kafka_aws_connector_spark.pipeline import (
    AIR_SCHEMA,
    AIR_MARKER,
    VISION_SCHEMA,
    VISION_TOPIC,
    normalize_air,
    normalize_vision,
)
from utc_cuip_kafka_aws_connector_spark.sources.batch import read_json_lines
from utc_cuip_kafka_aws_connector_spark.sources.sinks import write_partitioned


def run_ingest(
    spark: SparkSession, topic: str, input_path: str, output_path: str, fmt: str = "parquet"
) -> str:
    """Batch-ingest one topic's JSON lines into the partitioned lake.
    Returns the route taken ('vision' | 'air' | 'dead_letter')."""
    if topic == VISION_TOPIC:
        df = normalize_vision(read_json_lines(spark, input_path, VISION_SCHEMA))
        write_partitioned(df, output_path, entity_col="camera_id", fmt=fmt)
        return "vision"
    if AIR_MARKER in topic:
        df = normalize_air(read_json_lines(spark, input_path, AIR_SCHEMA))
        write_partitioned(df, output_path, entity_col="nicename", fmt=fmt)
        return "air"
    # R19 dead-letter: quarantine raw lines instead of dropping
    spark.read.text(input_path).write.mode("append").text(f"{output_path}/dead_letter/{topic}")
    return "dead_letter"


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="utc_cuip_kafka_aws_connector_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    ingest = sub.add_parser("ingest", help="batch-ingest JSON lines into the partitioned lake")
    ingest.add_argument("--topic", required=True, help="Kafka topic name the file came from")
    ingest.add_argument("--input", required=True, help="JSON-lines input path")
    ingest.add_argument("--output", required=True, help="lake root (local or s3a://)")
    ingest.add_argument("--format", default="parquet", choices=["parquet", "csv"])
    args = parser.parse_args(argv)

    from utc_cuip_kafka_aws_connector_spark.session import get_spark

    spark = get_spark(app_name="ingest")
    route = run_ingest(spark, args.topic, args.input, args.output, args.format)
    print(f"ingested topic={args.topic} route={route} output={args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
