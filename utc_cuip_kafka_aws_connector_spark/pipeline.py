"""Reference-parity ingest pipeline, rebuilt Spark-first.

The reference (/root/reference) consumes JSON IoT messages from one
vision topic + N air-quality topics, repairs schema drift, converts
epoch-ms timestamps, and appends to Hive-partitioned per-entity
per-month files (run.py:17-56, df_manager.py:40-125). Here the whole
pipeline is a declarative DataFrame transform chain; the write-side
partitioning (entity/year=Y/month=M) reproduces the reference's path
scheme (df_manager.py:82-84, 101-103) via ``partitionBy`` -- no
driver-side loops over months/entities (reference bugs B1/B2 are
structurally impossible in this formulation).

Known reference bugs intentionally fixed (SURVEY.md §2.A):
- B1: month windows here are closed-open by construction (year/month
  derived columns), so month-boundary rows are never dropped.
- B3: no read-modify-write append; the sink is append/idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

VISION_TOPIC = "cuip_vision_events"
# Reference parity: df_manager.py:94 routes any topic containing the
# substring "AIR_QUALITY" (not just the "_AIR_QUALITY" suffix), so
# "AIR_QUALITY" or "AIR_QUALITY_EAST" route to the air family too.
AIR_MARKER = "AIR_QUALITY"

# Explicit, versioned topic-family schemas (SURVEY §1.3). The reference
# let pandas infer the union of keys per batch (df_manager.py:54); here
# drift is tolerated by PERMISSIVE parsing + repair expressions instead.
VISION_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType()),  # epoch ms (df_manager.py:58)
        T.StructField("camera_id", T.StringType()),
        T.StructField(
            "locations",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("x", T.DoubleType()),
                        T.StructField("y", T.DoubleType()),
                        T.StructField("label", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("hit_counts", T.LongType()),
    ]
)

AIR_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType()),
        T.StructField("nicename", T.StringType()),
        T.StructField("pm2_5", T.DoubleType()),
        T.StructField("pm10", T.DoubleType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("humidity", T.DoubleType()),
    ]
)


def with_event_time(df: DataFrame) -> DataFrame:
    """R6 + R10 + R12: drop rows without a timestamp (reference
    df_manager.py:36-38), convert epoch-ms to a timestamp column
    (df_manager.py:58), and drop epoch-garbage rows whose year is 1970
    (df_manager.py:65-68)."""
    return (
        df.filter(F.col("timestamp").isNotNull())
        .withColumn("timestamp_iso", F.timestamp_millis(F.col("timestamp")))
        .filter(F.year("timestamp_iso") != 1970)
    )


def normalize_vision(df: DataFrame) -> DataFrame:
    """Vision-topic normalization (reference run.py:46-51):
    - R3 schema-drift repair: hit_counts := coalesce(hit_counts,
      size(locations)) -- the field "wasn't implemented til later".
    - R4 complex->string: keep the native array AND a to_json copy for
      byte-compatible CSV output (run.py:51 stringified in place).
    """
    return with_event_time(df).select(
        "timestamp",
        "timestamp_iso",
        "camera_id",
        F.coalesce(F.col("hit_counts"), F.size(F.col("locations")).cast("long")).alias("hit_counts"),
        F.to_json(F.col("locations")).alias("locations"),
    )


def normalize_air(df: DataFrame) -> DataFrame:
    """Air-quality normalization: required timestamp + non-null entity
    key (reference skipped NaN nicename groups at write time,
    df_manager.py:104-105; here the filter is explicit and early)."""
    return with_event_time(df).filter(F.col("nicename").isNotNull())


def route_topics(df: DataFrame, topic_col: str = "topic") -> tuple[DataFrame, DataFrame, DataFrame]:
    """R5 + R19: demultiplex by topic family. Returns
    (vision, air_quality, dead_letter). The reference *dropped*
    unknown-topic data with an error print (df_manager.py:115-121);
    here it routes to a quarantine DataFrame instead.
    """
    is_vision = F.col(topic_col) == VISION_TOPIC
    is_air = F.col(topic_col).contains(AIR_MARKER)
    return (
        df.filter(is_vision),
        df.filter(is_air),
        df.filter(~is_vision & ~is_air),
    )
