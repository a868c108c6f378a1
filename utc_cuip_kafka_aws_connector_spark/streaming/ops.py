"""Streaming operators (SURVEY §2.B "Streaming-only").

All take/return (possibly streaming) DataFrames so they compose with
the batch operators; the reference analogs are the count-based flush
loop and month-file bucketing (run.py:117-125, df_manager.py:60-75).

Scale notes: watermarks bound state; for 100 TB-scale streaming state
switch the state store to RocksDB
(spark.sql.streaming.stateStore.providerClass) -- config, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    window_len: str,
    watermark: str,
    keys: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregate. The reference's
    calendar-month files are the batch analog (df_manager.py:60-75);
    fixed-width windows are the streaming-native form."""
    aggs = aggs or [F.count("*").alias("n")]
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len), *(keys or []))
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    window_len: str,
    slide: str,
    watermark: str,
    keys: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    aggs = aggs or [F.count("*").alias("n")]
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len, slide), *(keys or []))
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    watermark: str,
    keys: list[str],
    aggs: list | None = None,
) -> DataFrame:
    """Session windows: a session closes after ``gap`` of inactivity."""
    aggs = aggs or [F.count("*").alias("n")]
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.col("session_window.start"))
        .withColumn("session_end", F.col("session_window.end"))
        .drop("session_window")
    )


def streaming_dedup(df: DataFrame, ts_col: str, watermark: str, keys: list[str]) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped; state for expired keys is
    evicted. (The reference never deduped -- at-least-once redelivery
    produced duplicate CSV rows, SURVEY R23.)"""
    return df.withWatermark(ts_col, watermark).dropDuplicates(keys)
