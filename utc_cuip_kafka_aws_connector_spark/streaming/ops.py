"""Streaming operators (SURVEY §2.B "Streaming-only").

All take/return (possibly streaming) DataFrames so they compose with
the batch operators; the reference analogs are the count-based flush
loop and month-file bucketing (run.py:117-125, df_manager.py:60-75).

Scale notes: watermarks bound state; for 100 TB-scale streaming state
switch the state store to RocksDB via ``rocksdb_state_conf()`` --
config, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Harden the event-time column against upstream footer drift:
    ``withWatermark`` (and epoch-ms math downstream) rejects
    TIMESTAMP_NTZ, which Spark 4 produces for naive parquet
    timestamps. Cast ntz -> timestamp here so every streaming op is
    independent of how the source file happened to encode time.
    No-op for already-correct inputs."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def rocksdb_state_conf(changelog_checkpointing: bool = True) -> dict[str, str]:
    """Session conf switching streaming state to the RocksDB state
    store (bundled with Spark >= 3.2; verified working in this
    build). The default HDFSBackedStateStoreProvider keeps every
    key's state in executor heap -- fine for small keyed state, an
    OOM at 100 TB-scale key cardinality (billions of dedup keys /
    session windows). RocksDB spills state to executor-local disk
    with an off-heap block cache, bounding heap use regardless of
    key count.

    ``changelog_checkpointing`` additionally makes each micro-batch
    checkpoint upload only the state CHANGELOG instead of a full
    RocksDB snapshot -- at large state sizes this turns checkpoint
    cost from O(state) to O(delta) per batch.

    Apply via ``session.get_spark(extra_conf=rocksdb_state_conf())``
    or ``spark.conf.set`` before starting a query (the provider is
    per-query, pinned at first checkpoint)."""
    conf = {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
    }
    if changelog_checkpointing:
        conf[
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        ] = "true"
    return conf


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
        _as_event_time(df, ts_col)
        .withWatermark(ts_col, watermark)
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
        _as_event_time(df, ts_col)
        .withWatermark(ts_col, watermark)
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
        _as_event_time(df, ts_col)
        .withWatermark(ts_col, watermark)
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
    return _as_event_time(df, ts_col).withWatermark(ts_col, watermark).dropDuplicates(keys)


def stateful_running_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 day",
) -> DataFrame:
    """Custom stateful per-key aggregation via applyInPandasWithState
    (SURVEY §2.B "Stateful per-key aggregation"): maintains a running
    (count, sum, max) per key across micro-batches and emits the
    updated totals each batch.

    State is a single small tuple per key -- bounded, and evictable by
    timeout at 100 TB-scale key cardinality (pair with the RocksDB
    state store via config)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd  # executor-side

        count, total, vmax = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf[value_col].sum())
            vmax = max(vmax, float(pdf[value_col].max()))
        state.update((count, total, vmax))
        yield pd.DataFrame(
            {"key": [key[0]], "n": [count], "total": [total], "vmax": [vmax]}
        )

    return (
        _as_event_time(df, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            update,
            outputStructType="key long, n long, total double, vmax double",
            stateStructType="n long, total double, vmax double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
