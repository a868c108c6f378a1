"""Bucketed (pre-shuffled) table layout -- the co-located join
primitive.

Spark's bucketing writes each table pre-hash-partitioned on the join
key into a fixed number of buckets (``bucketBy``), recorded in the
catalog. Two tables bucketed on the same key into the same bucket
count then sort-merge-join with NO Exchange on either side: the
shuffle was paid once at write time and is amortized over every
subsequent join. At 100 TB this is the difference between re-shuffling
the fact table on every query and never shuffling it again -- the same
contract as Hive bucketed tables / Iceberg bucket partition transforms.

The reference appends plain CSV with no layout control
(df_manager.py:82-92); bucketing is the Spark-native answer to the
"repeated joins on the same key" workload its monthly files imply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """(Re)create ``table_name`` as an external parquet table at
    ``path``, bucketed AND sorted by ``bucket_col``. Sorting within
    buckets lets the sort-merge join skip its sort too (plan shows
    SortMergeJoin with neither Exchange nor Sort on this side).

    Registration is session-scoped metadata; the data files are
    self-describing (bucket id is in the file name), so a fresh
    session re-registers cheaply with the same one call.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-bucket-count tables, pinned to the
    co-located sort-merge strategy (the ``merge`` hint stops AQE from
    'helpfully' broadcasting the small side in tests -- at real scale
    neither side fits a broadcast and SMJ is what runs)."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on, how)
