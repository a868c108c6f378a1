"""Batch sources: Parquet / CSV / JSON-lines scans.

Spark-first equivalents of the reference's ingest surface:
- JSON deserialize (reference run.py:45) -> ``spark.read.schema(s).json``
  / ``from_json`` for Kafka payloads.
- CSV read-back (reference df_manager.py:87) -> ``spark.read.csv`` with an
  explicit schema (never inferSchema in production paths).

All readers take explicit schemas where the format has none, so plans
stay stable and scans prune columns/push filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one synthetic table (schema from footers).

    ``events.ts`` is TIMESTAMP(NANOS) in the footer, which Spark's
    vectorized reader rejects; read it as raw nanos (legacy conf is
    runtime-settable) and floor-convert to a microsecond timestamp.

    The session timezone is pinned to UTC on every load: the driver
    harness supplies its own SparkSession, and epoch-ms conversions /
    date formatting must match DuckDB's UTC-naive timestamps
    regardless of that session's original configuration.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register each table as a temp view for the SQL API."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_json_lines(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines scan with explicit schema, PERMISSIVE mode.

    Mirrors reference run.py:45 (json.loads per message) but schema-first:
    unknown fields are dropped, corrupt records land in
    ``_corrupt_record`` instead of raising.
    """
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """Header CSV scan with explicit schema (reference df_manager.py:87)."""
    return spark.read.option("header", True).schema(schema).csv(path)
