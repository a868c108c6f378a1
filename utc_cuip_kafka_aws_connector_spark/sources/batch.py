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


def _ensure_utc_session(spark: SparkSession) -> None:
    """Pin the session timezone to UTC (idempotent -- only writes when
    it would change). The driver harness supplies its own SparkSession,
    and epoch-ms conversions / date formatting must match DuckDB's
    UTC-naive timestamps regardless of that session's original
    configuration."""
    if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def _footer_has_nanos(path: str) -> bool:
    """Probe the parquet footer for TIMESTAMP(NANOS) columns, which
    Spark's vectorized reader rejects without the nanosAsLong legacy
    conf. Footer-only read -- no data touched. A directory-style
    dataset (multi-file table) is probed via its first part file:
    ``pq.read_schema`` raises on directories, and swallowing that to
    False would silently route a future multi-file NANOS table onto
    the vectorized-read path, which then fails."""
    try:
        import os

        import pyarrow.parquet as pq

        if os.path.isdir(path):
            # Recurse: Hive-partitioned datasets nest part files under
            # key=value subdirectories, so a top-level listdir alone
            # would still misclassify a partitioned NANOS table.
            part = None
            for root, dirs, files in os.walk(path):
                dirs.sort()
                hit = sorted(f for f in files if f.endswith(".parquet"))
                if hit:
                    part = os.path.join(root, hit[0])
                    break
            if part is None:
                return False
            path = part
        schema = pq.read_schema(path)
        return any(str(f.type).startswith("timestamp[ns") for f in schema)
    except Exception:
        return False


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one synthetic table (schema from footers).

    Timestamp normalization: the testdata generator has shipped
    ``events.ts`` as TIMESTAMP(NANOS) (some rounds) and as plain naive
    ``timestamp[us]`` (others). Handle both so the catalog always sees
    a session-TZ ``timestamp``:

    - NANOS footer: read raw nanos via the legacy conf (set only when
      the footer actually carries nanos) and floor-convert to micros.
    - Naive micros footer: Spark 4 reads it as TIMESTAMP_NTZ, which
      ``unix_millis`` / ``withWatermark`` reject; cast to ``timestamp``
      under the UTC-pinned session -- semantics identical to DuckDB's
      naive-UTC oracle.
    """
    _ensure_utc_session(spark)
    path = f"{sf_dir}/{name}.parquet"
    if name == "events" and _footer_has_nanos(path):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    df = spark.read.parquet(path)
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        from pyspark.sql import functions as F

        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    return df


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
