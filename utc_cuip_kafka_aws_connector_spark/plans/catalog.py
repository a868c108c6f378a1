"""The engine's query catalog: every operator from SURVEY.md §2.B as a
named (Spark builder, DuckDB oracle SQL) pair.

Conventions (driver contract, __spark_entry__.py):
- every computed column is aliased identically in the Spark plan and
  the oracle SQL (the driver hashes values under sorted column names);
- timestamps are emitted as formatted strings or DATEs (Spark session
  TZ pinned to UTC == DuckDB's naive timestamps);
- FLOAT DETERMINISM: double summation order differs between engines,
  so money aggregates are computed in DECIMAL (exact in both Spark and
  DuckDB -- the inputs have <=2 decimal places) and the exact result is
  cast to DOUBLE at the end. Exact-decimal -> double conversion is
  correctly rounded and therefore bit-identical across engines. Any
  further arithmetic (averages = exact_sum / count) then operates on
  identical doubles; IEEE ops are deterministic, so hashes match.
  Genuinely-irrational floats (cosine similarity) are rounded to a
  precision far above the accumulated error instead.
- counts/sums of integers are cast to BIGINT in DuckDB (it widens to
  HUGEINT by default; Spark uses long).

Registration: ``@query(name, oracle=...)``; ``oracle=None`` marks a
genuinely non-SQL-expressible operator (driver falls back to a
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from utc_cuip_kafka_aws_connector_spark.sources.batch import load_table


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None -> rows-only check


CATALOG: dict[str, CatalogEntry] = {}


def query(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = CatalogEntry(name, fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: e.builder for n, e in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {n: e.oracle for n, e in CATALOG.items() if e.oracle is not None}


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dec2(name: str) -> Column:
    """Money/ratio column (<=2 intrinsic decimal places) as exact decimal."""
    return F.col(name).cast("decimal(18,2)")


def dsum(expr: Column) -> Column:
    """Exact decimal sum, emitted as a bit-deterministic double."""
    return F.sum(expr).cast("double")


# ===========================================================================
# Aggregations (SURVEY §2.B "Aggregations"; generalizes reference R11's
# distinct-month census, df_manager.py:60-62)
# ===========================================================================


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)   AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)      AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*)      AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary.

    Scan -> pushed filter -> partial+final hash aggregate -> sort.
    Scale: the shipdate predicate and 7-column projection push into the
    parquet scan; the key space is tiny (R/F x O/F) so the partial
    aggregate collapses nearly all rows map-side before one small
    shuffle. Decimal aggregation keeps results exact (see module doc).
    """
    li = T(spark, sf_dir, "lineitem")
    disc_price = dec2("l_extendedprice") * (1 - dec2("l_discount"))
    charge = disc_price * (1 + dec2("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec2("l_quantity")).alias("sum_qty"),
            dsum(dec2("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum(dec2("l_quantity")) / F.count("*")).alias("avg_qty"),
            (dsum(dec2("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (dsum(dec2("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
