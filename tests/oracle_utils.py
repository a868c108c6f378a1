"""Local replica of the driver's oracle-differential check.

Runs a catalog query on Spark and its SQL oracle on DuckDB over the
same parquet tables, then compares row count, column-name set, and the
order-insensitive multiset of stringified values (exact -- the goal is
bit-identical floats; see catalog.py float-determinism notes).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd

from utc_cuip_kafka_aws_connector_spark.sources.batch import TABLE_NAMES


def run_duckdb(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)  # full precision: mismatched bits must fail
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return repr(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_norm_value(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_df, duck_df: pd.DataFrame, name: str) -> None:
    sp = spark_df.toPandas()
    assert len(sp) == len(duck_df), f"{name}: row count {len(sp)} vs oracle {len(duck_df)}"
    assert sorted(sp.columns) == sorted(duck_df.columns), (
        f"{name}: columns {sorted(sp.columns)} vs oracle {sorted(duck_df.columns)}"
    )
    a, b = normalize(sp), normalize(duck_df)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[0]}"
