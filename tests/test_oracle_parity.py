"""Oracle-differential tests: every catalog query with a SQL oracle is
compared against DuckDB, mirroring the driver's t2 correctness gate.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_PARITY_SF to the
sf0.01 dir to rehearse the real gate.
"""

from __future__ import annotations

import os

import pytest

from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG

from tests.oracle_utils import compare, run_duckdb

PARITY_SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

ORACLE_QUERIES = [n for n, e in CATALOG.items() if e.oracle is not None]
ROWS_ONLY_QUERIES = [n for n, e in CATALOG.items() if e.oracle is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    entry = CATALOG[name]
    spark_df = entry.builder(spark, PARITY_SF)
    duck_df = run_duckdb(entry.oracle, PARITY_SF)
    compare(spark_df, duck_df, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    entry = CATALOG[name]
    df = entry.builder(spark, PARITY_SF)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
