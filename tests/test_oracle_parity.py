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


def _assert_atomic_outputs(df, name):
    """The driver's canonicalizer sorts output columns with pandas and
    dies on unhashable cells (the q31_map_funcs red row in round 1:
    'unhashable type: list'). Our local comparator stringifies lists,
    which would MASK that failure -- so enforce at the schema level
    that no query ever emits an array/map/struct column."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for field in df.schema.fields:
        assert not isinstance(field.dataType, (ArrayType, MapType, StructType)), (
            f"{name}.{field.name} is {field.dataType.simpleString()}: serialize it "
            "(array_join/to_json/size) before returning -- the driver's correctness "
            "gate cannot hash complex cells"
        )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    entry = CATALOG[name]
    spark_df = entry.builder(spark, PARITY_SF)
    _assert_atomic_outputs(spark_df, name)
    duck_df = run_duckdb(entry.oracle, PARITY_SF)
    compare(spark_df, duck_df, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    entry = CATALOG[name]
    df = entry.builder(spark, PARITY_SF)
    _assert_atomic_outputs(df, name)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
