"""Pre-proof for the r13 gate promotion (plans/catalog.py's STAGED
q123_curriculum_stages): the builder must already pass the exact
driver-style oracle differential, so registering it at r13 spends
the free slot on a known-green entry.
"""

from __future__ import annotations

from tests.oracle_utils import compare, run_duckdb
from utc_cuip_kafka_aws_connector_spark.plans.catalog import (
    STAGED_Q123_NAME,
    STAGED_Q123_ORACLE,
    queries,
    staged_q123_curriculum_stages,
)


def test_staged_q123_matches_oracle(spark, sf_dir):
    got = staged_q123_curriculum_stages(spark, sf_dir)
    want = run_duckdb(STAGED_Q123_ORACLE, sf_dir)
    compare(got, want, STAGED_Q123_NAME)


def test_staged_q123_not_yet_registered():
    """The staging contract: pre-proven but NOT in the catalog (a
    registered entry would need a ledger row this round's window has
    no slot for). This test flips to its inverse at r13."""
    assert STAGED_Q123_NAME not in queries()
