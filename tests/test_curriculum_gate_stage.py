"""Gate-promotion staging proofs.

q123_curriculum_stages was staged at r12 and REGISTERED at r13;
q124_bigram_counts was staged at r13 and REGISTERED at r14 (both
stamped rotation plans executed on schedule) — their registration
invariants flipped to "is in the catalog AND in the gate window".

q125_sb_match_profile is the r15 staged promotion (plans/catalog.py's
STAGED block): the builder must already pass the exact driver-style
oracle differential, so registering it at r15 spends the slot (freed
by retiring q14_distinct_months from the expiring r13 cohort) on a
known-green entry.
"""

from __future__ import annotations

from tests.oracle_utils import compare, run_duckdb
from utc_cuip_kafka_aws_connector_spark.plans.catalog import (
    STAGED_Q123_NAME,
    STAGED_Q124_NAME,
    STAGED_Q125_NAME,
    STAGED_Q125_ORACLE,
    _GATE_PRIORITY,
    queries,
    staged_q125_sb_match_profile,
)


def test_q123_registered_at_r13():
    """Registered at r13; at r14 it rests on its r13 row (not in the
    window), but it must still be in the catalog."""
    assert STAGED_Q123_NAME in queries()


def test_q124_registered_at_r14():
    """The r13 staging contract's inverse, flipped at registration:
    q124 is in the catalog AND holds a gate-window slot (it has never
    received a driver row, so resting is not an option)."""
    assert STAGED_Q124_NAME in queries()
    assert STAGED_Q124_NAME in _GATE_PRIORITY


def test_staged_q125_matches_oracle(spark, sf_dir):
    got = staged_q125_sb_match_profile(spark, sf_dir)
    want = run_duckdb(STAGED_Q125_ORACLE, sf_dir)
    compare(got, want, STAGED_Q125_NAME)


def test_q125_registered_at_r15():
    """The r14 staging contract's inverse, flipped at registration:
    q125 is in the catalog AND holds a gate-window slot (it has never
    received a driver row, so resting is not an option)."""
    assert STAGED_Q125_NAME in queries()
    assert STAGED_Q125_NAME in _GATE_PRIORITY
