"""Gate-promotion staging proofs.

q123_curriculum_stages was staged here at r12 and REGISTERED at r13
(the stamped rotation plan executed on schedule) — its registration
invariant flipped to "is in the catalog AND in the gate window".

q124_bigram_counts is the r14 staged promotion (plans/catalog.py's
STAGED block): the builder must already pass the exact driver-style
oracle differential, so registering it at r14 spends the slot (freed
by retiring q25_null_filter from the expiring r12 cohort) on a
known-green entry.
"""

from __future__ import annotations

from tests.oracle_utils import compare, run_duckdb
from utc_cuip_kafka_aws_connector_spark.plans.catalog import (
    STAGED_Q123_NAME,
    STAGED_Q123_ORACLE,
    STAGED_Q124_NAME,
    STAGED_Q124_ORACLE,
    _GATE_PRIORITY,
    queries,
    staged_q124_bigram_counts,
)


def test_q123_registered_at_r13():
    """The r12 staging contract's inverse, flipped at registration:
    q123 is in the catalog AND holds a gate-window slot (it has never
    received a driver row, so resting is not an option)."""
    assert STAGED_Q123_NAME in queries()
    assert STAGED_Q123_NAME in _GATE_PRIORITY


def test_staged_q124_matches_oracle(spark, sf_dir):
    got = staged_q124_bigram_counts(spark, sf_dir)
    want = run_duckdb(STAGED_Q124_ORACLE, sf_dir)
    compare(got, want, STAGED_Q124_NAME)


def test_staged_q124_not_yet_registered():
    """The staging contract: pre-proven but NOT in the catalog (a
    registered entry would need a ledger row this round's window has
    no slot for). This test flips to its inverse at r14."""
    assert STAGED_Q124_NAME not in queries()
