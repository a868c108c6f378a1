"""Guard the driver-gate registration contract: the external
correctness gate only emits rows for the first 50 registered queries,
so ordering is load-bearing (round-2 lesson: 36 queries went
unverified for two rounds because they registered after slot 50)."""

from __future__ import annotations

from utc_cuip_kafka_aws_connector_spark.plans import catalog


def test_gate_priority_is_the_window():
    names = list(catalog.CATALOG)
    assert names[: len(catalog._GATE_PRIORITY)] == catalog._GATE_PRIORITY


def test_gate_priority_fills_window_exactly():
    """50 slots, 50 priority names -- no slot wasted, none overflowed."""
    assert len(catalog._GATE_PRIORITY) == 50


def test_every_query_has_an_oracle():
    """Every catalog entry currently carries a DuckDB oracle (none have
    regressed to rows-only); if a genuinely non-SQL-expressible op is
    added later, update this to an explicit allowlist."""
    missing = [n for n, e in catalog.CATALOG.items() if e.oracle is None]
    assert missing == []
