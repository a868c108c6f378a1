"""The correctness driver supplies its OWN SparkSession, configured
however it likes. Queries must produce oracle-identical results even
from a session with a non-UTC timezone (load_table pins UTC at
runtime) and default shuffle settings.
"""

from __future__ import annotations

from tests.oracle_utils import compare, run_duckdb

from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"
TZ_SENSITIVE = ["q27_date_funcs", "q32_epoch_roundtrip", "q33_calendar_month_agg", "q71_time_windows"]


def test_queries_survive_foreign_session(spark):
    foreign = spark.newSession()
    foreign.conf.set("spark.sql.session.timeZone", "America/New_York")
    foreign.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        for name in TZ_SENSITIVE:
            entry = CATALOG[name]
            compare(entry.builder(foreign, SF), run_duckdb(entry.oracle, SF), name)
    finally:
        pass


SESSION_STATE_TOUCHING = [
    # q95 scopes spark.sql.shuffle.partitions around its stream;
    # q96 drives the txlog write path; q100 registers catalog tables
    # via saveAsTable -- all must behave in a driver-owned session
    # with foreign conf and leave that conf as they found it.
    "q95_stream_stream_join",
    "q96_cdc_incremental_agg",
    "q100_bucketed_join",
]


def test_session_state_queries_survive_foreign_session(spark):
    foreign = spark.newSession()
    foreign.conf.set("spark.sql.session.timeZone", "America/New_York")
    foreign.conf.set("spark.sql.shuffle.partitions", "200")
    for name in SESSION_STATE_TOUCHING:
        entry = CATALOG[name]
        compare(entry.builder(foreign, SF), run_duckdb(entry.oracle, SF), name)
        assert foreign.conf.get("spark.sql.shuffle.partitions") == "200", name
