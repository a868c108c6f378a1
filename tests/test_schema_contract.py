"""Environment-drift tripwire: pin the post-load Spark dtypes the
catalog assumes for every testdata table.

Round-4 lesson: the driver regenerated /root/testdata between rounds
and events.ts changed footer type (TIMESTAMP(NANOS) -> naive
timestamp[us], which Spark 4 reads as TIMESTAMP_NTZ). load_table's
nanos workaround silently no-oped, and the failure surfaced as 14
scattered test failures + a dead bench instead of one obvious one.
This test is that one obvious place: it reads every parquet footer at
sf0.01 AND asserts the dtypes load_table actually delivers, so the
next silent testdata regeneration fails here first, by name.
"""

from __future__ import annotations

import os

import pytest

from utc_cuip_kafka_aws_connector_spark.sources.batch import TABLE_NAMES, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")

# The dtype contract every catalog builder compiles against.
# `ts` MUST be session-TZ `timestamp` (never timestamp_ntz: unix_millis
# and withWatermark reject ntz) regardless of footer encoding.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {"c_custkey": "bigint", "c_nationkey": "int", "c_acctbal": "double"},
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int", "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_size": "int", "p_retailprice": "double"},
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",  # naive micros footer, normalized from ntz
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_shipdate": "timestamp",
        "l_returnflag": "string",
    },
    "events": {
        "event_id": "bigint",
        "user_id": "bigint",
        "ts": "timestamp",  # THE round-4 breakage: must never be timestamp_ntz
        "event_type": "string",
        "value": "double",
    },
    "documents": {"doc_id": "bigint", "text": "string", "lang": "string", "n_chars": "bigint"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_post_load_dtypes(spark, name):
    df = load_table(spark, SF_DIR, name)
    dtypes = dict(df.dtypes)
    for col, want in EXPECTED[name].items():
        assert col in dtypes, f"{name}.{col} missing; testdata schema drifted: {dtypes}"
        assert dtypes[col] == want, (
            f"{name}.{col} loads as {dtypes[col]!r}, catalog assumes {want!r} "
            f"-- testdata footer drifted; fix sources/batch.py::load_table"
        )


def test_no_ntz_anywhere(spark):
    """No table may surface TIMESTAMP_NTZ through load_table -- the
    catalog's epoch-ms math and every watermark rejects it."""
    offenders = {
        name: [c for c, t in load_table(spark, SF_DIR, name).dtypes if "ntz" in t]
        for name in TABLE_NAMES
    }
    offenders = {n: cols for n, cols in offenders.items() if cols}
    assert offenders == {}, f"load_table leaked TIMESTAMP_NTZ columns: {offenders}"


def test_session_tz_pinned_utc(spark):
    load_table(spark, SF_DIR, "events")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_footer_nanos_probe_handles_directory_datasets(tmp_path):
    """pyarrow's read_schema raises on a directory-style parquet
    dataset; the probe used to swallow that to False, which would
    route a future multi-file NANOS events table onto the vectorized
    read path (which then fails). Directories are probed via their
    first part file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from utc_cuip_kafka_aws_connector_spark.sources.batch import _footer_has_nanos

    nanos = pa.table({"ts": pa.array([1, 2], type=pa.timestamp("ns"))})
    micros = pa.table({"ts": pa.array([1, 2], type=pa.timestamp("us"))})

    d_nanos = tmp_path / "events_nanos.parquet"
    d_nanos.mkdir()
    pq.write_table(nanos, d_nanos / "part-00000.parquet")
    pq.write_table(nanos, d_nanos / "part-00001.parquet")
    assert _footer_has_nanos(str(d_nanos)) is True

    d_micros = tmp_path / "events_micros.parquet"
    d_micros.mkdir()
    pq.write_table(micros, d_micros / "part-00000.parquet")
    assert _footer_has_nanos(str(d_micros)) is False

    f_nanos = tmp_path / "single_nanos.parquet"
    pq.write_table(nanos, f_nanos)
    assert _footer_has_nanos(str(f_nanos)) is True

    assert _footer_has_nanos(str(tmp_path / "missing.parquet")) is False
    (tmp_path / "empty_dir.parquet").mkdir()
    assert _footer_has_nanos(str(tmp_path / "empty_dir.parquet")) is False


def test_documents_text_is_single_space_separated():
    """Tokenizer-agreement canary (round-6 ADVICE): several oracles
    split text on a literal ' ' where the Spark side splits on \\s+ --
    they agree precisely BECAUSE the fixture text is strictly
    single-space separated. If a future fixture breaks this property,
    fail here with a pointed message instead of silently hash-
    mismatching in the driver gate. (q107/q109/q111/q112 already pin
    both sides to regexp \\s+ splitting and survive either way.)"""
    import duckdb
    import glob

    for sf_dir in sorted(glob.glob("/root/testdata/sf*")):
        n = duckdb.sql(
            f"SELECT count(*) FROM '{sf_dir}/documents.parquet' "
            "WHERE regexp_matches(text, '\\t|\\n|\\r|  ') "
            "OR text LIKE ' %' OR text LIKE '% '"
        ).fetchone()[0]
        assert n == 0, (
            f"{sf_dir}/documents.parquet has {n} rows with non-single-space "
            "whitespace: literal-space-splitting oracles (q103/q106/q108/"
            "q84) now disagree with their \\s+-splitting Spark builders -- "
            "pin those oracles to regexp splits before trusting the gate"
        )
