"""operators/report.py: the corpus data-card.

Evidence: composition equals calling the component operators
directly on the real fixture corpus, slice distributions sum to 1,
missing slice columns are skipped, and planted duplicates move the
dup ratio exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.entropy import entropy_stats
from utc_cuip_kafka_aws_connector_spark.operators.report import corpus_report
from utc_cuip_kafka_aws_connector_spark.operators.text import quality_score

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def card(docs):
    return {r.metric: r.value for r in corpus_report(docs).collect()}


def test_matches_component_operators(docs, card):
    n = docs.count()
    assert card["rows"] == n
    assert card["quality_mean"] == pytest.approx(
        quality_score(docs).agg(F.avg("quality")).first()[0]
    )
    ent = entropy_stats(docs).agg(
        F.avg("char_entropy"), F.avg("zlib_ratio")
    ).first()
    assert card["char_entropy_mean"] == pytest.approx(float(ent[0]))
    assert card["zlib_ratio_mean"] == pytest.approx(float(ent[1]))
    distinct = docs.select(F.md5("text")).distinct().count()
    assert card["exact_dup_ratio"] == pytest.approx((n - distinct) / n)
    assert card["len_min"] <= card["len_p50"] <= card["len_p95"] <= card["len_max"]


def test_slices_sum_to_one(card):
    for col in ("lang", "source"):
        mass = sum(v for k, v in card.items() if k.startswith(f"{col}:"))
        assert mass == pytest.approx(1.0)


def test_missing_slice_columns_are_skipped(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "other text")], "doc_id long, text string"
    )
    got = {r.metric for r in corpus_report(df).collect()}
    assert not any(m.startswith(("lang:", "source:")) for m in got)
    assert "rows" in got and "quality_mean" in got


def test_planted_duplicates_move_dup_ratio(spark):
    df = spark.createDataFrame(
        [(i, "same text") for i in range(8)] + [(8, "unique one"), (9, "unique two")],
        "doc_id long, text string",
    )
    card = {r.metric: r.value for r in corpus_report(df).collect()}
    assert card["exact_dup_ratio"] == pytest.approx(0.7)  # 10 rows, 3 distinct


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    card = {r.metric: r.value for r in corpus_report(df).collect()}
    assert card == {"rows": 0.0}


def test_release_report_between_versions(spark):
    from utc_cuip_kafka_aws_connector_spark.operators.report import (
        release_report,
    )

    old = spark.createDataFrame(
        [(i, f"document body {i} words here", "en", "s0", 25 + (i % 5))
         for i in range(100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    new = (
        old.filter(F.col("doc_id") >= 10)  # 10 removed
        .withColumn(
            "text",
            F.when(F.col("doc_id") < 15, F.concat(F.col("text"), F.lit(" edited")))
            .otherwise(F.col("text")),
        )
        .unionByName(
            spark.createDataFrame(
                [(1000 + i, f"fresh doc {i} text", "de", "s1", 300 + i)
                 for i in range(20)],
                "doc_id long, text string, lang string, source string, n_chars long",
            )
        )
    )
    rep = {r.metric: r.value for r in release_report(old, new).collect()}
    assert rep["docs_added"] == 20
    assert rep["docs_removed"] == 10
    assert rep["docs_changed"] == 5
    assert rep["rows_delta"] == 10  # 100 -> 110
    assert rep["drift:n_chars_psi"] > 0.1  # the fresh docs sit out of range
    assert rep["drift:n_chars_null_rate_delta"] == pytest.approx(0.0)
    # slice mass moved toward de/s1
    assert rep.get("lang:de_delta", 0) > 0.1


def test_release_report_identity(spark):
    from utc_cuip_kafka_aws_connector_spark.operators.report import (
        release_report,
    )

    df = spark.createDataFrame(
        [(i, f"same doc {i}", 10) for i in range(50)],
        "doc_id long, text string, n_chars long",
    )
    rep = {r.metric: r.value for r in release_report(df, df).collect()}
    assert rep["docs_added"] == rep["docs_removed"] == rep["docs_changed"] == 0
    assert all(v == pytest.approx(0.0, abs=1e-9) for m, v in rep.items()
               if m.endswith("_delta") or m.endswith("_psi"))
