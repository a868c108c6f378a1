"""operators/boilerplate.py: line-level boilerplate strip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.boilerplate import (
    frequent_lines,
    strip_boilerplate,
)

BANNER = "SUBSCRIBE TO OUR NEWSLETTER TODAY"
FOOTER = "copyright example corp all rights reserved"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(100):
        body = [f"unique line {i} alpha", "", f"unique line {i} beta"]
        lines = ([BANNER] if i % 10 else []) + body  # banner in 90%
        if i < 80:
            lines.append("  " + FOOTER + "  ")  # footer in 80%, padded
        rows.append((i, "\n".join(lines), f"src{i % 4}"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_frequent_lines_finds_planted_boilerplate(corpus):
    hot = {r.line: r.n_docs for r in frequent_lines(corpus, min_docs=50).collect()}
    assert hot == {BANNER: 90, FOOTER: 80}  # trimmed form, exact doc counts


def test_strip_preserves_everything_else(spark, corpus):
    out = {r.doc_id: r.text for r in strip_boilerplate(corpus, min_docs=50).collect()}
    for i in range(100):
        lines = out[i].split("\n")
        assert BANNER not in [l.strip() for l in lines]
        assert FOOTER not in [l.strip() for l in lines]
        # body byte-preserved, in order, blank line intact
        assert lines == [f"unique line {i} alpha", "", f"unique line {i} beta"]


def test_driver_and_join_modes_agree(spark, corpus):
    fast = sorted(
        map(tuple, strip_boilerplate(corpus, min_docs=50).collect())
    )
    slow = sorted(
        map(
            tuple,
            strip_boilerplate(corpus, min_docs=50, driver_max_lines=0).collect(),
        )
    )
    assert fast == slow
    # and non-text columns ride through both modes
    assert {t[2] for t in fast} == {f"src{i}" for i in range(4)}


def test_null_text_survives_both_modes(spark, corpus):
    """ADVICE r9: join mode used to resurrect a null text as "" (the
    doc falls out of posexplode, then coalesce backfills); driver mode
    kept it null. Same input must give the same output in both modes:
    null stays null, and a fully-stripped doc still becomes ""."""
    with_null = corpus.unionByName(
        spark.createDataFrame(
            [(1000, None, "srcN"), (1001, BANNER, "srcB")],
            "doc_id long, text string, source string",
        )
    )
    for kwargs in ({}, {"driver_max_lines": 0}):
        out = {
            r.doc_id: r.text
            for r in strip_boilerplate(with_null, min_docs=50, **kwargs).collect()
        }
        assert out[1000] is None, f"null text corrupted in {kwargs or 'driver'} mode"
        assert out[1001] == "", f"fully-stripped doc not '' in {kwargs or 'driver'} mode"


def test_idempotent(spark, corpus):
    once = strip_boilerplate(corpus, min_docs=50)
    twice = strip_boilerplate(once, min_docs=50)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_fraction_threshold_tightens(corpus):
    # min_docs=2 alone would flag nothing extra; 85% fraction keeps
    # only the banner (90%), not the footer (80%)
    hot = {r.line for r in frequent_lines(corpus, min_docs=2, max_doc_fraction=0.85).collect()}
    assert hot == {BANNER}


def test_short_common_lines_are_not_stripped(spark):
    rows = [(i, f"Home\ndoc body {i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = strip_boilerplate(df, min_docs=5)  # "Home" < min_len=5
    assert all(r.text.startswith("Home\n") for r in out.collect())


def test_min_docs_validation(corpus):
    with pytest.raises(ValueError, match="min_docs"):
        frequent_lines(corpus, min_docs=1)
