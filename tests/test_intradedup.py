"""operators/intradedup.py: within-document paragraph dedup.

Evidence: pure-Python differential (split/normalize/first-occurrence
semantics string-equal over a planted fixture), raw-first-occurrence
preservation under cosmetic variation, idempotence, line-level sep,
out_col non-destructive mode, NULL/empty handling, removed counts,
and a scan-local plan pin.
"""

from __future__ import annotations

import re

import pytest

from tests.plan_utils import formatted_plan
from utc_cuip_kafka_aws_connector_spark.operators.intradedup import (
    dedup_paragraphs,
)


def _py_dedup(text, sep="\n\n"):
    if text is None:
        return None, 0
    paras = text.split(sep)
    seen, kept = set(), []
    for p in paras:
        nrm = re.sub(r"\s+", " ", p.strip().lower())
        if nrm in seen:
            continue
        seen.add(nrm)
        kept.append(p)
    return sep.join(kept), len(paras) - len(kept)


FIXTURE = [
    (0, "intro\n\nbody text\n\nintro\n\noutro"),  # exact repeat
    (1, "The Header\n\nthe  header\n\nnew part"),  # cosmetic repeat
    (2, "unique one\n\nunique two"),  # nothing to drop
    (3, "\n\n\n\nreal text"),  # repeated blank filler
    (4, ""),
    (5, None),
]


def test_matches_python_reference_and_counts(spark):
    df = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.paras_removed)
        for r in dedup_paragraphs(df).collect()
    }
    for i, t in FIXTURE:
        assert got[i] == _py_dedup(t), i
    # raw first occurrence kept verbatim (capitalized form survives)
    assert got[1][0] == "The Header\n\nnew part"
    assert got[0] == ("intro\n\nbody text\n\noutro", 1)
    assert got[3][1] == 1  # two empty paragraphs -> one survives
    assert got[5] == (None, 0)


def test_idempotent_and_line_level(spark):
    df = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    once = dedup_paragraphs(df)
    twice = dedup_paragraphs(once.drop("paras_removed"))
    assert sorted(
        (r.doc_id, r.text) for r in once.collect()
    ) == sorted((r.doc_id, r.text) for r in twice.collect())
    assert all(r.paras_removed == 0 for r in twice.collect())

    lines = spark.createDataFrame(
        [(0, "a\nb\na\nc\nb")], "doc_id long, text string"
    )
    [r] = dedup_paragraphs(lines, sep="\n").collect()
    assert (r.text, r.paras_removed) == ("a\nb\nc", 2)


def test_out_col_preserves_original(spark):
    df = spark.createDataFrame(FIXTURE[:2], "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in dedup_paragraphs(df, out_col="clean").collect()
    }
    assert got[0].text == FIXTURE[0][1]  # untouched
    assert got[0].clean == "intro\n\nbody text\n\noutro"
    assert got[0].paras_removed == 1


def test_plan_is_scan_local(spark):
    df = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    plan = formatted_plan(dedup_paragraphs(df))
    for bad in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython",
                "Generate", "Window"):
        assert bad not in plan, f"{bad} in intradedup plan"


def test_regex_special_separator_is_literal(spark):
    df = spark.createDataFrame([(0, "a|b|a|c")], "doc_id long, text string")
    [r] = dedup_paragraphs(df, sep="|").collect()
    assert (r.text, r.paras_removed) == ("a|b|c", 1)
