"""operators/extract.py: HTML-to-text extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.extract import (
    html_text_expr,
    html_to_text,
)

PAGE = """<!DOCTYPE html><html><head>
<title>T</title><style>body { color: red; }</style>
<script type="text/javascript">var x = "<p>not text</p>";</script>
</head><body>
<!-- a comment -->
<h1>Heading &amp; More</h1>
<p>First   paragraph with <b>bold</b> and a <a href="/x">link</a>.</p>
<p>Caf&eacute; costs &#8364;5 &lt;really&gt;.</p>
<ul><li>alpha</li><li>beta</li></ul>
</body></html>"""


def _one(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return html_to_text(df).first().text


def test_golden_page(spark):
    out = _one(spark, PAGE)
    lines = out.split("\n")
    assert "Heading & More" in lines
    assert "First paragraph with bold and a link ." in lines
    assert "Café costs €5 <really>." in lines
    assert "alpha" in lines and "beta" in lines
    # hidden content gone entirely
    assert "color" not in out and "javascript" not in out.lower()
    assert "not text" not in out and "comment" not in out


def test_idempotent_on_plain_text(spark):
    plain = "just words\n\nwith a blank line"
    once = _one(spark, plain)
    assert once == "just words\nwith a blank line"
    assert _one(spark, once) == once


def test_garbage_never_crashes(spark):
    cases = [
        "<script>unclosed",
        "<p attr='<fake>'>x</p>",
        "<<<>>>",
        "",
        "&#xG; &unknownentity; &amp",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)] + [(99, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.text for r in html_to_text(df).collect()}
    assert len(rows) == 6
    assert rows[99] is None
    # documented degradation, not a parse: the visible "x" survives
    # (a quote fragment may too — extractor, not parser)
    assert "x" in rows[1]


def test_jvm_stage_stays_in_codegen(spark):
    """The tag-stripping chain must be plain regexp_replace columns —
    no Python evaluation before the single finishing Arrow stage."""
    from tests.plan_utils import formatted_plan

    df = spark.createDataFrame([(0, PAGE)], "doc_id long, text string")
    plan = formatted_plan(df.withColumn("text", html_text_expr("text")))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_block_structure_feeds_boilerplate(spark):
    """Integration: the same footer div across pages becomes the same
    LINE after extraction, so strip_boilerplate removes it."""
    from utc_cuip_kafka_aws_connector_spark.operators.boilerplate import (
        strip_boilerplate,
    )

    pages = [
        (i, f"<p>unique body {i} content here</p><div>Copyright Example Corp 2024</div>")
        for i in range(40)
    ]
    txt = html_to_text(spark.createDataFrame(pages, "doc_id long, text string"))
    clean = strip_boilerplate(txt, min_docs=20, min_len=10)
    assert clean.filter(F.col("text").contains("Copyright")).count() == 0
    assert clean.filter(F.col("text").contains("unique body")).count() == 40
