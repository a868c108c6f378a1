"""operators/rulefilters.py: C4 + Gopher rule sets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.rulefilters import (
    apply_c4,
    apply_gopher,
    c4_rules,
    gopher_rules,
)

GOOD = (
    "This is a perfectly reasonable paragraph of english prose that "
    "we have written to look like the documents a crawl keeps.\n"
    "It contains several complete sentences with normal words.\n"
    "Each of the lines ends with terminal punctuation and that is good."
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_c4_rules_fire_individually(spark):
    texts = [
        GOOD,  # 0: passes everything
        "one line only with plenty of words but no other lines.",  # 1: short_lines
        "a line without punctuation ending here\n" * 5 + GOOD,  # 2: terminal
        GOOD + "\nlorem ipsum dolor sit amet.",  # 3: lorem
        GOOD + "\nfunction() { return 1; }",  # 4: braces
        GOOD + "\nplease read our privacy policy.",  # 5: policy
    ]
    rows = {r.doc_id: r for r in c4_rules(_df(spark, texts)).collect()}
    assert rows[0].keep
    assert not rows[1].c4_short_lines and not rows[1].keep
    assert not rows[2].c4_terminal_punct
    assert not rows[3].c4_no_lorem
    assert not rows[4].c4_no_braces
    assert not rows[5].c4_no_policy
    kept = {r.doc_id for r in apply_c4(_df(spark, texts)).collect()}
    assert kept == {0}


def test_gopher_rules_fire_individually(spark):
    base_words = (
        "the quick brown fox jumps over that lazy dog and we have "
        "written more words to clear fifty with some padding tokens "
        "here still going along nicely until the count of words is "
        "well past the minimum bound for this published table rule "
        "set and everything else stays within the normal thresholds"
    )
    texts = [
        base_words,                                  # 0: passes
        "too few words here",                        # 1: word count
        " ".join(["a"] * 80) + " the of to be",      # 2: mean word len < 3
        base_words + " " + "#" * 40,                 # 3: hash ratio (one giant-# word)
        base_words + (" ..." * 20),                  # 4: ellipsis ratio
        "\n".join(["- bullet line"] * 20) + "\n" + base_words,  # 5: bullets
        " ".join(["12345"] * 100) + " the of to",    # 6: alpha words
        " ".join([f"w{i}" for i in range(60)]),      # 7: stop words
    ]
    rows = {r.doc_id: r for r in gopher_rules(_df(spark, texts)).collect()}
    assert rows[0].keep, [
        (k, v) for k, v in rows[0].asDict().items() if v is False
    ]
    assert not rows[1].gopher_word_count
    assert not rows[2].gopher_mean_word_len
    assert not rows[3].gopher_hash_ratio
    assert not rows[4].gopher_ellipsis_ratio
    assert not rows[5].gopher_bullet_lines
    assert not rows[6].gopher_alpha_words
    assert not rows[7].gopher_stop_words
    assert {r.doc_id for r in apply_gopher(_df(spark, texts)).collect()} == {0}


def test_plans_are_jvm_only(spark):
    from tests.plan_utils import formatted_plan

    df = _df(spark, [GOOD])
    for plan in (
        formatted_plan(c4_rules(df)),
        formatted_plan(gopher_rules(df)),
    ):
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "MapInPandas" not in plan


def test_fixture_corpus_pass_rates_are_sane(spark):
    """On the synthetic documents table both rule sets keep a
    non-trivial fraction and drop a non-trivial fraction — the knobs
    are live, not vacuous."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    n = docs.count()
    # the synthetic keyword-soup corpus contains only "the" from the
    # canonical stop set, so relax that one rule to see the rest live
    g = apply_gopher(docs, min_words=10, min_stop_words=1).count()
    assert 0 < g <= n
    # and the default stop-word rule correctly flags the soup as
    # not-prose: the rule is live, not vacuous
    assert apply_gopher(docs, min_words=10).count() == 0
