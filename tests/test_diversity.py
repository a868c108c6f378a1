"""operators/diversity.py: corpus n-gram diversity (distinct-n).

Evidence: exact-path Python differential on hand-derivable corpora
(every total/distinct arithmetically checkable, casing folded,
short-doc exclusion), mode-collapse detection (a repetitive corpus
scores strictly lower distinct-2 than a varied one), approx path
within its rsd of exact, grouped vs keyless, one-scan plan shape
(single Generate over a single corpus scan), and validation.
"""

from __future__ import annotations

import re

import pytest

from tests.plan_utils import formatted_plan
from utc_cuip_kafka_aws_connector_spark.operators.diversity import (
    ngram_diversity,
)


def _py_distinct_n(texts, n):
    total, seen = 0, set()
    for t in texts:
        toks = [w for w in re.split(r"\s+", (t or "").lower()) if w]
        grams = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
        total += len(grams)
        seen.update(grams)
    return total, len(seen)


def test_exact_matches_python_reference(spark):
    texts_en = ["The cat sat", "the CAT ran far", "a b"]
    texts_de = ["x y x y x", None, "z"]
    rows = [(i, t, "en") for i, t in enumerate(texts_en)] + [
        (10 + i, t, "de") for i, t in enumerate(texts_de)
    ]
    df = spark.createDataFrame(rows, "id long, text string, lang string")
    got = {
        (r.lang, r.n): r
        for r in ngram_diversity(
            df, ns=(1, 2, 3), group_col="lang", method="exact"
        ).collect()
    }
    for lang, texts in (("en", texts_en), ("de", texts_de)):
        for n in (1, 2, 3):
            total, distinct = _py_distinct_n(texts, n)
            if total == 0:
                assert (lang, n) not in got
                continue
            r = got[(lang, n)]
            assert (r.total_grams, r.distinct_grams) == (total, distinct)
            assert r.distinct_ratio == pytest.approx(distinct / total)
    # casing folded: "The cat"/"the CAT" share the unigram 'the'/'cat'
    assert got[("en", 1)].distinct_grams == 7  # the,cat,sat,ran,far,a,b
    # keyless row == union
    tot = {
        r.n: r for r in ngram_diversity(df, ns=(2,), method="exact").collect()
    }
    t_all, d_all = _py_distinct_n(texts_en + texts_de, 2)
    assert (tot[2].total_grams, tot[2].distinct_grams) == (t_all, d_all)


def test_mode_collapse_detected(spark):
    varied = [(i, f"token{i} alpha{i * 7 % 13} beta{i * 3 % 11} g{i}", "v")
              for i in range(50)]
    collapsed = [(100 + i, "the same old line again", "c") for i in range(50)]
    df = spark.createDataFrame(
        varied + collapsed, "id long, text string, lang string"
    )
    got = {
        (r.lang, r.n): r.distinct_ratio
        for r in ngram_diversity(
            df, ns=(2,), group_col="lang", method="exact"
        ).collect()
    }
    assert got[("c", 2)] < 0.05 < got[("v", 2)]


def test_approx_within_rsd_of_exact(spark):
    rows = [(i, f"w{i % 97} w{(i * 13) % 89} w{(i * 7) % 83} w{i}", None)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, text string, lang string")
    exact = {
        r.n: r for r in ngram_diversity(df, ns=(1, 2), method="exact").collect()
    }
    approx = {
        r.n: r
        for r in ngram_diversity(df, ns=(1, 2), method="approx", rsd=0.02).collect()
    }
    for n in (1, 2):
        assert approx[n].total_grams == exact[n].total_grams  # exact either way
        rel = abs(approx[n].distinct_grams - exact[n].distinct_grams) / exact[
            n
        ].distinct_grams
        assert rel < 0.08  # 4x the 2% rsd: deterministic seed, no flake


def test_one_scan_one_explode(spark):
    df = spark.createDataFrame([(0, "a b c", "x")], "id long, text string, lang string")
    plan = formatted_plan(
        ngram_diversity(df, ns=(1, 2, 3), group_col="lang", method="approx")
    )
    # count formatted-detail headers: one entry per physical node
    assert len(re.findall(r"\(\d+\) Scan ExistingRDD", plan)) == 1
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1  # one explode, all n
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_validation(spark):
    df = spark.createDataFrame([(0, "a", "x")], "id long, text string, lang string")
    with pytest.raises(ValueError, match="ns must be"):
        ngram_diversity(df, ns=())
    with pytest.raises(ValueError, match="ns must be"):
        ngram_diversity(df, ns=(0,))
    with pytest.raises(ValueError, match="method"):
        ngram_diversity(df, method="sketchy")
