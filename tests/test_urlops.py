"""operators/urlops.py: URL normalization + per-domain caps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.urlops import (
    normalize_url,
    per_domain_cap,
    registered_domain,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.n for r in df.select(normalize_url("url").alias("n")).collect()]


def test_normalization_canonicalizes_equivalent_urls(spark):
    variants = [
        "https://Example.COM/page?b=2&a=1",
        "https://example.com:443/page?a=1&b=2",
        "https://example.com/page?utm_source=x&b=2&a=1&utm_campaign=y",
        "https://example.com/page?a=1&gclid=abc&b=2#section",
    ]
    got = set(_norm(spark, variants))
    assert got == {"https://example.com/page?a=1&b=2"}


def test_normalization_edges(spark):
    got = _norm(
        spark,
        [
            "http://a.com/",                      # bare path dropped
            "http://a.com",
            "http://a.com/x/?utm_source=1",       # all params tracking
            "not a url at all",                   # fallback, stable
            None,
        ],
    )
    assert got[0] == got[1] == "http://a.com"
    assert got[2] == "http://a.com/x/"
    assert got[3] == "not a url at all"
    assert got[4] is None


def test_registered_domain(spark):
    df = spark.createDataFrame(
        [
            ("https://news.example.com/a",),
            ("https://www.shop.example.co.uk/b",),
            ("https://example.com/c",),
            ("https://localhost/d",),
        ],
        "url string",
    )
    got = [r.d for r in df.select(registered_domain("url").alias("d")).collect()]
    assert got == ["example.com", "example.co.uk", "example.com", "localhost"]


def test_per_domain_cap_prefers_quality(spark):
    rows = []
    for i in range(50):
        rows.append((i, f"https://big.com/p{i}", float(i)))
    for i in range(3):
        rows.append((100 + i, f"https://small{i}.org/x", 1.0))
    df = spark.createDataFrame(rows, "doc_id long, url string, quality double")
    out = per_domain_cap(df, max_per_domain=5, order_col="quality")
    by_domain: dict = {}
    for r in out.collect():
        by_domain.setdefault(r.domain, []).append(r.doc_id)
    assert len(by_domain["big.com"]) == 5
    assert sorted(by_domain["big.com"]) == [45, 46, 47, 48, 49]  # top quality
    assert sum(len(v) for d, v in by_domain.items() if d != "big.com") == 3


def test_cap_compiles_to_window_group_limit(spark):
    from tests.plan_utils import formatted_plan

    df = spark.createDataFrame(
        [(0, "https://a.com/x", 1.0)], "doc_id long, url string, quality double"
    )
    plan = formatted_plan(per_domain_cap(df, max_per_domain=3, order_col="quality"))
    assert "WindowGroupLimit" in plan, plan


def test_hash_order_is_deterministic_unbiased_sample(spark):
    rows = [(i, "https://big.com/p%d" % i) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    a = sorted(r.doc_id for r in per_domain_cap(df, max_per_domain=10).collect())
    b = sorted(
        r.doc_id
        for r in per_domain_cap(df.repartition(7), max_per_domain=10).collect()
    )
    assert a == b and len(a) == 10
    assert a != list(range(10))  # hash order, not id order


def test_validation(spark):
    df = spark.createDataFrame([(0, "https://a.com")], "doc_id long, url string")
    with pytest.raises(ValueError, match="max_per_domain"):
        per_domain_cap(df, max_per_domain=0)
