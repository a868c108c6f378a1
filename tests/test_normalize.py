"""operators/normalize.py: unicode normalization for corpus prep.

Evidence: the canonicalizations that make hash-based dedup correct
(NFKC compatibility folds, accent strip, control strip, whitespace
collapse), idempotence of the full chain, null/empty passthrough,
schema/row preservation, and the downstream payoff — NFC-vs-NFD
variants of one text exact-dedup together only after normalizing.
"""

from __future__ import annotations

import unicodedata

import pytest

from utc_cuip_kafka_aws_connector_spark.operators.dedup import exact_dedup
from utc_cuip_kafka_aws_connector_spark.operators.normalize import normalize_text

ZWSP = "​"  # zero-width space (Cf -> stripped)
LIG_FI = "ﬁ"  # 'fi' ligature (NFKC -> "fi")
ONE_CIRCLED = "①"  # circled one (NFKC -> "1")


def _rows(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_nfkc_compatibility_folds(spark):
    df = _rows(spark, [f"{LIG_FI}le {ONE_CIRCLED}", "ｆｕｌｌ"])
    got = [r.text for r in normalize_text(df).orderBy("doc_id").collect()]
    assert got == ["file 1", "full"]


def test_accent_and_case_strip(spark):
    df = _rows(spark, ["Café RÉSUMÉ"])
    (r,) = normalize_text(df, lower=True, strip_accents=True).collect()
    assert r.text == "cafe resume"


def test_control_strip_and_ws_collapse(spark):
    df = _rows(spark, [f"a{ZWSP}b\r\n  c d", "  x\t\ty  "])
    got = [r.text for r in normalize_text(df).orderBy("doc_id").collect()]
    assert got == ["ab c d", "x y"]


def test_idempotent(spark):
    texts = [
        f"{LIG_FI}le {ONE_CIRCLED}",
        "Café RÉSUMÉ\r\n x",
        "plain ascii",
        f"wide{ZWSP}",
    ]
    df = _rows(spark, texts)
    kw = dict(lower=True, strip_accents=True)
    once = normalize_text(df, **kw)
    twice = normalize_text(once, **kw)
    a = [r.text for r in once.orderBy("doc_id").collect()]
    b = [r.text for r in twice.orderBy("doc_id").collect()]
    assert a == b


def test_nulls_rows_and_schema_preserved(spark):
    df = spark.createDataFrame(
        [(1, None, "x"), (2, "ok", "y")], "doc_id long, text string, k string"
    )
    out = normalize_text(df)
    assert out.columns == ["doc_id", "text", "k"]
    got = {r.doc_id: (r.text, r.k) for r in out.collect()}
    assert got == {1: (None, "x"), 2: ("ok", "y")}
    named = normalize_text(df, out_col="clean")
    assert named.columns == ["doc_id", "text", "k", "clean"]


def test_normalization_makes_exact_dedup_correct(spark):
    """The motivating bug: NFC and NFD spellings of the same word are
    byte-different, so exact dedup keeps both — until normalized."""
    nfc = unicodedata.normalize("NFC", "café society")
    nfd = unicodedata.normalize("NFD", "café society")
    assert nfc != nfd
    df = _rows(spark, [nfc, nfd])
    before = exact_dedup(df, id_col="doc_id").count()
    after = exact_dedup(normalize_text(df), id_col="doc_id").count()
    assert before == 2 and after == 1


def test_form_validation(spark):
    with pytest.raises(ValueError, match="form"):
        normalize_text(_rows(spark, ["x"]), form="NFX")
