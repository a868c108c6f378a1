"""operators/entropy.py: entropy / compressibility quality signals.

Evidence: batch kernel == single-doc references exactly on the real
fixture corpus, the separations that make the signals useful
(floods vs prose vs noise; digram catching what unigram misses),
and closed-form values on constructed inputs.
"""

from __future__ import annotations

import math
import random

import pytest

from utc_cuip_kafka_aws_connector_spark.operators.entropy import (
    char_entropy_one,
    digram_entropy_one,
    entropy_stats,
    zlib_ratio_one,
)

SF = "/root/testdata/sf0.001"


def test_batch_matches_single_doc_references(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    texts = {r.doc_id: r.text for r in docs.collect()}
    got = {r.doc_id: r for r in entropy_stats(docs).collect()}
    assert set(got) == set(texts)
    for d, text in texts.items():
        r = got[d]
        assert r.n_chars == len(text)
        assert r.char_entropy == pytest.approx(char_entropy_one(text), abs=1e-12)
        assert r.digram_entropy == pytest.approx(digram_entropy_one(text), abs=1e-12)
        assert r.zlib_ratio == zlib_ratio_one(text)


def test_closed_form_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in entropy_stats(df).collect()}
    assert got[1].char_entropy == 0.0
    assert got[2].char_entropy == pytest.approx(1.0)  # two equally likely chars
    assert got[3].char_entropy == pytest.approx(2.0)  # four
    # 'abab': digrams ab,ba,ab -> H = -(2/3 lg 2/3 + 1/3 lg 1/3)
    assert got[2].digram_entropy == pytest.approx(
        -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    )
    assert got[4].n_chars == 0 and got[4].char_entropy == 0.0
    assert got[5].n_chars == 0 and got[5].zlib_ratio == 0.0


def test_signals_separate_flood_prose_noise(spark):
    rng = random.Random(7)
    prose = (
        "the quick brown fox jumps over the lazy dog while rain falls "
        "softly on the quiet meadow and the river keeps its slow way "
    ) * 8
    flood = "buy now click here " * 60
    noise = "".join(
        rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/")
        for _ in range(1000)
    )
    df = spark.createDataFrame(
        [(1, prose), (2, flood), (3, noise)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in entropy_stats(df).collect()}
    # compressibility orders flood < prose < noise
    assert got[2].zlib_ratio < got[1].zlib_ratio < got[3].zlib_ratio
    assert got[3].zlib_ratio > 0.7  # random junk barely compresses
    assert got[2].zlib_ratio < 0.2  # template flood collapses
    # unigram entropy: noise ~ log2(64), flood low-ish
    assert got[3].char_entropy > 5.5
    assert got[2].char_entropy < got[1].char_entropy


def test_digram_catches_alternating_floods(spark):
    """'abab...' has the unigram entropy of real two-letter text but
    a collapsed digram distribution — the reason both exist."""
    df = spark.createDataFrame(
        [(1, "ab" * 500), (2, "the cat sat on the mat and then ran " * 20)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in entropy_stats(df).collect()}
    assert got[1].char_entropy == pytest.approx(1.0)
    assert got[1].digram_entropy < 1.01  # ~1 bit: only ab/ba
    assert got[2].digram_entropy > 3.0
