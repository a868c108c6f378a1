"""operators/encode.py: BPE encode-to-ids.

Evidence: end-to-end with the real trainer (bpe_train_merges on the
fixture corpus), consistency with bpe_token_count on every doc,
exact round-trip through the inverted vocab, unknown-symbol
fallback, and vocab determinism.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.bpetrain import bpe_train_merges
from utc_cuip_kafka_aws_connector_spark.operators.encode import (
    UNK,
    bpe_encode,
    bpe_vocab,
    corpus_chars,
    decode_ids,
)
from utc_cuip_kafka_aws_connector_spark.operators.tokenizer import (
    bpe_encode_word,
    bpe_token_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


@pytest.fixture(scope="module")
def trained(docs):
    merges = bpe_train_merges(docs, n_merges=24)
    vocab = bpe_vocab(merges, corpus_chars(docs))
    return merges, vocab


def test_vocab_is_deterministic_and_well_formed(docs, trained):
    merges, vocab = trained
    assert vocab[UNK] == 0
    assert vocab == bpe_vocab(merges, corpus_chars(docs))
    ids = list(vocab.values())
    assert ids == list(range(len(ids)))  # dense, gap-free id space
    for a, b in merges:
        assert a + b in vocab


def test_ids_match_token_count_and_reference_encoder(docs, trained):
    merges, vocab = trained
    enc = {r.doc_id: r.token_ids for r in bpe_encode(docs, merges, vocab).collect()}
    counts = {
        r.doc_id: r.n_tokens
        for r in bpe_token_count(docs, merges=merges).collect()
    }
    assert set(enc) == set(counts)
    assert all(len(enc[d]) == counts[d] for d in enc)
    # spot-exact against the pinned single-word reference encoder
    sample = {r.doc_id: r.text for r in docs.limit(20).collect()}
    for d, text in sample.items():
        want = [
            vocab.get(s, 0)
            for w in re.split(r"\s+", text)
            if w
            for s in bpe_encode_word(w, merges)
        ]
        assert enc[d] == want


def test_round_trip_reproduces_dewhitespaced_text(docs, trained):
    merges, vocab = trained
    enc = {r.doc_id: r.token_ids for r in bpe_encode(docs, merges, vocab).limit(50).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert enc  # corpus chars cover the corpus -> no unk, exact trip
    for d, ids in enc.items():
        assert 0 not in ids
        assert decode_ids(ids, vocab) == re.sub(r"\s+", "", texts[d])


def test_unknown_symbols_fall_back_to_unk(spark, trained):
    merges, vocab = trained
    assert "é" not in vocab
    df = spark.createDataFrame(
        [(1, "café table")], "doc_id long, text string"
    )
    (row,) = bpe_encode(df, merges, vocab).collect()
    assert 0 in row.token_ids  # the accented char maps to <unk>
    assert len(row.token_ids) > 1


def test_empty_and_whitespace_docs(spark, trained):
    merges, vocab = trained
    df = spark.createDataFrame(
        [(1, ""), (2, "   \t  ")], "doc_id long, text string"
    )
    got = {r.doc_id: r.token_ids for r in bpe_encode(df, merges, vocab).collect()}
    assert got == {1: [], 2: []}
