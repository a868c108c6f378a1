"""Curate v2: the round-8 operator families composed end-to-end the
way a production training-data build would chain them — the
integration-level proof that the new pieces form one pipeline, not
ten islands (q99 is the v1 composition over the heuristic-era ops).

  corpus + new crawl batch
    -> model-based quality gate   (nbquality: log-odds vs boilerplate)
    -> incremental near-dedup     (increddup vs a persisted LSH index)
    -> BPE train + encode to ids  (bpetrain + encode)
    -> token accounting ready for packing/sharding

Assertions: boilerplate rejected by the classifier, near-copies of
indexed corpus docs rejected by the incremental dedup, survivors
encoded with ids consistent with bpe_token_count, and the whole
pipeline deterministic across two runs.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.bpetrain import bpe_train_merges
from utc_cuip_kafka_aws_connector_spark.operators.encode import (
    bpe_encode,
    bpe_vocab,
    corpus_chars,
)
from utc_cuip_kafka_aws_connector_spark.operators.increddup import (
    build_lsh_index,
    incremental_near_dups,
)
from utc_cuip_kafka_aws_connector_spark.operators.nbquality import (
    nb_log_odds,
    nb_train,
)
from utc_cuip_kafka_aws_connector_spark.operators.tokenizer import bpe_token_count


def _doc(seed: int, n: int = 30) -> str:
    rng = random.Random(seed)
    return " ".join(f"w{rng.randrange(150)}" for _ in range(n))


def _near_copy(seed: int) -> str:
    toks = _doc(seed).split()
    toks[3], toks[17] = "edited", "tweaked"
    return " ".join(toks)


BOILER = "click here subscribe now buy cheap deals offer " * 4


@pytest.fixture(scope="module")
def world(spark):
    corpus = spark.createDataFrame(
        [(i, _doc(i)) for i in range(12)], "doc_id long, text string"
    )
    labeled = spark.createDataFrame(
        [(i, _doc(100 + i), "keep") for i in range(25)]
        + [(50 + i, BOILER + f"w{i}", "drop") for i in range(25)],
        "doc_id long, text string, lang string",
    )
    batch = spark.createDataFrame(
        [(1000 + i, _doc(200 + i)) for i in range(6)]     # clean, new
        + [(1100 + i, _near_copy(i)) for i in range(3)]   # corpus near-copies
        + [(1200 + i, BOILER + f"x{i}") for i in range(3)],  # boilerplate
        "doc_id long, text string",
    )
    return corpus, labeled, batch


def _curate(spark, corpus, labeled, batch):
    clf = nb_train(labeled, label_col="lang")
    quality_ok = nb_log_odds(batch, clf, "keep").filter(F.col("log_odds") > 0)
    gated = batch.join(quality_ok.select("doc_id"), "doc_id", "left_semi")
    index = build_lsh_index(corpus)
    verdict = incremental_near_dups(gated, index, 0.5)
    accepted = gated.join(
        verdict.filter(~F.col("is_dup")).select(F.col("doc").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    merges = bpe_train_merges(corpus, n_merges=16)
    vocab = bpe_vocab(merges, corpus_chars(corpus.unionByName(accepted)))
    return accepted, bpe_encode(accepted, merges, vocab)


def test_curate_v2_end_to_end(spark, world):
    corpus, labeled, batch = world
    accepted, encoded = _curate(spark, corpus, labeled, batch)
    ids = {r.doc_id for r in accepted.select("doc_id").collect()}
    assert ids == {1000 + i for i in range(6)}  # clean survives...
    # ...boilerplate fell to the classifier, near-copies to the dedup
    enc = {r.doc_id: r.token_ids for r in encoded.collect()}
    assert set(enc) == ids
    merges = bpe_train_merges(corpus, n_merges=16)
    counts = {
        r.doc_id: r.n_tokens
        for r in bpe_token_count(accepted, merges=merges).collect()
    }
    assert all(len(enc[d]) == counts[d] > 0 for d in ids)


def test_curate_v2_is_deterministic(spark, world):
    corpus, labeled, batch = world
    _, enc_a = _curate(spark, corpus, labeled, batch)
    _, enc_b = _curate(spark, corpus, labeled, batch)
    a = sorted((r.doc_id, tuple(r.token_ids)) for r in enc_a.collect())
    b = sorted((r.doc_id, tuple(r.token_ids)) for r in enc_b.collect())
    assert a == b
