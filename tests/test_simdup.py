"""operators/simdup.py: banded SimHash near-dup."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.dedup import simhash
from utc_cuip_kafka_aws_connector_spark.operators.simdup import (
    simhash_near_dups,
)


def _doc(seed: int, n: int = 60) -> str:
    rng = random.Random(seed)
    return " ".join(f"w{rng.randrange(300)}" for _ in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, _doc(i)) for i in range(12)]
    for i in range(3):  # light edits of docs 0..2
        toks = _doc(i).split()
        toks[7] = "edited"
        rows.append((100 + i, " ".join(toks)))
    # a token-REORDERED copy: simhash is multiset-invariant -> distance 0
    shuffled = _doc(5).split()
    random.Random(99).shuffle(shuffled)
    rows.append((200, " ".join(shuffled)))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(5)


def test_matches_bruteforce_hamming(spark, corpus):
    max_d, bands = 7, 8
    got = {
        (r.id_a, r.id_b): r.distance
        for r in simhash_near_dups(corpus, max_distance=max_d, bands=bands).collect()
    }
    fps = {r.doc_id: r.simhash64 for r in simhash(corpus, "doc_id").collect()}
    want = {}
    ids = sorted(fps)
    for i in ids:
        for j in ids:
            if i < j:
                d = bin((fps[i] ^ fps[j]) & ((1 << 64) - 1)).count("1")
                if d <= max_d:
                    want[(i, j)] = d
    assert got == want and want  # complete AND non-degenerate


def test_edits_and_reorderings_are_caught(spark, corpus):
    # 60-token docs put a one-token edit at ~1-8 bits; 16 bands of 4
    # bits keep completeness through distance 15
    pairs = {
        (r.id_a, r.id_b)
        for r in simhash_near_dups(corpus, max_distance=10, bands=16).collect()
    }
    assert (5, 200) in pairs  # reordering: distance 0 by multiset invariance
    for i in range(3):
        assert (i, 100 + i) in pairs  # light edits within radius
    flat = {x for p in pairs for x in p}
    assert 11 not in flat  # an unrelated doc stays unmatched
