"""Prefix-filter exact set-similarity join (operators/setjoin.py).

The oracle-parity test (q113) proves exactness on the fixture corpus;
these tests pin the two properties parity cannot show:
(1) lossless-ness on a corpus with genuinely borderline pairs around
    the threshold, against the naive inverted-index plan, and
(2) the efficiency claim — the prefix index admits strictly fewer
    candidate pairs than the full inverted index on a Zipf corpus
    (on uniform vocabularies the two coincide; Zipf skew is where
    prefix filtering earns its keep).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.setjoin import (
    inverted_index_candidates,
    prefix_filter_jaccard_join,
    prefix_length,
    tokenize_distinct,
)


def test_prefix_length_rule():
    # |s| - ceil(t*|s|) + 1, integer-exact at representation
    # boundaries where float ceil(sz * 0.6) goes wrong.
    assert prefix_length(10, 0.6) == 5
    assert prefix_length(5, 0.6) == 3
    assert prefix_length(1, 0.6) == 1
    # t = 1.0: only identical sets qualify; prefix is 1 token.
    assert prefix_length(7, 1.0) == 1
    # the float trap: 49 * 0.7 = 34.299999999999997 but
    # ceil(49 * 7/10) must be 35 -> prefix 15, and 50 * 0.7 is
    # exactly 35 -> prefix 16.
    assert prefix_length(49, 0.7) == 15
    assert prefix_length(50, 0.7) == 16


def test_threshold_validation():
    with pytest.raises(ValueError):
        prefix_length(10, 0.0)
    with pytest.raises(ValueError):
        prefix_length(10, 1.5)


def _zipf_corpus(n_docs: int, seed: int = 7):
    """Docs over a Zipf vocabulary with planted near-duplicates and
    borderline pairs: each doc samples 12 words Zipf-weighted from a
    60-word vocab; every 10th doc is re-emitted with 1-3 words
    swapped, landing pairs on BOTH sides of the 0.6 threshold."""
    rng = random.Random(seed)
    vocab = [f"w{i:02d}" for i in range(60)]
    weights = [1.0 / (i + 1) for i in range(60)]
    docs = []
    for i in range(n_docs):
        words = rng.choices(vocab, weights=weights, k=12)
        docs.append((i, " ".join(words)))
        if i % 10 == 0:
            mutated = list(words)
            for _ in range(rng.randint(1, 3)):
                mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
            docs.append((i + 100_000, " ".join(mutated)))
    return docs


def test_exactness_vs_brute_force(spark):
    docs = spark.createDataFrame(_zipf_corpus(80), "doc_id long, text string")
    sets = tokenize_distinct(docs).cache()
    got = {
        (r.id_a, r.id_b, r.inter, r.union_n)
        for r in prefix_filter_jaccard_join(sets, threshold=0.6).collect()
    }

    # Brute force: verify EVERY pair via the full inverted index
    # (recall 1 for any positive threshold: qualifying pairs share a
    # token) with no prefix or size filtering anywhere.
    cand = inverted_index_candidates(sets)
    a = sets.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    brute = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("toks_a", "toks_b")).cast("long"))
        .withColumn("union_n", F.size(F.array_union("toks_a", "toks_b")).cast("long"))
        .filter(F.col("inter") * 5 >= F.col("union_n") * 3)  # J >= 3/5
    )
    want = {
        (r.id_a, r.id_b, r.inter, r.union_n) for r in brute.collect()
    }
    assert got == want
    assert want, "corpus must produce qualifying pairs for the test to bite"
    sets.unpersist()


def test_prefix_candidates_strictly_fewer(spark):
    docs = spark.createDataFrame(_zipf_corpus(80), "doc_id long, text string")
    sets = tokenize_distinct(docs).cache()
    naive = inverted_index_candidates(sets).count()

    # Re-derive the prefix candidate set exactly as the operator does
    # (shared prefix token + size filter, before verification).
    tok = sets.select("id", F.explode("toks").alias("tok"))
    dfreq = tok.groupBy("tok").agg(F.count("*").alias("df"))
    ordered = (
        tok.join(dfreq, "tok")
        .groupBy("id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"],
            ).alias("toks")
        )
        .withColumn("sz", F.size("toks"))
    )
    min_overlap = F.floor((F.col("sz") * 3 + 4) / 5)
    pref = ordered.select(
        "id", "sz", F.explode(F.slice("toks", 1, F.col("sz") - min_overlap + 1)).alias("tok")
    )
    x, y = pref.alias("x"), pref.alias("y")
    pruned = (
        x.join(y, "tok")
        .filter(F.col("x.id") < F.col("y.id"))
        .filter(
            (F.col("x.sz") * 5 >= F.col("y.sz") * 3)
            & (F.col("y.sz") * 5 >= F.col("x.sz") * 3)
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
        .count()
    )
    # On a Zipf corpus the prefix index must prune hard; anything
    # under half the naive candidate count demonstrates the effect
    # (observed ~10x on this corpus), and the exactness test above
    # proves the pruning lost nothing.
    assert pruned < naive / 2, (naive, pruned)
    sets.unpersist()


@pytest.mark.parametrize("threshold,num,den", [(0.5, 1, 2), (0.7, 7, 10), (0.9, 9, 10)])
def test_exactness_across_thresholds(spark, threshold, num, den):
    """The rational-threshold arithmetic must stay lossless at every
    threshold shape: a half (den divides most sizes), a 7/10 (the
    float-ceil trap family), and a tight 9/10. Same brute-force
    comparison as above, one Spark job per threshold."""
    docs = spark.createDataFrame(_zipf_corpus(50, seed=threshold), "doc_id long, text string")
    sets = tokenize_distinct(docs).cache()
    got = {
        (r.id_a, r.id_b)
        for r in prefix_filter_jaccard_join(sets, threshold=threshold).collect()
    }
    cand = inverted_index_candidates(sets)
    a = sets.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    want = {
        (r.id_a, r.id_b)
        for r in (
            cand.join(a, "id_a")
            .join(b, "id_b")
            .withColumn("i", F.size(F.array_intersect("toks_a", "toks_b")))
            .withColumn("u", F.size(F.array_union("toks_a", "toks_b")))
            .filter(F.col("i") * den >= F.col("u") * num)
            .collect()
        )
    }
    assert got == want
    sets.unpersist()


def test_full_corpus_planted_pairs(spark):
    """The exact join at CORPUS size (q103's construction, pytest
    evidence ahead of a future gate slot): 20k docs of 12 unique
    tokens drawn from a 50k-id vocabulary — random cross-doc Jaccard
    is ~2.4e-3, so the only pairs at J >= 0.8 are the planted copies
    (every 20th doc re-emitted with exactly one token swapped:
    inter=11, union=13, J=11/13 ~ 0.846). The operator must return
    exactly the planted pair set with exact counts — at a size where
    the all-pairs oracle (200M comparisons) is no longer runnable,
    which is the operator's whole reason to exist."""
    rng = random.Random(99)
    docs, expected = [], {}
    for i in range(20_000):
        toks = rng.sample(range(50_000), 12)
        docs.append((i, " ".join(f"t{t}" for t in toks)))
        if i % 20 == 0:
            mutated = list(toks)
            mutated[rng.randrange(12)] = 50_000 + i  # token unique to the copy
            docs.append((i + 1_000_000, " ".join(f"t{t}" for t in mutated)))
            expected[(i, i + 1_000_000)] = (11, 13)
    sets = tokenize_distinct(
        spark.createDataFrame(docs, "doc_id long, text string")
    )
    got = {
        (r.id_a, r.id_b): (r.inter, r.union_n)
        for r in prefix_filter_jaccard_join(sets, threshold=0.8).collect()
    }
    assert got == expected
    assert len(expected) == 1_000
