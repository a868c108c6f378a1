"""operators/increddup.py: incremental corpus dedup against a
persisted LSH index.

Evidence: planted near-copies of corpus docs are flagged with the
right canonical id, fresh docs pass, within-batch siblings resolve
to the earlier id, the index update closes the loop across batches,
and on unambiguous plants the incremental path agrees with the full
batch minhash_lsh_pairs run over the unioned corpus.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.dedup import minhash_lsh_pairs
from utc_cuip_kafka_aws_connector_spark.operators.increddup import (
    build_lsh_index,
    incremental_near_dups,
    index_band_bloom,
    updated_index,
)


def _doc(seed: int, n: int = 30) -> str:
    rng = random.Random(seed)
    return " ".join(f"w{rng.randrange(200)}" for _ in range(n))


def _near_copy(seed: int) -> str:
    toks = _doc(seed).split()
    toks[4] = "edited"
    toks[22] = "tweaked"
    return " ".join(toks)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, _doc(i)) for i in range(10)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def index(corpus):
    return build_lsh_index(corpus)


@pytest.fixture(scope="module")
def new_batch(spark):
    rows = (
        [(100 + i, _near_copy(i)) for i in range(4)]  # copies of corpus 0..3
        + [(200 + i, _doc(50 + i)) for i in range(4)]  # fresh
        + [(300, _doc(77)), (301, _doc(77))]  # intra-batch exact pair
    )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_flags_copies_and_passes_fresh(new_batch, index):
    v = {
        r.doc: (r.is_dup, r.dup_of, r.sim)
        for r in incremental_near_dups(new_batch, index, 0.5).collect()
    }
    assert len(v) == 10
    for i in range(4):
        is_dup, dup_of, sim = v[100 + i]
        assert is_dup and dup_of == i and sim >= 0.5
    for i in range(4):
        assert not v[200 + i][0]
    assert v[300][0] is False  # earlier sibling is canonical
    assert v[301] == (True, 300, 1.0)  # exact copy


def test_within_batch_toggle(new_batch, index):
    v = {
        r.doc: r.is_dup
        for r in incremental_near_dups(
            new_batch, index, 0.5, within_batch=False
        ).collect()
    }
    assert v[301] is False  # sibling matching disabled
    assert v[100] is True  # index matching unaffected


def test_index_update_closes_the_loop(spark, new_batch, index, corpus):
    verdict = incremental_near_dups(new_batch, index, 0.5)
    idx2 = updated_index(index, new_batch, verdict)
    # accepted docs (fresh + canonical sibling) entered the index...
    docs_in = {r.doc for r in idx2.select("doc").distinct().collect()}
    assert docs_in == set(range(10)) | {200, 201, 202, 203, 300}
    # ...so a later copy of doc 300 is now caught against the index
    batch3 = spark.createDataFrame([(400, _doc(77))], "doc_id long, text string")
    v = {r.doc: (r.is_dup, r.dup_of) for r in
         incremental_near_dups(batch3, idx2, 0.5).collect()}
    assert v[400] == (True, 300)


def test_agrees_with_full_batch_dedup_on_plants(spark, corpus, new_batch, index):
    """On unambiguous plants the incremental dup set must equal what
    the FULL minhash_lsh_pairs run over corpus+batch reports for new
    docs (restricted to pairs whose canonical side is the older id)."""
    full = minhash_lsh_pairs(
        corpus.unionByName(new_batch), "doc_id", jaccard_threshold=0.5
    ).collect()
    full_new_dups = {r.doc_b for r in full if r.doc_b >= 100}
    v = incremental_near_dups(new_batch, index, 0.5).collect()
    assert {r.doc for r in v if r.is_dup} == full_new_dups


def test_no_cartesian_in_the_plan(new_batch, index):
    plan = (
        incremental_near_dups(new_batch, index)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_bloom_prescreen_is_exact_and_prunes(spark, new_batch, index, corpus):
    """index_band_bloom (r10 brief): the verdict with the Bloom
    pre-screen is IDENTICAL to the unscreened run (no false
    negatives on band membership), and an all-novel batch's index
    probes prune to ~nothing before the join."""
    from utc_cuip_kafka_aws_connector_spark.operators.bloom import (
        bloom_semi_filter,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.increddup import (
        banded_signatures,
    )

    bloom = index_band_bloom(index)
    plain = {
        tuple(r) for r in incremental_near_dups(new_batch, index, 0.5).collect()
    }
    screened = {
        tuple(r)
        for r in incremental_near_dups(
            new_batch, index, 0.5, index_bloom=bloom
        ).collect()
    }
    assert screened == plain

    # a fully-novel batch shares no band bucket with the index: the
    # probe side shrinks to (at most the ~fpp noise of) nothing
    novel = spark.createDataFrame(
        [(900 + i, _doc(9000 + i)) for i in range(6)], "doc_id long, text string"
    )
    probes = banded_signatures(novel, "doc_id", "text", 64, 16, 3)
    survivors = bloom_semi_filter(probes, "band_key", bloom).count()
    assert survivors <= probes.count() * 0.1
    v = incremental_near_dups(novel, index, 0.5, index_bloom=bloom).collect()
    assert len(v) == 6 and all(not r.is_dup for r in v)


def test_vacuum_lsh_index_unlearns_removed_docs(spark, new_batch, index):
    """vacuum_lsh_index (r10 brief): after removing corpus doc 0 from
    the index, a near-copy of it is no longer flagged against the
    index — the removed content cannot veto fresh documents."""
    from utc_cuip_kafka_aws_connector_spark.operators.increddup import (
        vacuum_lsh_index,
    )

    dels = spark.createDataFrame([(0,)], "doc_id long")
    cleaned = vacuum_lsh_index(index, dels)
    assert cleaned.filter(F.col("doc") == 0).count() == 0
    assert cleaned.count() < index.count()
    copy_of_0 = new_batch.filter(F.col("doc_id") == 100)
    before = incremental_near_dups(copy_of_0, index, 0.5).first()
    after = incremental_near_dups(copy_of_0, cleaned, 0.5).first()
    assert before.is_dup and before.dup_of == 0
    assert not after.is_dup  # the ghost match is gone
    # other corpus docs still match normally
    copy_of_2 = new_batch.filter(F.col("doc_id") == 102)
    still = incremental_near_dups(copy_of_2, cleaned, 0.5).first()
    assert still.is_dup and still.dup_of == 2


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_randomized_differential_vs_full_dedup(spark, seed):
    """Randomized corpora (varying sizes, planted copy rates): the
    incremental path's dup set must equal the full batch run's
    new-doc dup set — same bands, same hashes, clear-margin plants."""
    rng = random.Random(seed)
    n_corpus = rng.randrange(6, 14)
    corpus_rows = [(i, _doc(seed * 100 + i)) for i in range(n_corpus)]
    new_rows = []
    nid = 1000
    for i in range(rng.randrange(4, 9)):
        if rng.random() < 0.4:  # plant a near-copy of a corpus doc
            new_rows.append((nid, _near_copy(seed * 100 + rng.randrange(n_corpus))))
        else:
            new_rows.append((nid, _doc(seed * 1000 + 500 + i)))
        nid += 1
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    verdict = incremental_near_dups(new, build_lsh_index(corpus), 0.5)
    inc_dups = {r.doc for r in verdict.collect() if r.is_dup}
    full = minhash_lsh_pairs(
        corpus.unionByName(new), "doc_id", jaccard_threshold=0.5
    ).collect()
    full_dups = {r.doc_b for r in full if r.doc_b >= 1000}
    assert inc_dups == full_dups
