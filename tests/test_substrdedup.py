"""operators/substrdedup.py: exact repeated-substring removal.

Ground truth is a pure-Python reference implementing the same
contract with TUPLE equality (no hashing): window -> occurrence list,
canonical = min (doc, start), removed tokens = union of non-canonical
windows. Randomized corpora with planted repeats drive the
differential; structural tests pin the contract's edges.
"""

from __future__ import annotations

import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.substrdedup import (
    _window_hashes,
    duplicate_windows,
    strip_duplicate_spans,
)


def reference_strip(docs: dict[int, str], window: int) -> dict[int, str]:
    """Tuple-equality reference of the published semantics."""
    toks = {d: [t for t in t_.split() if t] for d, t_ in docs.items()}
    occ: dict[tuple, list[tuple[int, int]]] = defaultdict(list)
    for d in sorted(toks):
        ts = toks[d]
        for i in range(len(ts) - window + 1):
            occ[tuple(ts[i : i + window])].append((d, i))
    drop: dict[int, set] = defaultdict(set)
    for positions in occ.values():
        if len(positions) < 2:
            continue
        for d, i in positions[1:]:  # positions sorted by (doc, start)
            drop[d].update(range(i, i + window))
    return {
        d: (
            " ".join(t for j, t in enumerate(ts) if j not in drop[d])
            if drop[d]
            else docs[d]  # untouched docs keep their original bytes
        )
        for d, ts in toks.items()
    }


def _spark_strip(spark, docs: dict[int, str], window: int) -> dict[int, str]:
    df = spark.createDataFrame(
        sorted(docs.items()), "doc_id long, text string"
    ).repartition(6)
    out = strip_duplicate_spans(df, window=window)
    return {r.doc_id: r.text for r in out.collect()}


def test_rolling_hash_matches_direct_window_equality():
    toks = [f"w{i % 7}" for i in range(40)]
    h = _window_hashes(toks, 5)
    assert len(h) == 36
    for i in range(36):
        for j in range(36):
            same = toks[i : i + 5] == toks[j : j + 5]
            assert (h[i] == h[j]) == same, (i, j)


def test_planted_cross_doc_paragraph(spark):
    para = " ".join(f"quoted{i}" for i in range(60))
    docs = {
        0: "intro words here " + para + " closing remarks",
        1: "different opening " + para,
        2: para + " and a tail",
        3: "completely unrelated text with plenty of its own words " * 5,
    }
    got = _spark_strip(spark, docs, window=50)
    assert got == reference_strip(docs, 50)
    # canonical occurrence (doc 0) survives; copies are gone
    assert "quoted0" in got[0]
    assert "quoted0" not in got[1] and "quoted0" not in got[2]
    assert got[1].startswith("different opening")
    assert got[3] == docs[3]  # untouched, byte-preserved


def test_intra_doc_repeat(spark):
    chunk = " ".join(f"r{i}" for i in range(20))
    docs = {7: chunk + " middle bit " + chunk}
    got = _spark_strip(spark, docs, window=20)
    assert got == reference_strip(docs, 20)
    assert got[7].count("r0") == 1  # second occurrence removed


@pytest.mark.parametrize("seed", [1, 2])
def test_randomized_differential(spark, seed):
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(50)]
    docs = {}
    for d in range(20):
        docs[d] = " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 120)))
    # plant repeats: splice doc 0's middle into three others
    donor = docs[0].split()
    if len(donor) >= 30:
        span = " ".join(donor[2:28])
        for d in (5, 11, 17):
            docs[d] = docs[d] + " " + span
    got = _spark_strip(spark, docs, window=12)
    assert got == reference_strip(docs, 12)


def test_short_docs_and_empty_are_untouched(spark):
    docs = {1: "too short", 2: "", 3: "a b c d e"}
    got = _spark_strip(spark, docs, window=50)
    assert got == {1: "too short", 2: "", 3: "a b c d e"}


def test_duplicate_windows_canonical_marking(spark):
    para = " ".join(f"x{i}" for i in range(10))
    df = spark.createDataFrame(
        [(3, para), (1, "lead in " + para)], "doc_id long, text string"
    )
    rows = duplicate_windows(df, window=10).collect()
    canon = [(r.doc, r.start) for r in rows if r.canonical]
    other = [(r.doc, r.start) for r in rows if not r.canonical]
    assert canon == [(1, 2)]  # min (doc, start) wins
    assert other == [(3, 0)]


def test_validation(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window"):
        duplicate_windows(df, window=1)
    with pytest.raises(ValueError, match="stride"):
        duplicate_windows(df, stride=0)
    # ADVICE r10: a string id used to die as an opaque numpy cast
    # error inside the Arrow worker; now it refuses up-front, at plan
    # build time, with the remediation in the message
    strs = spark.createDataFrame([("d0", "a b")], "doc_id string, text string")
    with pytest.raises(TypeError, match="integral"):
        duplicate_windows(strs, window=2)


# --- hypothesis properties (the repo's §5.2 idiom) ---------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny alphabet + short docs force window collisions and overlap edges
corpus_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=0, max_size=30
    ).map(" ".join),
    min_size=1,
    max_size=10,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=corpus_strategy, window=st.integers(min_value=2, max_value=5))
def test_hypothesis_differential(spark, texts, window):
    docs = dict(enumerate(texts))
    assert _spark_strip(spark, docs, window) == reference_strip(docs, window)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=corpus_strategy, window=st.integers(min_value=2, max_value=5))
def test_hypothesis_invariants(spark, texts, window):
    """Structural invariants that hold for ANY input: token
    multiset never grows, untouched docs byte-preserved, and every
    surviving window is either unique or canonical."""
    docs = dict(enumerate(texts))
    got = _spark_strip(spark, docs, window)
    for d, before in docs.items():
        after = got[d]
        b, a = before.split(), after.split()
        assert len(a) <= len(b)
        if len(a) == len(b):
            assert after == before  # untouched => byte-preserved
