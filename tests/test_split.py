"""operators/split.py: leakage-safe group splitting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.split import (
    leakage_safe_split,
    md5_unit_hash,
    split_report,
)

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def corpus(spark):
    # 2000 docs; every 10th doc has a near-copy at id+100000
    docs = [(i, f"text {i}") for i in range(2000)]
    docs += [(i + 100_000, f"text {i} tweaked") for i in range(0, 2000, 10)]
    comp = [(i + 100_000, i) for i in range(0, 2000, 10)]
    comp += [(i, i) for i in range(0, 2000, 10)]
    return (
        spark.createDataFrame(docs, "doc_id long, text string"),
        spark.createDataFrame(comp, "doc_id long, component long"),
    )


def test_components_never_straddle_splits(spark, corpus):
    df, comp = corpus
    out = leakage_safe_split(df, comp, FR, seed=3).collect()
    by_comp: dict = {}
    for r in out:
        by_comp.setdefault(r.component, set()).add(r.split)
    assert all(len(s) == 1 for s in by_comp.values())
    # the planted near-copies specifically: same split as their original
    split_of = {r.doc_id: r.split for r in out}
    for i in range(0, 2000, 10):
        assert split_of[i] == split_of[i + 100_000], i


def test_fractions_are_approximately_met(spark, corpus):
    df, comp = corpus
    rep = {
        r.split: r.fraction
        for r in split_report(leakage_safe_split(df, comp, FR, seed=3)).collect()
    }
    assert set(rep) == {"train", "val", "test"}
    assert rep["train"] == pytest.approx(0.8, abs=0.05)
    assert rep["val"] == pytest.approx(0.1, abs=0.04)
    assert rep["test"] == pytest.approx(0.1, abs=0.04)


def test_deterministic_and_layout_independent(spark, corpus):
    df, comp = corpus
    a = {r.doc_id: r.split for r in leakage_safe_split(df, comp, FR, seed=9).collect()}
    b = {
        r.doc_id: r.split
        for r in leakage_safe_split(df.repartition(23), comp, FR, seed=9).collect()
    }
    assert a == b
    c = {r.doc_id: r.split for r in leakage_safe_split(df, comp, FR, seed=10).collect()}
    assert a != c  # seed moves the cut


def test_growing_the_corpus_never_moves_old_rows(spark, corpus):
    """Release-to-release stability: adding documents must not change
    any existing assignment (hash cut, not quota balancing)."""
    df, comp = corpus
    before = {
        r.doc_id: r.split for r in leakage_safe_split(df, comp, FR, seed=3).collect()
    }
    extra = spark.createDataFrame(
        [(500_000 + i, f"new {i}") for i in range(300)], "doc_id long, text string"
    )
    after = {
        r.doc_id: r.split
        for r in leakage_safe_split(df.unionByName(extra), comp, FR, seed=3).collect()
    }
    assert all(after[d] == s for d, s in before.items())


def test_validation(spark, corpus):
    df, comp = corpus
    with pytest.raises(ValueError, match="at least one"):
        leakage_safe_split(df, comp, {})
    with pytest.raises(ValueError, match="positive"):
        leakage_safe_split(df, comp, {"a": -1.0, "b": 2.0})


def test_md5_unit_hash_injection_matches_hex_threshold(spark, corpus):
    """unit_hash= overrides the xxhash64 default; md5_unit_hash's
    numeric cut at exact binary fractions is bit-equivalent to the
    lexicographic hex-prefix compare a SQL oracle uses (the q122 gate
    contract): u < 0.75  <=>  substr(md5(comp), 1, 8) < 'c0000000'."""
    import hashlib

    df, comp = corpus
    fr = {"train": 0.75, "val": 0.125, "test": 0.125}
    out = leakage_safe_split(df, comp, fr, unit_hash=md5_unit_hash).collect()

    def expect(component: int) -> str:
        h = hashlib.md5(str(component).encode()).hexdigest()[:8]
        return "train" if h < "c0000000" else ("val" if h < "e0000000" else "test")

    for r in out:
        assert r.split == expect(r.component), (r.doc_id, r.component)
    # still component-consistent and layout-independent
    by_comp: dict = {}
    for r in out:
        by_comp.setdefault(r.component, set()).add(r.split)
    assert all(len(s) == 1 for s in by_comp.values())
