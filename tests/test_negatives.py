"""operators/negatives.py: hard-negative mining.

Evidence: exact numpy differential for the brute baseline, planted
cluster geometry for label exclusion, ivf(nprobe=all) == brute
equality (pins the whole bucketed composition against the exact
path), partial-probe recall on clustered data, deterministic
tie-breaks on duplicate vectors, and a physical-plan check that the
IVF path joins on the cell id instead of building a cartesian
product.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.negatives import (
    hard_negatives,
)


def _cluster_corpus(spark):
    """Three well-separated direction clusters, 5 vectors each,
    labeled A/B/C; within a cluster vectors differ slightly so
    rankings are strict."""
    rng = np.random.default_rng(7)
    base = {
        "A": np.array([10.0, 0.0, 0.0, 0.0]),
        "B": np.array([0.0, 10.0, 0.0, 0.0]),
        "C": np.array([0.0, 0.0, 10.0, 0.0]),
    }
    rows, vecs = [], {}
    i = 0
    for lab, b in base.items():
        for _ in range(5):
            v = b + rng.normal(0, 0.3, 4)
            rows.append((i, [float(x) for x in v], lab))
            vecs[i] = v
            i += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, lang string"
    )
    return df, vecs, {r[0]: r[2] for r in rows}


def _np_hard_negs(vecs, labels, anchor, k, use_labels=True):
    a = vecs[anchor]
    sims = []
    for j, v in vecs.items():
        if j == anchor:
            continue
        if use_labels and labels[j] == labels[anchor]:
            continue
        s = float(
            a @ v / (np.linalg.norm(a) * np.linalg.norm(v))
        )
        sims.append((j, s))
    sims.sort(key=lambda t: (-t[1], t[0]))
    return sims[:k]


def test_brute_matches_numpy_reference(spark):
    df, vecs, labels = _cluster_corpus(spark)
    got = hard_negatives(
        df, k=3, label_col="lang", method="brute"
    ).collect()
    by_anchor = {}
    for r in got:
        by_anchor.setdefault(r.anchor_id, []).append(r)
    assert set(by_anchor) == set(vecs)
    for a, rows in by_anchor.items():
        rows.sort(key=lambda r: r.rank)
        want = _np_hard_negs(vecs, labels, a, 3)
        assert [r.neg_id for r in rows] == [j for j, _ in want]
        for r, (_, s) in zip(rows, want):
            assert r.cos_sim == pytest.approx(s, abs=1e-12)
        assert [r.rank for r in rows] == [1, 2, 3]


def test_label_and_self_exclusion(spark):
    df, vecs, labels = _cluster_corpus(spark)
    got = hard_negatives(df, k=14, label_col="lang", method="brute")
    rows = got.collect()
    for r in rows:
        assert r.neg_id != r.anchor_id
        assert labels[r.neg_id] != labels[r.anchor_id]
    # 15 vectors, 5 per label: each anchor has exactly 10 eligible
    # candidates -- k=14 must yield 10 rows, never padded
    counts = {r.anchor_id: 0 for r in rows}
    for r in rows:
        counts[r.anchor_id] += 1
    assert set(counts.values()) == {10}


def test_ivf_full_probe_equals_brute(spark):
    """nprobe >= n_centroids probes every cell, so the bucketed path
    must reproduce the exact baseline row-for-row — this pins the
    assignment, multi-probe, join, dedup, and rank tail at once."""
    df, _, _ = _cluster_corpus(spark)
    brute = hard_negatives(df, k=4, label_col="lang", method="brute")
    full = hard_negatives(
        df, k=4, label_col="lang", method="ivf",
        n_centroids=4, nprobe=4,
    )
    b = sorted(map(tuple, brute.collect()))
    f = sorted(map(tuple, full.collect()))
    assert b == f


def _angled_corpus(spark):
    """Three clusters at controlled ANGLES (A at 0deg, B at 45deg to
    A, C at 45deg to B but 90deg to A), 5 vectors each: every
    anchor's nearest non-positive cluster is unambiguous (A->B,
    B->A, C->B) with ~0.7-vs-0.0 cosine margins that 0.3-sigma noise
    on 10-scale directions cannot flip."""
    rng = np.random.default_rng(11)
    base = {
        "A": np.array([10.0, 0.0, 0.0, 0.0]),
        "B": np.array([7.0, 7.0, 0.0, 0.0]),
        "C": np.array([0.0, 7.0, 7.0, 0.0]),
    }
    rows, vecs = [], {}
    i = 0
    for lab, b in base.items():
        for _ in range(5):
            v = b + rng.normal(0, 0.3, 4)
            rows.append((i, [float(x) for x in v], lab))
            vecs[i] = v
            i += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, lang string"
    )
    return df, vecs, {r[0]: r[2] for r in rows}, base


def test_ivf_partial_probe_recall_on_clusters(spark):
    """Partial probing finds the true hard negatives when the probe
    order reaches the adjacent cluster: with explicit centroids at
    the three planted cluster directions and nprobe=2 (own cell +
    the angularly-nearest other cell), every anchor's EXACT top-1
    non-positive is recovered — deterministic by construction, no
    recall bound needed."""
    df, vecs, labels, base = _angled_corpus(spark)
    centroids = np.array([base["A"], base["B"], base["C"]])
    got = hard_negatives(
        df, k=1, label_col="lang", method="ivf",
        nprobe=2, centroids=centroids,
    ).collect()
    assert len(got) == 15
    for r in got:
        want = _np_hard_negs(vecs, labels, r.anchor_id, 1)[0]
        assert r.neg_id == want[0], (r.anchor_id, r.neg_id, want)
        assert r.cos_sim == pytest.approx(want[1], abs=1e-12)


def test_duplicate_vectors_tie_break_deterministically(spark):
    """Exact duplicate candidates tie at cos 1.0; rank order must be
    pinned by neg_id ascending on every run and layout."""
    rows = [
        (0, [1.0, 0.0], "q"),
        (1, [1.0, 0.0], "x"),
        (2, [1.0, 0.0], "x"),
        (3, [0.9, 0.1], "x"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, lang string"
    )
    got = (
        hard_negatives(df, k=3, label_col="lang", method="brute")
        .filter("anchor_id = 0")
        .orderBy("rank")
        .collect()
    )
    assert [r.neg_id for r in got] == [1, 2, 3]
    assert got[0].cos_sim == pytest.approx(1.0)


def test_anchor_subset(spark):
    df, vecs, labels = _cluster_corpus(spark)
    anchors = df.filter(F.col("vec_id") < 2)
    got = hard_negatives(
        df, k=2, label_col="lang", anchors=anchors, method="brute"
    )
    assert {r.anchor_id for r in got.collect()} == {0, 1}


def test_ivf_plan_joins_on_cell_never_cartesian(spark):
    """The scale contract: the IVF candidate generator is a cell
    equi-join — the physical plan must contain no cartesian/nested-
    loop product (the brute path is documented as eval-scale only)."""
    df, _, _ = _cluster_corpus(spark)
    plan = (
        hard_negatives(df, k=2, method="ivf", n_centroids=4, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_validation(spark):
    df, _, _ = _cluster_corpus(spark)
    with pytest.raises(ValueError, match="k must be"):
        hard_negatives(df, k=0)
    with pytest.raises(ValueError, match="method must be"):
        hard_negatives(df, method="annoy")
    with pytest.raises(ValueError, match="centroid_source"):
        hard_negatives(df, method="ivf", centroid_source="grid")


def test_gemm_kernel_matches_fold_exhaustive(spark):
    """hard_negatives_gemm at nprobe == n_centroids equals the
    oracle-exact fold path row-for-row on non-degenerate data:
    identical (anchor, rank, neg_id), cosines within 1e-12 (GEMM
    sums in a different order — the documented exactness trade)."""
    from utc_cuip_kafka_aws_connector_spark.operators.negatives import (
        hard_negatives_gemm,
    )

    df, _, _ = _cluster_corpus(spark)
    common = dict(
        k=4, id_col="vec_id", vec_col="embedding", label_col="lang",
        n_centroids=3, nprobe=3,
    )
    fold = hard_negatives(df, method="ivf", **common).collect()
    gemm = hard_negatives_gemm(df, **common).collect()
    fkey = {(r["anchor_id"], r["rank"]): r for r in fold}
    gkey = {(r["anchor_id"], r["rank"]): r for r in gemm}
    assert set(fkey) == set(gkey)
    for key, fr in fkey.items():
        gr = gkey[key]
        assert fr["neg_id"] == gr["neg_id"], key
        assert abs(fr["cos_sim"] - gr["cos_sim"]) < 1e-12, key


def test_gemm_kernel_matches_fold_partial_probe(spark):
    """Same candidate structure at a PARTIAL probe (the production
    setting): both kernels see exactly the probed cells, so they
    agree row-for-row there too."""
    from utc_cuip_kafka_aws_connector_spark.operators.negatives import (
        hard_negatives_gemm,
    )

    df, _, _ = _cluster_corpus(spark)
    common = dict(
        k=3, id_col="vec_id", vec_col="embedding",
        n_centroids=3, nprobe=1,
    )
    fold = sorted(
        (r["anchor_id"], r["rank"], r["neg_id"])
        for r in hard_negatives(df, method="ivf", **common).collect()
    )
    gemm = sorted(
        (r["anchor_id"], r["rank"], r["neg_id"])
        for r in hard_negatives_gemm(df, **common).collect()
    )
    assert fold == gemm


def test_gemm_null_label_law_matches_fold(spark):
    """eqNullSafe's law holds in the factorized GEMM mask: two
    null-labeled vectors ARE each other's positives (excluded), and
    a null-labeled candidate is excluded for no labeled anchor."""
    from utc_cuip_kafka_aws_connector_spark.operators.negatives import (
        hard_negatives_gemm,
    )

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], None),
            (1, [0.9, 0.1], None),
            (2, [0.8, 0.2], "A"),
        ],
        "vec_id long, embedding array<double>, lang string",
    )
    common = dict(
        k=3, id_col="vec_id", vec_col="embedding", label_col="lang",
        n_centroids=2, nprobe=2,
    )
    fold = sorted(
        (r["anchor_id"], r["neg_id"])
        for r in hard_negatives(df, method="ivf", **common).collect()
    )
    gemm = sorted(
        (r["anchor_id"], r["neg_id"])
        for r in hard_negatives_gemm(df, **common).collect()
    )
    assert fold == gemm
    # anchors 0/1 (null) exclude each other; both can take 2; anchor
    # 2 takes 0 and 1
    assert fold == [(0, 2), (1, 2), (2, 0), (2, 1)]


def test_gemm_anchor_subset_and_empty_cells(spark):
    """The anchors= subset path works and cells with no anchors (or
    no candidates) contribute nothing rather than crashing."""
    from pyspark.sql import functions as F

    from utc_cuip_kafka_aws_connector_spark.operators.negatives import (
        hard_negatives_gemm,
    )

    df, _, _ = _cluster_corpus(spark)
    out = hard_negatives_gemm(
        df,
        k=2,
        id_col="vec_id",
        vec_col="embedding",
        anchors=df.filter(F.col("vec_id") < 3),
        n_centroids=5,
        nprobe=1,
    ).collect()
    assert {r["anchor_id"] for r in out} <= {0, 1, 2}
    for r in out:
        assert r["neg_id"] != r["anchor_id"]


def test_ivf_plan_has_no_distinct_aggregate(spark):
    """VERDICT r18 #1 (fixed r19): the nprobe>1 IVF path used to
    distinct() its scored candidates, paying the gate's largest
    Exchange to dedup rows that are UNIQUE by construction (the
    corpus side is single-probed, so an (anchor, neg) pair shares at
    most one cell). Pin the fix: no aggregate node (distinct's
    signature) and exactly THREE shuffle Exchanges in the static plan
    — one per cell-join side (AQE turns the smaller into a broadcast
    at runtime) plus the rank window's — where the distinct used to
    add a fourth."""
    import re

    df, _, _ = _cluster_corpus(spark)
    plan = (
        hard_negatives(df, k=2, method="ivf", n_centroids=4, nprobe=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" not in plan and "SortAggregate" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 3


def test_ivf_multiprobe_pairs_unique_without_distinct(spark):
    """The semantics behind the no-op-distinct removal: even at
    nprobe > 1 each (anchor, neg) pair appears exactly once, because
    a corpus vector is assigned to exactly one cell."""
    df, _, _ = _cluster_corpus(spark)
    got = hard_negatives(
        df, k=15, method="ivf", n_centroids=4, nprobe=4
    ).collect()
    pairs = [(r.anchor_id, r.neg_id) for r in got]
    assert len(pairs) == len(set(pairs))


def test_gemm_boundary_tie_is_layout_independent(spark):
    """ADVICE r18: an exact cosine tie at the top-k boundary must be
    resolved by (sim desc, neg_id asc) — never by within-cell row
    order. Three exact-duplicate candidates tie at cos 1.0 with k=2:
    whichever physical layout the cell group arrives in, the two
    SMALLEST tied ids win."""
    from utc_cuip_kafka_aws_connector_spark.operators.negatives import (
        hard_negatives_gemm,
    )

    rows = [
        (0, [1.0, 0.0], "q"),
        (5, [1.0, 0.0], "x"),
        (3, [1.0, 0.0], "x"),
        (9, [1.0, 0.0], "x"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, lang string"
    )
    anchors = df.filter("vec_id = 0")
    outs = []
    for layout in (df, df.orderBy(F.desc("vec_id")), df.repartition(7)):
        got = (
            hard_negatives_gemm(
                df if layout is df else layout,
                k=2,
                label_col="lang",
                anchors=anchors,
                n_centroids=1,
                nprobe=1,
            )
            .orderBy("rank")
            .collect()
        )
        outs.append([(r.neg_id, r.rank) for r in got])
    assert outs[0] == [(3, 1), (5, 2)]
    assert outs[1] == outs[0] and outs[2] == outs[0]
