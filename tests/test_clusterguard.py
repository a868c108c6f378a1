"""operators/clusterguard.py: the oversized-cluster guard for cluster-
bucketed candidate generation (the semantic-dedup skew fix; wired
into semdedup.py in round 9 per the module's wiring plan).

The properties that matter at 100 TB: candidate cost stays bounded on
a degenerate distribution, geometric splits follow the embedding
geometry, connectivity survives every split, and the guard is a
no-op (identity) when nothing is oversized."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.clusterguard import recluster_oversized


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _assigned(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, centroid_id long")


def _components(edges, nodes):
    """Tiny union-find over the candidate graph the guard implies."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    return {find(n) for n in nodes}


def _implied_edges(refined_rows, stitch_rows):
    """Within-bucket complete graphs + stitch pairs = the candidate
    graph downstream transitive closure would see (before cosine
    verification, which passes for identical vectors)."""
    buckets: dict[str, list[int]] = {}
    for r in refined_rows:
        buckets.setdefault(r.centroid_id, []).append(r.vec_id)
    edges = [(m[0], x) for m in buckets.values() for x in m[1:]]
    edges += [(r.id_a, r.id_b) for r in stitch_rows]
    return edges


def test_idle_guard_is_identity(spark):
    df = _vecs(spark, [(i, [1.0, float(i % 3)]) for i in range(20)])
    assigned = _assigned(spark, [(i, i % 4) for i in range(20)])
    refined, stitches = recluster_oversized(df, assigned, cap=10)
    got = {(r.vec_id, r.centroid_id) for r in refined.collect()}
    assert got == {(i, str(i % 4)) for i in range(20)}
    assert stitches.count() == 0


def test_degenerate_identical_vectors_stay_bounded_and_connected(spark):
    """The SemDeDup failure mode: one cluster of 400 (near-)identical
    vectors. Geometric splitting cannot make progress, so the guard
    must salt — sizes bounded, quadratic candidate cost gone, and the
    whole cluster still ONE component via stitch representatives."""
    n, cap = 400, 50
    df = _vecs(spark, [(i, [1.0, 1.0, 1.0]) for i in range(n)])
    assigned = _assigned(spark, [(i, 0) for i in range(n)])
    refined, stitches = recluster_oversized(df, assigned, cap=cap)
    rows = refined.collect()
    assert len(rows) == n and len({r.vec_id for r in rows}) == n  # no row lost
    sizes = refined.groupBy("centroid_id").count().collect()
    assert max(r["count"] for r in sizes) <= 2 * cap
    # candidate cost: sum of size^2 must be near-linear, not n^2
    assert sum(r["count"] ** 2 for r in sizes) < n * 4 * cap
    edges = _implied_edges(rows, stitches.collect())
    assert len(_components(edges, set(range(n)))) == 1


def test_geometric_split_separates_real_blobs(spark):
    """Two well-separated blobs wrongly sharing one coarse cluster:
    the geometry-aware recursion must split along the blobs — no
    refined bucket mixes them — without needing the salt fallback."""
    blob_a = [(i, [1.0, 0.0, 0.0]) for i in range(0, 120, 2)]
    blob_b = [(i, [0.0, 1.0, 0.0]) for i in range(1, 120, 2)]
    df = _vecs(spark, blob_a + blob_b)
    assigned = _assigned(spark, [(i, 7) for i in range(120)])
    refined, _ = recluster_oversized(df, assigned, cap=70, n_split=4)
    for r in refined.groupBy("centroid_id").agg(
        F.collect_set(F.col("vec_id") % 2).alias("blobs")
    ).collect():
        assert len(r.blobs) == 1, f"bucket {r.centroid_id} mixes blobs"
        assert "#" not in r.centroid_id  # geometric, not salted


def test_split_keys_extend_parent_and_respect_cap_sum(spark):
    n, cap = 300, 40
    df = _vecs(spark, [(i, [float(i % 5), 1.0]) for i in range(n)])
    assigned = _assigned(spark, [(i, 3) for i in range(n)])
    refined, _ = recluster_oversized(df, assigned, cap=cap)
    rows = refined.collect()
    assert all(r.centroid_id.split("/")[0].split("#")[0] == "3" for r in rows)
    assert sum(1 for _ in rows) == n


def test_guard_is_deterministic(spark):
    df = _vecs(spark, [(i, [float(i % 7), float(i % 11), 1.0]) for i in range(200)])
    assigned = _assigned(spark, [(i, i % 2) for i in range(200)])
    a = recluster_oversized(df, assigned, cap=30)
    b = recluster_oversized(df, assigned, cap=30)
    assert sorted((r.vec_id, r.centroid_id) for r in a[0].collect()) == sorted(
        (r.vec_id, r.centroid_id) for r in b[0].collect()
    )
    assert sorted((r.id_a, r.id_b) for r in a[1].collect()) == sorted(
        (r.id_a, r.id_b) for r in b[1].collect()
    )


def test_cap_validation(spark):
    df = _vecs(spark, [(0, [1.0])])
    assigned = _assigned(spark, [(0, 0)])
    with pytest.raises(ValueError, match="cap"):
        recluster_oversized(df, assigned, cap=1)
