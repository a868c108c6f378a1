"""operators/pagerank.py: link authority, differential-tested."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.pagerank import (
    domain_authority,
    pagerank,
)


def reference_pagerank(edges, damping=0.85, tol=1e-6, max_iter=40):
    """Pure-Python synchronous PageRank with uniform dangling
    redistribution — the same recurrence, the ground truth."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out: dict = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(max_iter):
        dangling = sum(r for v, r in rank.items() if v not in out)
        new = {v: (1 - damping) / n + damping * dangling / n for v in nodes}
        for u, vs in out.items():
            share = rank[u] / len(vs)
            for v in vs:
                new[v] += damping * share
        delta = sum(abs(new[v] - rank[v]) for v in nodes)
        rank = new
        if delta < tol:
            return rank
    raise RuntimeError("reference did not converge")


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_differential_on_classic_graph(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"),  # d is upstream-only; e dangles
        ("c", "e"),
    ]
    got = _run(spark, edges)
    want = reference_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0)
    assert got["c"] == max(got.values())  # the hub wins


@pytest.mark.parametrize("seed", [3, 4])
def test_differential_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(25)]
    edges = list(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(80)
        }
    )
    edges = [(u, v) for u, v in edges if u != v]
    got = _run(spark, edges)
    want = reference_pagerank(edges)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_duplicate_edges_count_once(spark):
    once = _run(spark, [("a", "b"), ("b", "a")])
    dup = _run(spark, [("a", "b"), ("a", "b"), ("b", "a")])
    assert once == dup


def test_unconverged_raises(spark):
    # asymmetric graph: the uniform start is NOT stationary
    df = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a")], "src string, dst string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        pagerank(df, max_iter=1, tol=1e-12)


def test_domain_authority_collapses_to_domains(spark):
    edges = [
        (f"https://blog{i}.example.org/post", "https://big-hub.com/page")
        for i in range(5)
    ] + [
        ("https://big-hub.com/about", "https://one.net/x"),
        ("https://one.net/y", "https://big-hub.com/home"),  # no dangling sink
        ("https://a.big-hub.com/internal", "https://big-hub.com/page"),  # self
    ]
    df = spark.createDataFrame(edges, "src_url string, dst_url string")
    # the 2-cycle between the hubs contracts at damping^k: give it
    # the iterations 1e-6 needs (0.85^120 ~ 3e-9)
    ranks = {r.domain: r.rank for r in domain_authority(df, max_iter=120).collect()}
    assert "big-hub.com" in ranks and ranks["big-hub.com"] == max(ranks.values())
    assert all(not d.startswith("https://") for d in ranks)


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.5)


def test_reliable_checkpoint_dir_matches_local(spark, tmp_path):
    """checkpoint_dir= (r9-r11 briefs): iteration state goes to
    reliable storage — the path actually receives checkpoint data —
    and the ranks are bit-identical to the localCheckpoint default
    (same synchronous iterations, only the truncation store moves)."""
    import os

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    local = {r.node: r.rank for r in pagerank(df).collect()}
    ckdir = str(tmp_path / "pr_ckpt")
    reliable = {
        r.node: r.rank for r in pagerank(df, checkpoint_dir=ckdir).collect()
    }
    assert reliable == local
    walked = [
        os.path.join(root, f)
        for root, _, files in os.walk(ckdir)
        for f in files
    ]
    assert walked, "no checkpoint data written to checkpoint_dir"
