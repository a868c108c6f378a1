"""BM25 retrieval (operators/retrieval.py).

The oracle-parity test (q114) proves cross-engine agreement on the
fixture corpus; here a hand-sized corpus is scored against an
independent pure-Python BM25 with the same formula, pinning the
actual VALUES (parity alone would accept a consistently-wrong
formula on both sides), plus the edge semantics: unseen query terms,
the k cap, and doc_id tie-breaking.
"""

from __future__ import annotations

import math

import pytest

from utc_cuip_kafka_aws_connector_spark.operators.retrieval import bm25_topk

DOCS = [
    (0, "spark joins tables fast"),
    (1, "spark spark spark streaming"),
    (2, "tables of data and data"),
    (3, "joins and tables and joins and tables"),
    (4, "unrelated words entirely different"),
]


def _py_bm25(docs, query_terms, k1=1.5, b=0.75):
    """Independent reference: same log-free-idf formula, term-sorted
    summation, computed with plain Python floats."""
    toks = {d: t.split() for d, t in docs}
    n = float(len(docs))
    avgdl = sum(len(t) for t in toks.values()) / len(docs)
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    scores = {}
    for d, t in toks.items():
        s = 0.0
        terms = [q for q in sorted(set(query_terms)) if q in t]
        for q in terms:
            tf = t.count(q)
            idf = (n - df[q] + 0.5) / (df[q] + 0.5)
            tf_part = (tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * len(t) / avgdl))
            s += idf * tf_part
        if terms:
            scores[d] = s
    return scores


def test_scores_match_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [("q", "spark tables")], "query_id string, query string"
    )
    got = {
        r.doc_id: r.score for r in bm25_topk(docs, queries, k=10).collect()
    }
    want = _py_bm25(DOCS, ["spark", "tables"])
    assert set(got) == set(want)
    for d in want:
        # bit-exact: same IEEE op tree and summation order.
        assert got[d] == want[d], (d, got[d], want[d])
    # doc 4 matches no query term: not scored at all.
    assert 4 not in got


def test_ranking_and_k_cap(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [("q", "spark tables")], "query_id string, query string"
    )
    rows = bm25_topk(docs, queries, k=2).orderBy("rnk").collect()
    assert len(rows) == 2
    assert [r.rnk for r in rows] == [1, 2]
    assert rows[0].score >= rows[1].score
    want = _py_bm25(DOCS, ["spark", "tables"])
    best = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r.doc_id, r.score) for r in rows] == best


def test_unseen_terms_and_duplicate_query_words(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        # 'zebra' appears nowhere; duplicated 'spark' must count once.
        [("q", "zebra spark spark")],
        "query_id string, query string",
    )
    got = {r.doc_id: r.score for r in bm25_topk(docs, queries, k=10).collect()}
    want = _py_bm25(DOCS, ["spark"])
    assert got == want


def test_tie_break_is_doc_id(spark):
    # Two docs with identical token multisets score identically; the
    # lower doc_id must take the better rank deterministically.
    docs = spark.createDataFrame(
        [(10, "alpha beta"), (7, "alpha beta"), (3, "gamma delta")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [("q", "alpha")], "query_id string, query string"
    )
    rows = bm25_topk(docs, queries, k=10).orderBy("rnk").collect()
    assert [r.doc_id for r in rows] == [7, 10]
    assert rows[0].score == rows[1].score
    assert math.isfinite(rows[0].score)


def test_score_monotonicity_properties(spark):
    """Ranking sanity of the scoring formula: (a) with identical
    lengths and df, higher tf ranks higher; (b) a term present in
    fewer documents contributes more than one present in many
    (idf monotone decreasing in df)."""
    # (a) same dl, same df, different tf
    docs = spark.createDataFrame(
        [(0, "cat dog dog dog"), (1, "cat dog fox owl"), (2, "pad pad pad pad")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([("q", "dog")], "query_id string, query string")
    rows = {r.doc_id: r.score for r in bm25_topk(docs, q).collect()}
    assert rows[0] > rows[1]
    # (b) rare vs common term, same tf and dl everywhere
    docs2 = spark.createDataFrame(
        [(0, "rare pad"), (1, "common pad"), (2, "common pad")],
        "doc_id long, text string",
    )
    q2 = spark.createDataFrame(
        [("r", "rare"), ("c", "common")], "query_id string, query string"
    )
    got = {
        (r.query_id, r.doc_id): r.score for r in bm25_topk(docs2, q2).collect()
    }
    assert got[("r", 0)] > got[("c", 1)]
