"""operators/perturb.py: deterministic typo perturbation.

Evidence: full pure-Python differential (apply/op/position draws and
all three edit surgeries string-equal), edit-distance invariant
(every edited word is within edit distance 2 of its original —
swap = 2 substitutions, drop/double = 1 indel), measured edit rate
near target, rate endpoints, short-word immunity, determinism + seed
sensitivity, NULL pass-through, n_edits accounting, and a scan-local
plan pin. Plus the dedup-eval composition: a perturbed copy at 10%
word noise still lands >= 0.3 shingle-Jaccard to its original (unrelated docs sit at ~0) —
planted near-dup ground truth the MinHash tier can recover.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest

from tests.plan_utils import formatted_plan
from utc_cuip_kafka_aws_connector_spark.operators.perturb import (
    perturb_text,
)

_SPACE = float(16**13)


def _u(doc_id, seed, leg, k):
    return (
        int(
            hashlib.md5(f"{doc_id}:{seed}:{leg}:{k}".encode()).hexdigest()[:13],
            16,
        )
        / _SPACE
    )


def _py_edit(doc_id, w, k, rate, seed):
    n = len(w)
    if not (_u(doc_id, seed, "apply", k) < rate and n >= 2):
        return w
    op = math.floor(_u(doc_id, seed, "op", k) * 3)
    if op == 0:
        p = 1 + math.floor(_u(doc_id, seed, "pos", k) * (n - 1))
        return w[: p - 1] + w[p] + w[p - 1] + w[p + 1 :]
    p = 1 + math.floor(_u(doc_id, seed, "pos", k) * n)
    if op == 1:
        return w[: p - 1] + w[p:]
    return w[:p] + w[p - 1] + w[p:]


def _py_perturb(doc_id, text, rate, seed):
    if text is None or doc_id is None:
        return text, 0
    words = [w for w in re.split(r"\s+", text) if w]
    out = [_py_edit(doc_id, w, k, rate, seed) for k, w in enumerate(words)]
    return " ".join(out), sum(1 for a, b in zip(words, out) if a != b)


def _corpus(seed=53, n=80):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        words = [
            "".join(chr(97 + c) for c in rng.integers(0, 26, rng.integers(1, 9)))
            for _ in range(int(rng.integers(1, 15)))
        ]
        rows.append((i, " ".join(words)))
    return rows + [(None, "abc def"), (99, None)]


def test_matches_python_reference(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_edits)
        for r in perturb_text(df, rate=0.3, seed=5).collect()
    }
    for i, t in rows:
        if i is None:
            continue
        assert got[i] == _py_perturb(i, t, 0.3, 5), i
    assert sum(e for _, e in got.values()) > 0


def test_edit_distance_and_rate(spark):
    rows = [(i, " ".join(f"word{j}xyz" for j in range(30))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = perturb_text(df, rate=0.15, seed=1).collect()
    edited = total = 0
    for r in got:
        orig = dict(rows)[r.doc_id].split(" ")
        new = r.text.split(" ")
        assert len(orig) == len(new)
        for a, b in zip(orig, new):
            total += 1
            if a != b:
                edited += 1
                assert abs(len(a) - len(b)) <= 1  # one indel max
                assert sorted(a) == sorted(b) or abs(len(a) - len(b)) == 1
        assert r.n_edits == sum(1 for a, b in zip(orig, new) if a != b)
    assert 0.10 < edited / total < 0.20  # near the requested 0.15


def test_endpoints_short_words_and_nulls(spark):
    rows = [(1, "a b c"), (2, "hello world"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    off = {r.doc_id: (r.text, r.n_edits) for r in perturb_text(df, rate=0.0).collect()}
    assert off[1] == ("a b c", 0) and off[2] == ("hello world", 0)
    assert off[3] == (None, 0)
    on = {r.doc_id: r for r in perturb_text(df, rate=1.0).collect()}
    assert on[1].text == "a b c" and on[1].n_edits == 0  # all too short
    assert on[2].n_edits == 2
    with pytest.raises(ValueError, match="rate"):
        perturb_text(df, rate=1.5)


def test_deterministic_seed_sensitive_and_plan(spark):
    rows = _corpus(seed=9, n=40)
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def key(r):  # NULL-id passthrough rows sort under a sentinel
        return (r.doc_id if r.doc_id is not None else -1, r.text or "")

    a = sorted(key(r) for r in perturb_text(df, seed=3).collect())
    b = sorted(
        key(r) for r in perturb_text(df.repartition(7), seed=3).collect()
    )
    c = sorted(key(r) for r in perturb_text(df, seed=4).collect())
    assert a == b and a != c
    plan = formatted_plan(perturb_text(df, out_col="noisy"))
    for bad in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython",
                "Generate", "Window"):
        assert bad not in plan, f"{bad} in perturb plan"


def test_planted_near_dup_ground_truth(spark):
    """The dedup-eval composition: a 10%-noise copy stays a strong
    shingle-Jaccard neighbor of its original."""
    rows = [(i, " ".join(f"tok{i}_{j}" for j in range(60))) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    noisy = {
        r.doc_id: r.text
        for r in perturb_text(df, rate=0.1, seed=2).collect()
    }

    def shingles(t, k=3):
        w = t.split(" ")
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    for i, t in rows:
        a, b = shingles(t), shingles(noisy[i])
        j = len(a & b) / len(a | b)
        # each edited word kills up to k=3 shingles: at 10% noise the
        # expected survivor share is ~ (1-3*0.1); unrelated docs sit
        # at ~0, so 0.3 is a wide near-dup/non-dup separation
        assert j >= 0.3, (i, j)
