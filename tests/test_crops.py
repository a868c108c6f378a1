"""operators/crops.py: positive-pair generation (crop / ICT).

Evidence: full pure-Python differential (the md5 span arithmetic
replicated exactly — lengths, starts, slices, and the ICT remainder
all string-equal), determinism across repartitioning, length-bound
and eligibility properties over a random corpus, ICT invariants
(query tokens + positive tokens == document tokens as multisets,
positive never empty, tail positions reachable), seed independence,
and a zero-shuffle/zero-UDF plan pin.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest

from tests.plan_utils import formatted_plan
from utc_cuip_kafka_aws_connector_spark.operators.crops import (
    positive_pairs,
)

_SPACE = float(16**13)


def _u(doc_id, seed, leg):
    h = int(
        hashlib.md5(f"{doc_id}:{seed}:{leg}".encode()).hexdigest()[:13], 16
    )
    return h / _SPACE


def _py_span(doc_id, n, min_t, max_t, seed, leg, len_cap=None):
    hi = min(max_t, len_cap if len_cap is not None else n)
    length = min_t + math.floor(_u(doc_id, seed, leg + "len") * (hi - min_t + 1))
    start = 1 + math.floor(_u(doc_id, seed, leg + "start") * (n - length + 1))
    return start, length


def _py_pairs(rows, strategy, min_t, max_t, seed):
    out = {}
    for i, text in rows:
        if i is None or text is None:
            continue
        toks = [w for w in re.split(r"\s+", text) if w]
        n = len(toks)
        if n < (min_t + 1 if strategy == "ict" else min_t):
            continue
        if strategy == "crop":
            qs, ql = _py_span(i, n, min_t, max_t, seed, "q")
            ps, pl = _py_span(i, n, min_t, max_t, seed, "p")
            q = " ".join(toks[qs - 1 : qs - 1 + ql])
            p = " ".join(toks[ps - 1 : ps - 1 + pl])
        else:
            qs, ql = _py_span(i, n, min_t, max_t, seed, "q", len_cap=n - 1)
            q = " ".join(toks[qs - 1 : qs - 1 + ql])
            p = " ".join(toks[: qs - 1] + toks[qs - 1 + ql :])
        out[i] = (q, p)
    return out


def _corpus(seed=31, n=60):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        length = int(rng.integers(1, 30))
        rows.append((i, " ".join(f"w{i}_{j}" for j in range(length))))
    rows += [(None, "a b c d e"), (99, None)]
    return rows


@pytest.mark.parametrize("strategy", ["crop", "ict"])
def test_matches_python_reference(spark, strategy):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.query, r.positive)
        for r in positive_pairs(
            df, strategy=strategy, min_tokens=3, max_tokens=8, seed=5
        ).collect()
    }
    assert got == _py_pairs(rows, strategy, 3, 8, 5)
    assert len(got) > 10  # the fixture keeps plenty eligible


def test_ict_invariants_and_tail_reachable(spark):
    rows = [(i, " ".join(f"t{j}" for j in range(12))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = positive_pairs(
        df, strategy="ict", min_tokens=2, max_tokens=6, seed=1
    ).collect()
    assert len(got) == 300
    doc_toks = [f"t{j}" for j in range(12)]
    tail_hit = 0
    for r in got:
        q, p = r.query.split(" "), r.positive.split(" ")
        assert p, "ICT positive must never be empty"
        assert sorted(q + p) == sorted(doc_toks)  # exact partition
        if "t11" in q:
            tail_hit += 1
    # the last token must be reachable by the span (the len_cap fix)
    assert tail_hit > 0


def test_deterministic_across_partitioning_and_seed_sensitive(spark):
    rows = _corpus(seed=3)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        (r.doc_id, r.query, r.positive)
        for r in positive_pairs(df, seed=7).collect()
    )
    b = sorted(
        (r.doc_id, r.query, r.positive)
        for r in positive_pairs(df.repartition(13), seed=7).collect()
    )
    c = sorted(
        (r.doc_id, r.query, r.positive)
        for r in positive_pairs(df, seed=8).collect()
    )
    assert a == b
    assert a != c


def test_length_bounds_and_validation(spark):
    rows = _corpus(seed=9)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in positive_pairs(df, min_tokens=4, max_tokens=6).collect():
        for side in (r.query, r.positive):
            assert 4 <= len(side.split(" ")) <= 6
    with pytest.raises(ValueError, match="strategy"):
        positive_pairs(df, strategy="middle")
    with pytest.raises(ValueError, match="min_tokens"):
        positive_pairs(df, min_tokens=0)
    with pytest.raises(ValueError, match="max_tokens"):
        positive_pairs(df, min_tokens=5, max_tokens=4)


def test_plan_is_scan_local(spark):
    df = spark.createDataFrame(_corpus(), "doc_id long, text string")
    plan = formatted_plan(positive_pairs(df))
    for bad in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython",
                "Generate", "Window"):
        assert bad not in plan, f"{bad} in crop plan"
