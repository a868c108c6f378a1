"""operators/fim.py: fill-in-the-middle transformation.

Evidence: full pure-Python differential (apply/mode/cut md5 draws
and both PSM/SPM assemblies string-equal), reconstruction invariant
(stripping sentinels and reordering recovers the original text for
both formats), measured apply/SPM rates near their targets,
rate-0/rate-1 endpoints, partitioning determinism + seed
sensitivity, empty/NULL handling, validation, and a scan-local plan
pin.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from tests.plan_utils import formatted_plan
from utc_cuip_kafka_aws_connector_spark.operators.fim import fim_transform

_SPACE = float(16**13)


def _u(doc_id, seed, leg):
    return (
        int(hashlib.md5(f"{doc_id}:{seed}:{leg}".encode()).hexdigest()[:13], 16)
        / _SPACE
    )


def _py_fim(doc_id, text, rate, spm_rate, seed):
    n = len(text)
    applied = _u(doc_id, seed, "apply") < rate and n > 0
    if not applied:
        return text, False
    c1 = math.floor(_u(doc_id, seed, "cut1") * (n + 1))
    c2 = math.floor(_u(doc_id, seed, "cut2") * (n + 1))
    lo, hi = min(c1, c2), max(c1, c2)
    p, m, s = text[:lo], text[lo:hi], text[hi:]
    if _u(doc_id, seed, "mode") < spm_rate:
        return f"<fim_suffix>{s}<fim_prefix>{p}<fim_middle>{m}", True
    return f"<fim_prefix>{p}<fim_suffix>{s}<fim_middle>{m}", True


def _corpus(seed=47, n=200):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        length = int(rng.integers(0, 40))
        rows.append((i, "".join(chr(97 + int(c)) for c in rng.integers(0, 26, length))))
    return rows + [(None, "abc"), (999, None)]


def test_matches_python_reference(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.fim_applied)
        for r in fim_transform(df, rate=0.6, spm_rate=0.4, seed=3).collect()
    }
    want = {
        i: _py_fim(i, t, 0.6, 0.4, 3)
        for i, t in rows
        if i is not None and t is not None
    }
    assert got == want
    applied = sum(1 for _, a in got.values() if a)
    assert 0.4 < applied / len(got) < 0.8  # near the 0.6 target


def test_reconstruction_both_formats(spark):
    rows = [(i, f"line{i};" * 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = fim_transform(df, rate=1.0, spm_rate=0.5, seed=1).collect()
    saw_spm = saw_psm = False
    for r in got:
        assert r.fim_applied
        t = r.text
        if t.startswith("<fim_suffix>"):
            saw_spm = True
            s, rest = t[len("<fim_suffix>"):].split("<fim_prefix>", 1)
            p, m = rest.split("<fim_middle>", 1)
        else:
            saw_psm = True
            p, rest = t[len("<fim_prefix>"):].split("<fim_suffix>", 1)
            s, m = rest.split("<fim_middle>", 1)
        assert p + m + s == dict(rows)[r.doc_id]
    assert saw_spm and saw_psm


def test_rate_endpoints_and_empty(spark):
    rows = [(i, f"doc {i}") for i in range(30)] + [(100, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    off = fim_transform(df, rate=0.0).collect()
    assert all(not r.fim_applied for r in off)
    assert {r.doc_id: r.text for r in off} == dict(rows)
    on = {r.doc_id: r for r in fim_transform(df, rate=1.0).collect()}
    assert all(r.fim_applied for i, r in on.items() if i != 100)
    assert not on[100].fim_applied and on[100].text == ""  # nothing to cut


def test_deterministic_and_seed_sensitive(spark):
    rows = _corpus(seed=11, n=80)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted((r.doc_id, r.text) for r in fim_transform(df, seed=4).collect())
    b = sorted(
        (r.doc_id, r.text)
        for r in fim_transform(df.repartition(9), seed=4).collect()
    )
    c = sorted((r.doc_id, r.text) for r in fim_transform(df, seed=5).collect())
    assert a == b and a != c


def test_validation_and_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="rate"):
        fim_transform(df, rate=1.5)
    with pytest.raises(ValueError, match="spm_rate"):
        fim_transform(df, spm_rate=-0.1)
    plan = formatted_plan(fim_transform(df))
    for bad in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython",
                "Generate", "Window"):
        assert bad not in plan, f"{bad} in fim plan"
