"""operators/corruption.py: T5-style span corruption.

Evidence: full pure-Python differential (block geometry, md5 span
draws, sentinel numbering, and the T5 target terminator all
string-equal), reconstruction invariant (splicing each target span
back over its sentinel recovers the document exactly), measured
corruption rate near the requested rate over a sizable corpus,
partitioning determinism + seed sensitivity, short-doc drop,
validation, and a scan-local plan pin.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest

from tests.plan_utils import formatted_plan
from utc_cuip_kafka_aws_connector_spark.operators.corruption import (
    span_corruption,
)

_SPACE = float(16**13)


def _u(doc_id, seed, leg, block):
    h = int(
        hashlib.md5(f"{doc_id}:{seed}:{leg}:{block}".encode()).hexdigest()[
            :13
        ],
        16,
    )
    return h / _SPACE


def _py_example(doc_id, text, rate, mean_span, seed):
    toks = [w for w in re.split(r"\s+", text or "") if w]
    n = len(toks)
    if n <= mean_span:
        return None
    B = max(int(round(mean_span / rate)), mean_span + 1)
    n_blocks = math.ceil(n / B)
    inp, tgt = [], []
    for b in range(n_blocks):
        blk = toks[b * B : min((b + 1) * B, n)]
        span_len = min(
            1 + math.floor(_u(doc_id, seed, "len", b) * (2 * mean_span - 1)),
            len(blk),
        )
        off = math.floor(
            _u(doc_id, seed, "start", b) * (len(blk) - span_len + 1)
        )
        inp += blk[:off] + [f"<extra_id_{b}>"] + blk[off + span_len :]
        tgt += [f"<extra_id_{b}>"] + blk[off : off + span_len]
    tgt.append(f"<extra_id_{n_blocks}>")
    return " ".join(inp), " ".join(tgt)


def _corpus(seed=41, n=40):
    rng = np.random.default_rng(seed)
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(int(rng.integers(1, 80)))))
        for i in range(n)
    ]
    return rows + [(None, "a b c d"), (99, None)]


def test_matches_python_reference(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.inputs, r.targets)
        for r in span_corruption(
            df, corruption_rate=0.15, mean_span=3, seed=7
        ).collect()
    }
    want = {
        i: ex
        for i, t in rows
        if i is not None and t is not None
        for ex in [_py_example(i, t, 0.15, 3, 7)]
        if ex is not None
    }
    assert got == want
    assert len(got) > 20


def test_reconstruction_invariant_and_rate(spark):
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(120))) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = span_corruption(df, corruption_rate=0.15, mean_span=3).collect()
    masked_total, tok_total = 0, 0
    for r in got:
        doc = dict(rows)[r.doc_id].split(" ")
        # parse targets: sentinel k -> its hidden tokens
        spans = {}
        cur = None
        for w in r.targets.split(" "):
            m = re.fullmatch(r"<extra_id_(\d+)>", w)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                spans[cur].append(w)
        assert spans.pop(max(spans)) == []  # the terminator hides nothing
        rebuilt = []
        for w in r.inputs.split(" "):
            m = re.fullmatch(r"<extra_id_(\d+)>", w)
            rebuilt += spans[int(m.group(1))] if m else [w]
        assert rebuilt == doc
        masked_total += sum(len(v) for v in spans.values())
        tok_total += len(doc)
    rate = masked_total / tok_total
    assert 0.10 < rate < 0.20  # around the requested 0.15


def test_deterministic_and_seed_sensitive(spark):
    rows = _corpus(seed=5)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        (r.doc_id, r.inputs) for r in span_corruption(df, seed=1).collect()
    )
    b = sorted(
        (r.doc_id, r.inputs)
        for r in span_corruption(df.repartition(11), seed=1).collect()
    )
    c = sorted(
        (r.doc_id, r.inputs) for r in span_corruption(df, seed=2).collect()
    )
    assert a == b and a != c


def test_short_docs_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e f g h")], "doc_id long, text string"
    )
    got = span_corruption(df, mean_span=3).collect()
    assert [r.doc_id for r in got] == [2]  # 3 tokens <= mean_span: dropped
    with pytest.raises(ValueError, match="corruption_rate"):
        span_corruption(df, corruption_rate=0.0)
    with pytest.raises(ValueError, match="mean_span"):
        span_corruption(df, mean_span=0)
    with pytest.raises(ValueError, match="sentinel"):
        span_corruption(df, sentinel="<mask>")


def test_plan_is_scan_local(spark):
    df = spark.createDataFrame(_corpus(), "doc_id long, text string")
    plan = formatted_plan(span_corruption(df))
    for bad in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython",
                "Generate", "Window"):
        assert bad not in plan, f"{bad} in corruption plan"
