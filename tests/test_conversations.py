"""operators/conversations.py: chat/SFT dataset ops.

Evidence: a pure-Python differential over a randomized turn-list
fixture for flags, rendering, stats, fingerprints, and budget
truncation (every rule and edge — NULL arrays, NULL roles/contents,
misplaced system turns, ties — is planted in the fixture), dedup
determinism, whitespace-insensitivity vs turn-boundary-sensitivity of
the fingerprint, the truncation prefix property, and a physical-plan
check that the whole tier stays UDF-free codegen with no explode.
"""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.plan_utils import formatted_plan
from utc_cuip_kafka_aws_connector_spark.operators.conversations import (
    conversation_fingerprint,
    conversation_flags,
    conversation_stats,
    dedup_conversations,
    render_chat,
    truncate_to_budget,
)

SCHEMA = (
    "conv_id long, turns array<struct<role:string,content:string>>"
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps"]


def _random_convs(seed=29, n=40):
    """Mostly-valid conversations with planted defects of every kind."""
    rng = np.random.default_rng(seed)
    rows = []
    for cid in range(n):
        kind = cid % 8
        if kind == 7:
            rows.append((cid, None if cid % 16 == 7 else []))
            continue
        n_ex = int(rng.integers(1, 4))
        turns = []
        if rng.random() < 0.5:
            turns.append(("system", "be  helpful"))
        for _ in range(n_ex):
            turns.append(("user", " ".join(rng.choice(WORDS, 3))))
            turns.append(("assistant", " ".join(rng.choice(WORDS, 5))))
        if kind == 1:
            turns.append(("user", "dangling question"))  # last != assistant
        elif kind == 2:
            turns.insert(len(turns), ("system", "late system"))
        elif kind == 3:
            turns.append(("assistant", "double"))  # broken alternation
        elif kind == 4:
            turns[rng.integers(0, len(turns))] = ("tool", "unknown role")
        elif kind == 5:
            turns[rng.integers(0, len(turns))] = ("user", "   ")
        elif kind == 6 and turns[0][0] == "system":
            turns[1] = ("assistant", "answer first")  # first body != user
        rows.append((cid, turns))
    return rows


def _py_flags(turns):
    t = turns or []
    empty = len(t) == 0
    roles = ("system", "user", "assistant")
    unknown = any(r not in roles for r, _ in t)
    blank = any(c is None or c.strip() == "" for _, c in t)
    sys_mis = any(r == "system" for r, _ in t[1:])
    body = [(r, c) for r, c in t if r != "system"]
    broken = any(a[0] == b[0] for a, b in zip(body, body[1:]))
    first_nu = bool(body) and body[0][0] != "user"
    last_na = bool(t) and t[-1][0] != "assistant"
    f = {
        "cv_empty": empty,
        "cv_unknown_role": not empty and unknown,
        "cv_empty_content": not empty and blank,
        "cv_system_misplaced": not empty and sys_mis,
        "cv_broken_alternation": not empty and broken,
        "cv_first_not_user": not empty and first_nu,
        "cv_last_not_assistant": not empty and last_na,
    }
    f["cv_valid"] = not any(f.values())
    return f


def test_flags_match_python_reference(spark):
    rows = _random_convs()
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.conv_id: r.asDict() for r in conversation_flags(df).collect()}
    for cid, turns in rows:
        want = _py_flags(turns)
        have = {k: got[cid][k] for k in want}
        assert have == want, f"conv {cid}: {have} != {want} ({turns})"
    # the fixture plants at least one of every defect
    for flag in _py_flags([]):
        assert any(r[flag] for r in got.values()), f"fixture never set {flag}"


def test_render_matches_python_reference(spark):
    rows = _random_convs(seed=31)
    df = spark.createDataFrame(rows, SCHEMA)
    chatml = {r.conv_id: r.text for r in render_chat(df).collect()}
    plain = {
        r.conv_id: r.text
        for r in render_chat(df, template="plain").collect()
    }
    for cid, turns in rows:
        t = turns or []
        want_c = "".join(
            f"<|im_start|>{r}\n{c or ''}<|im_end|>\n" for r, c in t
        )
        want_p = "\n\n".join(f"{r}: {c or ''}" for r, c in t)
        assert chatml[cid] == want_c
        assert plain[cid] == want_p
    with pytest.raises(ValueError, match="template"):
        render_chat(df, template="markdown")


def test_stats_match_python_reference(spark):
    rows = _random_convs(seed=37)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.conv_id: r for r in conversation_stats(df).collect()}
    for cid, turns in rows:
        t = turns or []
        r = got[cid]
        assert r.n_turns == len(t)
        assert r.n_user == sum(1 for x in t if x[0] == "user")
        assert r.n_assistant == sum(1 for x in t if x[0] == "assistant")
        assert r.total_chars == sum(len(c or "") for _, c in t)
        assert r.assistant_chars == sum(
            len(c or "") for ro, c in t if ro == "assistant"
        )
        assert r.ws_tokens == sum(
            len(re.split(r"\s+", c.strip())) if c and c.strip() else 0
            for _, c in t
        )


def test_fingerprint_whitespace_invariant_turn_sensitive(spark):
    df = spark.createDataFrame(
        [
            (1, [("user", "Hello  world"), ("assistant", "hi")]),
            (2, [("user", " hello world "), ("assistant", "HI")]),  # == 1
            (3, [("user", "hello world hi"), ("assistant", "")]),  # resplit
            (4, [("assistant", "hello world"), ("user", "hi")]),  # reorder
        ],
        SCHEMA,
    )
    fp = {
        r.conv_id: (r.conv_fp, r.lu_fp)
        for r in conversation_fingerprint(
            df, last_user_col="lu_fp"
        ).collect()
    }
    assert fp[1][0] == fp[2][0]
    assert len({fp[1][0], fp[3][0], fp[4][0]}) == 3
    assert fp[1][1] == fp[2][1] and fp[1][1] != fp[3][1]
    # no user turn -> NULL last-user fingerprint
    df2 = spark.createDataFrame([(9, [("assistant", "x")])], SCHEMA)
    [r] = conversation_fingerprint(df2, last_user_col="lu_fp").collect()
    assert r.lu_fp is None


def test_dedup_keeps_smallest_id(spark):
    dup = [("user", "q"), ("assistant", "a")]
    df = spark.createDataFrame(
        [(3, dup), (1, dup), (2, [("user", "other"), ("assistant", "a")])],
        SCHEMA,
    )
    kept = sorted(r.conv_id for r in dedup_conversations(df, "conv_id").collect())
    assert kept == [1, 2]


def test_truncate_prefix_property(spark):
    rows = _random_convs(seed=41)
    df = spark.createDataFrame(rows, SCHEMA)
    for budget in (0, 3, 7, 10**6):
        got = {
            r.conv_id: r.kept
            for r in truncate_to_budget(
                df, budget, out_col="kept"
            ).collect()
        }
        for cid, turns in rows:
            t = turns or []
            counts = [
                len(re.split(r"\s+", c.strip())) if c and c.strip() else 0
                for _, c in t
            ]
            keep, cum = 0, 0
            for c in counts:
                if cum + c > budget:
                    break
                cum += c
                keep += 1
            assert [tuple(x) for x in got[cid]] == t[:keep], (
                f"conv {cid} budget {budget}"
            )
    with pytest.raises(ValueError, match="max_tokens"):
        truncate_to_budget(df, -1)


def test_plan_is_udf_free_no_explode(spark):
    rows = _random_convs(seed=43)
    df = spark.createDataFrame(rows, SCHEMA)
    out = truncate_to_budget(
        conversation_stats(
            conversation_fingerprint(render_chat(conversation_flags(df)))
        ),
        64,
    )
    plan = formatted_plan(out)
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Generate", "Exchange"):
        assert bad not in plan, f"{bad} in conversation-tier plan"
