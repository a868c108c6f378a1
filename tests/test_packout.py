"""Packed-example materialization (operators/packout.py): exact
window geometry, losslessness, boundary offsets, EOS budgeting,
truncation flagging, single-Python-stage plan.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.packout import (
    pack_token_ids,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, token_ids array<int>"
    )


def test_exact_geometry_and_padding(spark):
    # one shard (hex_chars handled below by forcing one group via
    # budget behavior); sizes 3+4 fit an 8-window, 2 starts the next
    rows = [
        (1, [11, 12, 13]),
        (2, [21, 22, 23, 24]),
        (3, [31, 32]),
    ]
    out = pack_token_ids(
        _df(spark, rows), context_len=8, pad_id=0, hex_chars=0
    ).orderBy("seq_id").collect()
    assert [r["n_docs"] for r in out] == [2, 1]
    for r in out:
        assert len(r["input_ids"]) == 8
    first, second = out
    assert first["input_ids"] == [11, 12, 13, 21, 22, 23, 24, 0]
    assert first["doc_starts"] == [0, 3]
    assert first["n_tokens"] == 7
    assert not first["truncated"]
    assert second["input_ids"] == [31, 32, 0, 0, 0, 0, 0, 0]
    assert second["doc_starts"] == [0]


def test_eos_counts_against_the_budget(spark):
    rows = [(1, [1, 2, 3]), (2, [4, 5, 6, 7])]
    out = pack_token_ids(
        _df(spark, rows), context_len=8, pad_id=0, eos_id=99,
        hex_chars=0,
    ).orderBy("seq_id").collect()
    # 3+1 EOS = 4, 4+1 = 5: together 9 > 8 -> two sequences
    assert [r["n_docs"] for r in out] == [1, 1]
    assert out[0]["input_ids"] == [1, 2, 3, 99, 0, 0, 0, 0]
    assert out[1]["input_ids"] == [4, 5, 6, 7, 99, 0, 0, 0]


def test_oversized_doc_truncates_loudly(spark):
    rows = [(1, list(range(100, 111))), (2, [1, 2])]
    out = {
        r["seq_id"]: r
        for r in pack_token_ids(
            _df(spark, rows), context_len=8, pad_id=0, hex_chars=0
        ).collect()
    }
    big = [r for r in out.values() if r["truncated"]]
    small = [r for r in out.values() if not r["truncated"]]
    assert len(big) == 1 and len(small) == 1
    assert big[0]["input_ids"] == list(range(100, 108))
    assert big[0]["n_tokens"] == 8
    assert big[0]["doc_starts"] == [0]
    assert small[0]["input_ids"][:2] == [1, 2]


def test_lossless_over_random_corpus(spark):
    """Every non-truncated token appears exactly once across packed
    rows, in id order within each shard."""
    rng = random.Random(9)
    rows = [
        (i, [i * 1000 + j for j in range(rng.randrange(1, 12))])
        for i in range(80)
    ]
    df = _df(spark, rows)
    out = pack_token_ids(df, context_len=32, pad_id=-1).collect()
    assert all(len(r["input_ids"]) == 32 for r in out)
    assert not any(r["truncated"] for r in out)
    got = sorted(
        t
        for r in out
        for t in r["input_ids"][: r["n_tokens"]]
    )
    want = sorted(t for _, ids in rows for t in ids)
    assert got == want
    # boundary count matches doc count on every row
    assert all(len(r["doc_starts"]) == r["n_docs"] for r in out)
    # layout independence: a repartitioned input packs identically
    out2 = pack_token_ids(
        df.repartition(7), context_len=32, pad_id=-1
    ).collect()
    key = lambda rs: sorted(
        (r["shard"], r["seq_id"], tuple(r["input_ids"])) for r in rs
    )
    assert key(out2) == key(out)


def test_single_python_stage_plan(spark):
    df = _df(spark, [(1, [1, 2]), (2, [3])])
    plan = (
        pack_token_ids(df, context_len=4, pad_id=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FlatMapGroupsInPandas") == 1  # the q87 assigner
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_validation(spark):
    with pytest.raises(ValueError, match="context_len"):
        pack_token_ids(_df(spark, [(1, [1])]), context_len=0, pad_id=0)


def test_doc_starts_always_inside_window(spark):
    """ADVICE r12: every doc_starts offset must be < context_len so a
    trainer resetting attention at boundaries can never index outside
    input_ids. With the current first-fit packer an oversized doc
    always packs alone (start 0), so this pins the invariant the
    filter makes locally provable — for any packer."""
    rng = random.Random(3)
    rows = [
        (i, [i * 100 + j for j in range(rng.choice([1, 2, 5, 9, 15]))])
        for i in range(60)
    ]
    out = pack_token_ids(
        _df(spark, rows), context_len=8, pad_id=0, eos_id=99
    ).collect()
    assert any(r["truncated"] for r in out)  # fixture exercises both
    for r in out:
        assert all(0 <= s < 8 for s in r["doc_starts"]), r
        if not r["truncated"]:
            assert len(r["doc_starts"]) == r["n_docs"]
