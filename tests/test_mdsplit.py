"""operators/mdsplit.py: markdown code-fence separation.

Evidence: pure-Python re differential over a fixture exercising every
grammar case (multiple blocks, info strings, missing info string,
unclosed fence passes through, inline triple-backtick NOT at line
start ignored, empty body), prose/blocks/ratio consistency,
explode keying, NULL/empty handling, and a scan-local plan pin for
the split (the explode is the one deliberate Generate).
"""

from __future__ import annotations

import re

import pytest

from tests.plan_utils import formatted_plan
from utc_cuip_kafka_aws_connector_spark.operators.mdsplit import (
    explode_code_blocks,
    split_code_fences,
)

_PY_FENCE = re.compile(
    r"(?sm)^```([^\n`]*)\n(.*?)\n```[ \t]*$"
)


def _py_split(text):
    if text is None:
        return None, [], 0.0
    blocks = [
        (m.group(1).strip().lower(), m.group(2))
        for m in _PY_FENCE.finditer(text)
    ]
    prose = _PY_FENCE.sub("", text).strip()
    code_chars = sum(len(c) for _, c in blocks)
    ratio = code_chars / len(text) if text else 0.0
    return prose, blocks, ratio


FIXTURE = [
    (0, "intro\n```python\nx = 1\ny = 2\n```\noutro"),
    (1, "a\n```\nplain block\n```\nb\n``` Rust \nfn main() {}\n```\nc"),
    (2, "no fences at all"),
    (3, "before\n```python\nunclosed..."),  # stays prose
    (4, "inline ``` not at line start ``` stays"),
    (5, "```js\n\n```\ntail"),  # empty body
    (6, ""),
    (7, None),
]


def test_matches_python_reference(spark):
    df = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    got = {
        r.doc_id: (r.prose, [(b.lang, b.code) for b in r.code_blocks], r.code_ratio)
        for r in split_code_fences(df).collect()
    }
    for i, t in FIXTURE:
        want = _py_split(t)
        assert got[i][0] == want[0], (i, "prose")
        assert got[i][1] == want[1], (i, "blocks")
        assert got[i][2] == pytest.approx(want[2]), (i, "ratio")
    # the planted cases actually fired
    assert got[0][1] == [("python", "x = 1\ny = 2")]
    assert [lg for lg, _ in got[1][1]] == ["", "rust"]
    assert got[3][1] == [] and "unclosed" in got[3][0]
    assert got[4][1] == []
    assert got[5][1] == [("js", "")]
    assert got[7] == (None, [], 0.0)


def test_ratio_routes_code_heavy_docs(spark):
    code = "```c\n" + "int x;\n" * 50 + "```"
    df = spark.createDataFrame(
        [(0, f"tiny note\n{code}"), (1, "all prose here, no code")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.code_ratio for r in split_code_fences(df).collect()}
    assert got[0] > 0.9 and got[1] == 0.0


def test_explode_keys_blocks(spark):
    df = split_code_fences(
        spark.createDataFrame(FIXTURE, "doc_id long, text string")
    )
    rows = explode_code_blocks(df).collect()
    keyed = {(r.doc_id, r.block_idx): (r.lang, r.code) for r in rows}
    assert keyed[(0, 0)] == ("python", "x = 1\ny = 2")
    assert keyed[(1, 0)][0] == "" and keyed[(1, 1)][0] == "rust"
    assert not any(r.doc_id in (2, 3, 4, 6, 7) for r in rows)


def test_split_plan_is_scan_local(spark):
    df = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    plan = formatted_plan(split_code_fences(df))
    for bad in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython",
                "Generate", "Window"):
        assert bad not in plan, f"{bad} in mdsplit plan"


def test_mid_line_backticks_do_not_close_early(spark):
    """A code line ENDING in ``` must not close the fence (review
    r16): the closing fence has to sit on its own line."""
    text = "intro\n```py\ns = 'end```\nmore_code()\n```\noutro"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    [r] = split_code_fences(df).collect()
    assert [(b.lang, b.code) for b in r.code_blocks] == [
        ("py", "s = 'end```\nmore_code()")
    ]
    assert r.prose == "intro\n\noutro"
