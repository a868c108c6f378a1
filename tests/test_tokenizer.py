"""BPE tokenizer contract tests (operators/tokenizer.py).

The operator's contract is merge-list application: merges in rank
order, each pass merging occurrences left-to-right non-overlapping.
Three implementations must agree everywhere:

1. ``bpe_encode_word`` -- the reference symbol-loop (also the kernel's
   inner function),
2. the q112 oracle's framed-REPLACE replay in DuckDB (doubled
   US separators between symbols make plain string REPLACE exactly
   the symbol-pair merge -- a token whose prefix matches a merge's
   right side cannot false-match),
3. the vectorized mapInPandas kernel on a DataFrame.

The fuzz alphabet is biased toward the DEMO_MERGES characters so
merge chains (t+h -> th+e; a+r -> ar+t) actually fire.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from utc_cuip_kafka_aws_connector_spark.operators.tokenizer import (
    DEMO_MERGES,
    bpe_encode_word,
    bpe_token_count,
)

words_strategy = st.lists(
    st.text(alphabet="aberstholw", min_size=1, max_size=12),
    min_size=0,
    max_size=8,
)


def _oracle_count(word: str) -> int:
    """Replay the q112 oracle's framed-REPLACE pipeline for one word."""
    expr = "chr(31) || array_to_string(string_split_regex(?, ''), chr(31)||chr(31)) || chr(31)"
    for a, b in DEMO_MERGES:
        expr = (
            f"replace({expr}, chr(31)||'{a}'||chr(31)||chr(31)||'{b}'||chr(31), "
            f"chr(31)||'{a}{b}'||chr(31))"
        )
    n = duckdb.sql(
        f"SELECT (length(x) - length(replace(x, chr(31)||chr(31), ''))) // 2 + 1 "
        f"FROM (SELECT {expr} AS x)",
        params=[word],
    ).fetchone()[0]
    return int(n)


def test_demo_merges_are_well_formed():
    """Each merge side is a single character or the product of an
    EARLIER merge -- the property that makes rank-order application
    match the iterative lowest-rank encoder on learned tables."""
    produced: set[str] = set()
    for a, b in DEMO_MERGES:
        assert len(a) == 1 or a in produced, f"left side {a!r} not derivable"
        assert len(b) == 1 or b in produced, f"right side {b!r} not derivable"
        produced.add(a + b)


def test_encode_word_known_values():
    assert bpe_encode_word("the", DEMO_MERGES) == ["the"]
    assert bpe_encode_word("part", DEMO_MERGES) == ["p", "art"]
    # (ar,t) must NOT steal the 't' of an already-merged 'th':
    assert bpe_encode_word("earth", DEMO_MERGES) == ["e", "ar", "th"]
    # left-to-right non-overlapping within one rank:
    assert bpe_encode_word("ststst", DEMO_MERGES) == ["st", "st", "st"]
    assert bpe_encode_word("", DEMO_MERGES) == []


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(words=words_strategy)
def test_reference_matches_oracle_replay(words):
    for w in words:
        assert len(bpe_encode_word(w, DEMO_MERGES)) == _oracle_count(w)


@pytest.mark.usefixtures("spark")
def test_kernel_matches_reference(spark):
    rows = [
        (0, "the fastest part"),
        (1, "earth   slow\tmerge"),  # multi-space + tab: \s+ split
        (2, "ststst"),
        (3, ""),  # zero words -> (0, 0)
        (4, "window sort table value"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_token_count(df).collect()
    }
    import re

    for doc_id, text in rows:
        ws = [w for w in re.split(r"\s+", text) if w]
        expected = (len(ws), sum(len(bpe_encode_word(w, DEMO_MERGES)) for w in ws))
        assert got[doc_id] == expected, f"doc {doc_id}"
    assert len(got) == len(rows)


def test_custom_merge_table(spark):
    """The merges parameter is honored (not silently DEMO_MERGES)."""
    df = spark.createDataFrame([(0, "abab")], "doc_id long, text string")
    [row] = bpe_token_count(df, merges=[("a", "b"), ("ab", "ab")]).collect()
    assert (row["n_words"], row["n_tokens"]) == (1, 1)  # ab+ab -> abab


@st.composite
def well_formed_merges(draw):
    """Random well-formed merge tables: each side is a single char or
    the product of an earlier merge (the invariant of learned BPE
    tables, asserted for DEMO_MERGES above)."""
    alphabet = "abcst"
    produced: list[str] = []
    merges: list[tuple[str, str]] = []
    n = draw(st.integers(min_value=1, max_value=8))
    for _ in range(n):
        pool = list(alphabet) + produced
        a = draw(st.sampled_from(pool))
        b = draw(st.sampled_from(pool))
        merges.append((a, b))
        produced.append(a + b)
    return merges


@settings(
    max_examples=40,
    deadline=None,
    derandomize=True,  # fixed example set: this property must not flake across rounds
    suppress_health_check=list(HealthCheck),
)
@given(merges=well_formed_merges(), word=st.text(alphabet="abcst", max_size=14))
def test_rank_order_encode_invariants_any_table(merges, word):
    """Structural invariants under ARBITRARY well-formed tables: the
    encoding concatenates back to the word; every output token is a
    char or a produced merge string; no adjacent token pair equals a
    merge that could still fire under a LATER rank than both tokens'
    creation (weak no-op check: re-encoding the encoding's joined
    string is idempotent)."""
    toks = bpe_encode_word(word, merges)
    assert "".join(toks) == word
    vocab = set("abcst") | {a + b for a, b in merges}
    assert all(t in vocab for t in toks)
    # idempotence: re-running the merge passes over the token stream
    # changes nothing (each pass is a fixed point after one run)
    syms = list(toks)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    assert syms == toks


def test_null_and_empty_text_count_zero(spark):
    """NULL text must count (0 words, 0 tokens) like the q112 oracle's
    LEFT JOIN + coalesce — pandas astype(str) would otherwise turn
    None into the literal word 'None' (1 word / 4 tokens)."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "the start")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_words, r.n_tokens) for r in bpe_token_count(df).collect()}
    assert got[1] == (0, 0)
    assert got[2] == (0, 0)
    assert got[3][0] == 2
