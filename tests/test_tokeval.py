"""operators/tokeval.py: vocabulary utilization report.

Evidence: hand-computed exact counts under a tiny char-level BPE
spec (distinct ids, singletons, head mass, byte totals all
arithmetically derivable), a planted Zipf head whose top-decile mass
is exact, deterministic head tie-breaks, grouped vs keyless parity,
empty/NULL-text and NULL-group semantics, and the explicit
complement contract with tokenio.tokenizer_report_spec (disjoint
metric surfaces over the same encode leg).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
    TokenizerSpec,
    tokenizer_report_spec,
)
from utc_cuip_kafka_aws_connector_spark.operators.tokeval import (
    vocab_utilization,
)

SPEC = TokenizerSpec(
    merges=[("a", "b")],
    vocab={"a": 0, "b": 1, "c": 2, "d": 3, "ab": 4, "<unk>": 5},
    unk_token="<unk>",
    byte_level=False,
)


def test_exact_counts_hand_computed(spark):
    # en: "ab ab c" -> [ab][ab][c]; "ca d" -> [c][a][d]
    #   freq: ab:2, c:2, a:1, d:1 -> distinct 4, singletons 2,
    #   head = ceil(4/10)=1 id -> ab (count desc, id asc: ab id=4
    #   ties c id=2 -> c wins the tie-break!) -> verify ordering
    df = spark.createDataFrame(
        [(0, "ab ab c", "en"), (1, "ca d", "en"), (2, "dd", "de"),
         (3, None, "de")],
        "doc_id long, text string, lang string",
    )
    got = {
        r.lang: r for r in vocab_utilization(df, SPEC, group_col="lang").collect()
    }
    en = got["en"]
    assert (en.n_docs, en.n_bytes, en.n_tokens) == (2, 11, 6)
    assert en.distinct_ids == 4
    assert en.vocab_coverage == pytest.approx(4 / 6)
    assert en.singleton_ids == 2  # a, d
    # head: 1 id; counts {ab:2, c:2, a:1, d:1}; tie at 2 broken by
    # id asc -> c (id 2) beats ab (id 4); mass = 2/6
    assert en.top_decile_mass == pytest.approx(2 / 6)
    assert en.bytes_per_token == pytest.approx(11 / 6)
    de = got["de"]
    # "dd" -> [d][d]; NULL text doc -> 0 tokens
    assert (de.n_docs, de.n_tokens, de.distinct_ids) == (2, 2, 1)
    assert de.singleton_ids == 0
    assert de.top_decile_mass == 1.0
    # keyless: one row over everything
    [tot] = vocab_utilization(df, SPEC).collect()
    assert tot.n_docs == 4 and tot.n_tokens == 8
    assert tot.distinct_ids == 4


def test_planted_zipf_head_mass(spark):
    # 20 distinct chars; char_0 gets 81 occurrences, others 1 each.
    # head = ceil(20/10) = 2 ids = char_0 (81) + smallest-id singleton
    chars = [chr(ord("a") + i) for i in range(20)]
    text = " ".join(["a"] * 81 + chars[1:])
    spec = TokenizerSpec(
        merges=[],
        vocab={c: i for i, c in enumerate(chars)},
        unk_token=None,
        byte_level=False,
    )
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    [r] = vocab_utilization(df, spec).collect()
    assert r.distinct_ids == 20 and r.n_tokens == 100
    assert r.singleton_ids == 19
    assert r.top_decile_mass == pytest.approx((81 + 1) / 100)


def test_empty_and_null_semantics(spark):
    df = spark.createDataFrame(
        [(0, "", "x"), (1, None, None)],
        "doc_id long, text string, lang string",
    )
    got = vocab_utilization(df, SPEC, group_col="lang").collect()
    assert len(got) == 1  # NULL group dropped
    [r] = got
    assert (r.n_tokens, r.distinct_ids, r.singleton_ids) == (0, 0, 0)
    assert r.vocab_coverage == 0.0
    assert r.top_decile_mass is None and r.bytes_per_token is None


def test_complements_fitness_report_not_duplicates(spark):
    """The two reports answer different questions over the same
    encode leg: fitness (oov/compression/fertility) there,
    utilization (coverage/concentration/pruning) here — their metric
    columns are disjoint by design."""
    df = spark.createDataFrame(
        [(0, "ab ab c", "en")], "doc_id long, text string, lang string"
    )
    fit_cols = set(
        tokenizer_report_spec(df, SPEC, slice_col="lang").columns
    )
    util_cols = set(vocab_utilization(df, SPEC, group_col="lang").columns)
    overlap = (fit_cols & util_cols) - {"lang", "n_docs", "n_tokens"}
    assert not overlap, f"duplicated metric surfaces: {overlap}"


def test_vocab_coverage_excludes_added_tokens(spark):
    """ADVICE r16: tokenio folds added_tokens into spec.vocab on load,
    so len(spec.vocab) silently counted added/control tokens against
    coverage's documented MODEL-vocab denominator. The denominator
    must exclude added tokens by KEY -- including one whose content
    duplicates a learned vocab entry (folding there did not grow the
    dict, so a len-subtraction would over-subtract)."""
    df = spark.createDataFrame(
        [(0, "ab ab c", "en"), (1, "ca d", "en")],
        "doc_id long, text string, lang string",
    )
    base = TokenizerSpec(
        merges=[("a", "b")],
        vocab={"a": 0, "b": 1, "c": 2, "d": 3, "ab": 4, "<unk>": 5},
        unk_token="<unk>",
        byte_level=False,
    )
    [plain] = vocab_utilization(df, base).collect()
    assert plain.vocab_coverage == pytest.approx(4 / 6)

    # two control tokens folded into the vocab (the tokenio load
    # shape) -> same exercised ids, same denominator as without them
    folded = TokenizerSpec(
        merges=[("a", "b")],
        vocab={"a": 0, "b": 1, "c": 2, "d": 3, "ab": 4, "<unk>": 5,
               "<s>": 6, "</s>": 7},
        unk_token="<unk>",
        byte_level=False,
        added_tokens={"<s>": 6, "</s>": 7},
    )
    [got] = vocab_utilization(df, folded).collect()
    assert got.vocab_coverage == pytest.approx(4 / 6)

    # added token whose content is ALSO a learned entry (same id --
    # the only overlap tokenio accepts): excluded once, not twice
    overlap = TokenizerSpec(
        merges=[("a", "b")],
        vocab={"a": 0, "b": 1, "c": 2, "d": 3, "ab": 4, "<unk>": 5},
        unk_token="<unk>",
        byte_level=False,
        added_tokens={"<unk>": 5},
    )
    [ov] = vocab_utilization(df, overlap).collect()
    assert ov.vocab_coverage == pytest.approx(4 / 5)


def test_all_added_vocab_refuses(spark):
    """Review r17: a spec whose every vocab entry is an added/control
    token has no model vocabulary to measure — refuse loudly instead
    of emitting a silently-NULL coverage column."""
    df = spark.createDataFrame(
        [(0, "x", "en")], "doc_id long, text string, lang string"
    )
    degenerate = TokenizerSpec(
        merges=[], vocab={"<s>": 0, "</s>": 1}, unk_token=None,
        byte_level=False, added_tokens={"<s>": 0, "</s>": 1},
    )
    with pytest.raises(ValueError, match="no model vocabulary"):
        vocab_utilization(df, degenerate)
