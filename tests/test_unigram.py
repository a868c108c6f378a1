"""Unigram tokenizer.json support: Viterbi kernel optimality
(brute-force differential), T5-shaped spec loading, distributed
encode parity, byte_fallback/fuse_unk policies, rejections.
"""

from __future__ import annotations

import json
import math
import random
from functools import lru_cache

import pytest

from utc_cuip_kafka_aws_connector_spark.operators.bytelevel import (
    metaspace_pretokenize,
    spec_decode,
    spec_encode,
)
from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
    from_tokenizer_json,
    from_tokenizer_json_spec,
    tokenizer_report_spec,
)
from utc_cuip_kafka_aws_connector_spark.operators.unigram import (
    UNK_PENALTY,
    fuse_unknowns,
    unigram_encode_piece,
    unigram_unk_score,
    viterbi_segment,
)


def brute_force_best(text: str, scores: dict[str, float], unk: float):
    """Exhaustive max over ALL segmentations (vocab pieces anywhere,
    unknown single chars at unk score) — the optimality oracle."""

    @lru_cache(maxsize=None)
    def rec(i: int) -> float:
        if i == len(text):
            return 0.0
        best = float("-inf")
        for j in range(i + 1, len(text) + 1):
            s = scores.get(text[i:j])
            if s is not None:
                best = max(best, s + rec(j))
        return max(best, unk + rec(i + 1))

    return rec(0)


def seg_total(segments, scores, unk):
    return sum(
        scores[p] if known else unk for p, known in segments
    )


def test_viterbi_hand_example():
    scores = {"a": -1.0, "b": -1.0, "c": -1.0, "ab": -1.5, "abc": -4.0}
    segs = viterbi_segment("abc", scores, -20.0, 3)
    assert [p for p, _ in segs] == ["ab", "c"]
    assert all(k for _, k in segs)


def test_viterbi_tie_prefers_longer_piece():
    scores = {"a": -1.0, "b": -1.0, "ab": -2.0}
    segs = viterbi_segment("ab", scores, -20.0, 2)
    assert [p for p, _ in segs] == ["ab"]


def test_viterbi_unknown_chars_and_fuse():
    scores = {"hi": -1.0}
    unk = unigram_unk_score(scores)
    assert unk == -1.0 - UNK_PENALTY
    segs = viterbi_segment("hixyhi", scores, unk, 2)
    assert segs == [
        ("hi", True), ("x", False), ("y", False), ("hi", True),
    ]
    fused = fuse_unknowns(segs)
    assert fused == [("hi", True), ("xy", False), ("hi", True)]


def test_viterbi_matches_brute_force_on_random_tables():
    rng = random.Random(20260815)
    alphabet = "abcd"
    for trial in range(60):
        pieces = {alphabet[rng.randrange(4)] for _ in range(3)}
        for _ in range(rng.randrange(2, 8)):
            ln = rng.randrange(2, 5)
            pieces.add(
                "".join(alphabet[rng.randrange(4)] for _ in range(ln))
            )
        scores = {p: -rng.uniform(0.5, 9.0) for p in pieces}
        unk = unigram_unk_score(scores)
        max_len = max(len(p) for p in scores)
        text = "".join(
            # 'e' is never in the vocab: forced unknowns appear
            (alphabet + "e")[rng.randrange(5)]
            for _ in range(rng.randrange(0, 12))
        )
        segs = viterbi_segment(text, scores, unk, max_len)
        assert "".join(p for p, _ in segs) == text
        got = seg_total(segs, scores, unk)
        want = brute_force_best(text, scores, unk)
        assert got == pytest.approx(want, abs=1e-12), (trial, text)


def _t5ish_json(byte_fallback: bool = False) -> str:
    vocab = [
        ["<unk>", 0.0],
        ["</s>", 0.0],
        ["▁", -2.25],
        ["▁hello", -3.5],
        ["▁world", -3.75],
        ["▁he", -4.5],
        ["llo", -5.0],
        ["wor", -5.25],
        ["ld", -5.5],
        ["l", -7.0],
        ["o", -7.25],
        ["h", -7.5],
        ["e", -7.75],
        ["w", -8.0],
        ["r", -8.25],
        ["d", -8.5],
    ]
    if byte_fallback:
        vocab += [[f"<0x{b:02X}>", -10.0] for b in range(256)]
    doc = {
        "version": "1.0",
        "normalizer": None,
        "pre_tokenizer": {
            "type": "Metaspace",
            "replacement": "▁",
            "prepend_scheme": "always",
            "split": True,
        },
        "post_processor": {
            "type": "TemplateProcessing",
            "single": [
                {"Sequence": {"id": "A", "type_id": 0}},
                {"SpecialToken": {"id": "</s>", "type_id": 0}},
            ],
        },
        "model": {
            "type": "Unigram",
            "unk_id": 0,
            "vocab": vocab,
            "byte_fallback": byte_fallback,
        },
        "added_tokens": [
            {"content": "<pad>", "id": len(vocab)},
        ],
    }
    return json.dumps(doc, ensure_ascii=False)


def test_spec_loads_t5_shape():
    spec = from_tokenizer_json_spec(_t5ish_json())
    assert spec.model_type == "Unigram"
    assert spec.merges == []
    assert spec.unk_token == "<unk>"
    assert spec.split_mode == "metaspace"
    assert spec.metaspace_replacement == "▁"
    assert spec.metaspace_prepend == "always"
    assert spec.scores["▁hello"] == -3.5
    assert spec.vocab["▁hello"] == 3
    assert spec.special_prefix == []
    assert spec.special_suffix == [spec.vocab["</s>"]]
    assert spec.added_tokens == {"<pad>": 16}
    with pytest.raises(ValueError, match="unigram"):
        from_tokenizer_json(_t5ish_json())


def test_metaspace_pretokenize_shapes():
    assert metaspace_pretokenize("hello world") == [
        "▁hello", "▁world",
    ]
    assert metaspace_pretokenize(" lead") == ["▁lead"]
    assert metaspace_pretokenize("a  b") == ["▁a", "▁", "▁b"]
    assert metaspace_pretokenize("") == []
    assert metaspace_pretokenize("x", prepend_scheme="never") == ["x"]
    # only U+0020 is replaced; other whitespace passes through
    assert metaspace_pretokenize("a\tb") == ["▁a\tb"]


def test_unigram_spec_encode_matches_brute_force(spark):
    spec = from_tokenizer_json_spec(_t5ish_json())
    texts = [
        (0, "hello world"),
        (1, "he world hello"),
        (2, "hellold"),
        (3, ""),
        (4, "hello?!"),   # '?', '!' are unknown -> fused unk
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: r["token_ids"]
        for r in spec_encode(df, spec).collect()
    }

    unk = unigram_unk_score(spec.scores)
    max_len = max(len(p) for p in spec.scores)

    def ref_encode(text):
        ids = []
        for piece in metaspace_pretokenize(text):
            segs = viterbi_segment(piece, spec.scores, unk, max_len)
            # independent optimality check per piece
            assert seg_total(segs, spec.scores, unk) == pytest.approx(
                brute_force_best(piece, spec.scores, unk), abs=1e-12
            )
            ids.extend(
                unigram_encode_piece(
                    piece, spec.scores, spec.vocab, 0, False, unk, max_len
                )
            )
        return ids

    for doc_id, text in texts:
        assert got[doc_id] == ref_encode(text), (doc_id, text)
    # known decomposition, by hand: "hello world" ->
    # ["▁hello", "▁world"] -> ids [3, 4]
    assert got[0] == [3, 4]
    # unknown run fuses to ONE unk id
    assert got[4] == [3, 0]


def test_unigram_special_tokens_appended(spark):
    spec = from_tokenizer_json_spec(_t5ish_json())
    df = spark.createDataFrame([(0, "hello")], "doc_id long, text string")
    ids = spec_encode(df, spec, add_special_tokens=True).collect()[0][
        "token_ids"
    ]
    assert ids[-1] == spec.vocab["</s>"]
    assert ids[:-1] == [3]


def test_unigram_byte_fallback(spark):
    spec = from_tokenizer_json_spec(_t5ish_json(byte_fallback=True))
    df = spark.createDataFrame([(0, "helloé")], "doc_id long, text string")
    ids = spec_encode(df, spec).collect()[0]["token_ids"]
    # é = UTF-8 C3 A9 -> two byte tokens, not one fused unk
    assert ids[:1] == [3]
    assert ids[1:] == [
        spec.vocab["<0xC3>"], spec.vocab["<0xA9>"],
    ]


def test_unigram_round_trip_decode(spark):
    spec = from_tokenizer_json_spec(_t5ish_json())
    for text in ("hello world", "he world", "world hello hello"):
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        ids = spec_encode(df, spec).collect()[0]["token_ids"]
        assert spec_decode(ids, spec) == text


def test_unigram_report_counts_oov(spark):
    spec = from_tokenizer_json_spec(_t5ish_json())
    df = spark.createDataFrame(
        [(0, "hello world", "en"), (1, "???", "xx")],
        "doc_id long, text string, lang string",
    )
    rows = {
        r["lang"]: r
        for r in tokenizer_report_spec(df, spec).collect()
    }
    assert rows["en"]["oov_rate"] == 0.0
    assert rows["xx"]["oov_rate"] > 0.0


def test_rejections():
    doc = json.loads(_t5ish_json())
    doc["pre_tokenizer"]["split"] = False
    with pytest.raises(ValueError, match="split=false"):
        from_tokenizer_json_spec(json.dumps(doc))

    doc = json.loads(_t5ish_json())
    doc["pre_tokenizer"]["prepend_scheme"] = "weird"
    with pytest.raises(ValueError, match="prepend_scheme"):
        from_tokenizer_json_spec(json.dumps(doc))

    doc = json.loads(_t5ish_json())
    doc["model"]["mystery"] = 1
    with pytest.raises(ValueError, match="Unigram model sections"):
        from_tokenizer_json_spec(json.dumps(doc))

    doc = json.loads(_t5ish_json())
    doc["model"]["unk_id"] = 10_000
    with pytest.raises(ValueError, match="unk_id"):
        from_tokenizer_json_spec(json.dumps(doc))

    doc = json.loads(_t5ish_json())
    doc["model"]["vocab"].append(["<unk>", -1.0])
    with pytest.raises(ValueError, match="duplicate"):
        from_tokenizer_json_spec(json.dumps(doc))

    doc = json.loads(_t5ish_json())
    doc["pre_tokenizer"] = {"type": "ByteLevel"}
    with pytest.raises(ValueError, match="ByteLevel.*Unigram"):
        from_tokenizer_json_spec(json.dumps(doc))

    # closed vocab + no byte_fallback + unknown char -> loud error
    doc = json.loads(_t5ish_json())
    doc["model"]["unk_id"] = None
    spec = from_tokenizer_json_spec(json.dumps(doc))
    with pytest.raises(ValueError, match="no unk_id/byte_fallback"):
        unigram_encode_piece(
            "?", spec.scores, spec.vocab, None, False,
            unigram_unk_score(spec.scores),
            max(len(p) for p in spec.scores),
        )


def test_unigram_unk_score_guard():
    with pytest.raises(ValueError, match="empty"):
        unigram_unk_score({})


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=60, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(st.data())
def test_viterbi_optimality_property(data):
    """Hypothesis sweep of the seeded differential: on ANY piece
    table and input (incl. characters outside every piece), Viterbi
    reconstructs the input exactly and its total equals the
    exhaustive-segmentation maximum."""
    pieces = data.draw(
        st.sets(
            st.text(alphabet="abc", min_size=1, max_size=4),
            min_size=1,
            max_size=10,
        )
    )
    scores = {
        p: data.draw(
            st.floats(min_value=-12.0, max_value=-0.125, allow_nan=False)
        )
        for p in sorted(pieces)
    }
    text = data.draw(st.text(alphabet="abcd", max_size=10))
    unk = unigram_unk_score(scores)
    max_len = max(len(p) for p in scores)
    segs = viterbi_segment(text, scores, unk, max_len)
    assert "".join(p for p, _ in segs) == text
    assert seg_total(segs, scores, unk) == pytest.approx(
        brute_force_best(text, scores, unk), abs=1e-9
    )


def test_sample_segment_posterior_and_limits():
    """FFBS sampling: alpha=1 draws the exact lattice posterior
    (frequency of the one-piece path on the two-path 'ab' lattice
    matches closed form within 3 sigma); large alpha collapses onto
    Viterbi; determinism is the caller's rng."""
    import math
    import random

    from utc_cuip_kafka_aws_connector_spark.operators.unigram import (
        sample_segment,
    )

    scores = {
        "a": math.log(0.3),
        "b": math.log(0.2),
        "ab": math.log(0.1),
    }
    unk = unigram_unk_score(scores)
    p_one = 0.1 / (0.1 + 0.3 * 0.2)

    rng = random.Random(7)
    n = 4000
    ones = sum(
        1
        for _ in range(n)
        if [p for p, _ in sample_segment("ab", scores, unk, 2, 1.0, rng)]
        == ["ab"]
    )
    sigma = math.sqrt(n * p_one * (1 - p_one))
    assert abs(ones - n * p_one) < 3 * sigma, (ones, n * p_one)

    # alpha -> inf: every draw is the Viterbi segmentation
    vit = [p for p, _ in viterbi_segment("ab", scores, unk, 2)]
    rng = random.Random(3)
    for _ in range(50):
        assert [
            p for p, _ in sample_segment("ab", scores, unk, 2, 200.0, rng)
        ] == vit

    # reconstruction + unknown chars still covered
    rng = random.Random(1)
    for _ in range(50):
        segs = sample_segment("abxab", scores, unk, 2, 1.0, rng)
        assert "".join(p for p, _ in segs) == "abxab"

    with pytest.raises(ValueError, match="alpha"):
        sample_segment("ab", scores, unk, 2, 0.0, random.Random(0))


def test_spec_encode_subword_regularization(spark):
    """Distributed sampling: deterministic per (seed, doc,
    occurrence) across layouts, varies across seeds, decodes back to
    the original text, and rejects non-Unigram models."""
    spec = from_tokenizer_json_spec(_t5ish_json())
    texts = [(i, "hello world hello") for i in range(6)]
    df = spark.createDataFrame(texts, "doc_id long, text string")

    a = {
        r["doc_id"]: r["token_ids"]
        for r in spec_encode(df, spec, sample_alpha=0.2, sample_seed=5).collect()
    }
    b = {
        r["doc_id"]: r["token_ids"]
        for r in spec_encode(
            df.repartition(5), spec, sample_alpha=0.2, sample_seed=5
        ).collect()
    }
    assert a == b  # layout-independent determinism
    c = {
        r["doc_id"]: r["token_ids"]
        for r in spec_encode(df, spec, sample_alpha=0.2, sample_seed=6).collect()
    }
    assert a != c  # a new seed is a fresh draw
    # at a soft temperature the 6 docs should not all share one
    # segmentation (they have distinct doc keys)
    assert len({tuple(v) for v in a.values()}) > 1
    for doc_id, text in texts:
        assert spec_decode(a[doc_id], spec) == text

    bpe_spec = from_tokenizer_json_spec(
        json.dumps(
            {
                "version": "1.0",
                "model": {
                    "type": "BPE",
                    "unk_token": "<unk>",
                    "vocab": {"<unk>": 0, "a": 1},
                    "merges": [],
                },
            }
        )
    )
    with pytest.raises(ValueError, match="Unigram"):
        spec_encode(df, bpe_spec, sample_alpha=0.5)
