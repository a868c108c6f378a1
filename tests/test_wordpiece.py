"""operators/wordpiece.py: WordPiece (BERT-family) tokenization.

Evidence model (FIXTURES.md — no `tokenizers` lib in this image):
hand-authored differentials. Every expected token stream below was
computed BY HAND from the published algorithm (greedy
longest-match-first with ## continuation, all-or-nothing unk,
BertNormalizer, BertPreTokenizer) — not by running the code — so the
tests are an independent oracle, the test_bytelevel.py recipe.
Plus: exact round-trip on normalized in-vocab text, the Spark kernel
== the driver-side twin on the documents table, a no-shuffle plan
pin, and loud rejection of every id-altering tokenizer.json section.
"""

from __future__ import annotations

import json

import pytest

from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
    WordPieceSpec,
    decode_ids,
    encode_text,
    encode_word,
    from_wordpiece_json,
    normalize_text,
    pretokenize,
    spec_encode,
)

_TOKENS = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "the", "quick", "brown", "fox", "jump",
    "##s", "##ed", "##ing", "over", "lazy", "dog",
    "un", "##aff", "##able", "!", ",",
    "jumper", "##er", "cafe", "中", ".",
]
VOCAB = {t: i for i, t in enumerate(_TOKENS)}
SPEC = WordPieceSpec(vocab=VOCAB)


def ids(*toks):
    return [VOCAB[t] for t in toks]


# ---- hand-computed encode differentials -----------------------------------

CASES = [
    # BertNormalizer lowercase + greedy split + punctuation isolation
    ("The quick brown fox jumps!",
     ids("the", "quick", "brown", "fox", "jump", "##s", "!")),
    # continuation pieces
    ("jumping jumped", ids("jump", "##ing", "jump", "##ed")),
    # multi-continuation chain
    ("unaffable", ids("un", "##aff", "##able")),
    # no match anywhere -> unk
    ("zzz", ids("[UNK]")),
    # matched head + unmatchable tail -> WHOLE word unk (the
    # all-or-nothing rule, not [quick, UNK])
    ("quickzz", ids("[UNK]")),
    # punctuation splits words without whitespace
    ("fox,dog", ids("fox", ",", "dog")),
    # greedy LONGEST first: jumper ##s, never jump ##er ##s
    ("jumpers", ids("jumper", "##s")),
    # accent strip rides the lowercase default (strip_accents=None)
    ("Café.", ids("cafe", ".")),
    # CJK chars become their own words
    ("fox中dog", ids("fox", "中", "dog")),
    # whitespace variants collapse; empty text encodes empty
    ("  the\tfox \n", ids("the", "fox")),
    ("", []),
]


@pytest.mark.parametrize("text,want", CASES, ids=[c[0][:18] or "empty" for c in CASES])
def test_encode_matches_hand_computation(text, want):
    assert encode_text(text, SPEC) == want


def test_max_input_chars_word_becomes_unk():
    tight = WordPieceSpec(vocab=VOCAB, max_input_chars_per_word=6)
    # 'jumper' (6) still splits; 'jumpers' (7) is unk outright even
    # though it IS decomposable
    assert encode_text("jumper jumpers", tight) == ids("jumper", "[UNK]")


def test_special_tokens_wrap_only_on_request():
    spec = WordPieceSpec(
        vocab=VOCAB, special_prefix=[VOCAB["[CLS]"]],
        special_suffix=[VOCAB["[SEP]"]],
    )
    assert encode_text("fox", spec) == ids("fox")
    assert encode_text("fox", spec, add_special_tokens=True) == ids(
        "[CLS]", "fox", "[SEP]"
    )


def test_round_trip_exact_on_normalized_in_vocab_text():
    for text in (
        "the quick brown fox jumps",
        "unaffable jumpers over the lazy dog !",
        "cafe , dog .",
    ):
        assert decode_ids(encode_text(text, SPEC), SPEC) == text
    with pytest.raises(ValueError, match="not in the vocab"):
        decode_ids([999], SPEC)


def test_normalizer_pieces():
    # control chars dropped, whitespace canonicalized, CJK spaced
    assert normalize_text("a\x00b中Cé", SPEC) == "ab 中 ce"
    # strip_accents=False beats the lowercase default
    keep = WordPieceSpec(vocab=VOCAB, strip_accents=False)
    assert normalize_text("Café", keep) == "café"
    assert pretokenize("don't stop!") == ["don", "'", "t", "stop", "!"]


def test_encode_word_prefix_convention():
    alt = WordPieceSpec(
        vocab={"ju": 0, "@@mp": 1, "[UNK]": 2},
        continuing_subword_prefix="@@",
    )
    assert encode_word("jump", alt) == ["ju", "@@mp"]


# ---- tokenizer.json loader -------------------------------------------------


def _doc(**over):
    doc = {
        "version": "1.0",
        "normalizer": {
            "type": "BertNormalizer", "clean_text": True,
            "handle_chinese_chars": True, "strip_accents": None,
            "lowercase": True,
        },
        "pre_tokenizer": {"type": "BertPreTokenizer"},
        "post_processor": {
            "type": "TemplateProcessing",
            "single": [
                {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
                {"Sequence": {"id": "A", "type_id": 0}},
                {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
            ],
        },
        "model": {
            "type": "WordPiece", "unk_token": "[UNK]",
            "continuing_subword_prefix": "##",
            "max_input_chars_per_word": 100, "vocab": dict(VOCAB),
        },
        "added_tokens": [{"content": "[MASK]", "id": 25}],
    }
    doc.update(over)
    return doc


def test_loader_round_trip_bert_shape():
    spec = from_wordpiece_json(json.dumps(_doc()))
    assert spec.unk_token == "[UNK]" and spec.lowercase
    assert spec.special_prefix == [VOCAB["[CLS]"]]
    assert spec.special_suffix == [VOCAB["[SEP]"]]
    assert spec.vocab["[MASK]"] == 25 and spec.added_tokens["[MASK]"] == 25
    # the loaded spec encodes identically to the hand-built one
    for text, want in CASES:
        assert encode_text(text, spec) == want


def test_loader_lowercase_normalizer_does_not_strip_accents():
    """Review r18: HF's standalone Lowercase normalizer ONLY
    lowercases — a vocab with both 'café' and 'cafe' must keep the
    accented id (BertNormalizer's follow-the-lowercase accent strip
    is that normalizer's semantics, not Lowercase's)."""
    vocab = dict(VOCAB)
    vocab["café"] = 100
    doc = _doc(normalizer={"type": "Lowercase"}, post_processor=None)
    doc["model"]["vocab"] = vocab
    spec = from_wordpiece_json(json.dumps(doc))
    assert encode_text("Café", spec) == [100]
    assert spec.clean_text is False and spec.handle_chinese_chars is False


def test_loader_absent_normalizer_is_identity():
    """Review r18: no normalizer section = the identity (HF
    convention) — no CJK spacing, no lowercase, no accent strip, no
    control-char cleanup baked in uninvited."""
    doc = _doc(normalizer=None, post_processor=None)
    spec = from_wordpiece_json(json.dumps(doc))
    # '中' stays INSIDE the word: 'fox中dog' is one unmatchable word
    assert encode_text("fox中dog", spec) == ids("[UNK]")
    # case preserved: 'The' is not 'the'
    assert encode_text("The the", spec) == ids("[UNK]", "the")


def test_loader_rejections():
    with pytest.raises(ValueError, match="tokenio.load_tokenizer_spec"):
        from_wordpiece_json(json.dumps(_doc(model={"type": "BPE"})))
    with pytest.raises(ValueError, match="truncation"):
        from_wordpiece_json(json.dumps(_doc(truncation={"max_length": 5})))
    with pytest.raises(ValueError, match="normalizer"):
        from_wordpiece_json(json.dumps(_doc(normalizer={"type": "NFC"})))
    with pytest.raises(ValueError, match="pre_tokenizer"):
        from_wordpiece_json(json.dumps(_doc(pre_tokenizer={"type": "Metaspace"})))
    with pytest.raises(ValueError, match="WhitespaceSplit"):
        from_wordpiece_json(
            json.dumps(_doc(pre_tokenizer={"type": "WhitespaceSplit"}))
        )
    with pytest.raises(ValueError, match="model sections"):
        bad = _doc()
        bad["model"]["dropout"] = 0.1
        from_wordpiece_json(json.dumps(bad))
    with pytest.raises(ValueError, match="unk_token"):
        bad = _doc()
        bad["model"]["unk_token"] = "[NOPE]"
        from_wordpiece_json(json.dumps(bad))
    with pytest.raises(ValueError, match="unsupported tokenizer sections"):
        from_wordpiece_json(json.dumps(_doc(mystery=1)))
    with pytest.raises(ValueError, match="conflicts"):
        from_wordpiece_json(
            json.dumps(_doc(added_tokens=[{"content": "the", "id": 99}]))
        )


# ---- the Spark kernel -------------------------------------------------------


def test_spark_kernel_equals_driver_twin(spark, sf_dir):
    """spec_encode over the documents table == encode_text per row —
    the Arrow batch path adds nothing and loses nothing."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    got = {
        r["doc_id"]: r["token_ids"]
        for r in spec_encode(docs, SPEC).collect()
    }
    for r in docs.collect():
        assert got[r["doc_id"]] == encode_text(r["text"], SPEC), r["doc_id"]


def test_plan_is_single_scan_no_shuffle(spark):
    from tests.plan_utils import formatted_plan

    df = spark.createDataFrame([(1, "the fox")], "doc_id long, text string")
    plan = formatted_plan(spec_encode(df, SPEC))
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan


def test_cli_tokenizer_encode_routes_wordpiece(spark, tmp_path, capsys):
    """`tokenizer --op encode` on a WordPiece tokenizer.json routes
    to operators/wordpiece.py (tokenio stays frozen this round) and
    the written ids equal the driver twin; --sample-alpha is a clear
    error for the deterministic WordPiece encoder."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    model = tmp_path / "tokenizer.json"
    model.write_text(json.dumps(_doc()))
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "The quick brown fox jumps!"), (2, "unaffable jumpers")],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "ids")
    assert cli.main(
        ["tokenizer", "--op", "encode", "--model", str(model),
         "--input", src, "--output", out]
    ) == 0
    assert "WordPiece" in capsys.readouterr().out
    spec = from_wordpiece_json(json.dumps(_doc()))
    got = {r["doc_id"]: r["token_ids"] for r in spark.read.parquet(out).collect()}
    assert got[1] == encode_text("The quick brown fox jumps!", spec)
    assert got[2] == encode_text("unaffable jumpers", spec)
    with pytest.raises(SystemExit) as exc:
        cli.main(
            ["tokenizer", "--op", "encode", "--model", str(model),
             "--input", src, "--output", out, "--sample-alpha", "0.1"]
        )
    assert exc.value.code == 2


# ---- added-token atomic matching (ADVICE r18, fixed r19) -------------------


def test_added_tokens_match_atomically_in_raw_text():
    """HF splits on added/special tokens BEFORE normalization:
    '[MASK]' in running text emits id 25 atomically — it is never
    lowercased to '[mask]' or punctuation-split into '[', 'mask',
    ']'. Expected streams hand-computed."""
    spec = from_wordpiece_json(json.dumps(_doc()))
    assert encode_text("The [MASK] fox jumps!", spec) == (
        ids("the") + [25] + ids("fox", "jump", "##s", "!")
    )
    # adjacent, no whitespace: segments re-pretokenize independently
    # ('ed' is segment-initial, so no ## continuation; not in vocab
    # un-prefixed -> all-or-nothing unk)
    assert encode_text("un[MASK]ed", spec) == (
        ids("un") + [25] + ids("[UNK]")
    )
    # twice in a row
    assert encode_text("[MASK][MASK]", spec) == [25, 25]
    # WITHOUT the added token registered, the same text goes through
    # normalize + punctuation split (the pre-fix behavior — kept as
    # the contrast pin: '[', 'mask', ']' are all OOV here)
    bare = from_wordpiece_json(json.dumps(_doc(added_tokens=[])))
    assert encode_text("[MASK]", bare) == ids("[UNK]", "[UNK]", "[UNK]")


def test_added_token_longest_match_wins():
    """At a shared prefix the LONGEST added token matches (the HF
    order), not the first-listed."""
    doc = _doc(
        added_tokens=[
            {"content": "<m>", "id": 25},
            {"content": "<m>x", "id": 26},
        ]
    )
    spec = from_wordpiece_json(json.dumps(doc))
    assert encode_text("the <m>x", spec) == ids("the") + [26]
    assert encode_text("the <m>y", spec) == ids("the") + [25, VOCAB["[UNK]"]]


def test_added_token_unsupported_matching_flags_are_refused():
    """encode matches added tokens as raw exact substrings — a file
    asking for lstrip/rstrip/single_word/normalized matching would
    tokenize differently, so the loader refuses it loudly."""
    for flag in ("single_word", "lstrip", "rstrip", "normalized"):
        doc = _doc(added_tokens=[{"content": "[MASK]", "id": 25, flag: True}])
        with pytest.raises(ValueError, match="matching"):
            from_wordpiece_json(json.dumps(doc))
    # explicit-false flags are the defaults this engine reproduces
    doc = _doc(added_tokens=[{
        "content": "[MASK]", "id": 25, "special": True,
        "single_word": False, "lstrip": False, "rstrip": False,
        "normalized": False,
    }])
    assert from_wordpiece_json(json.dumps(doc)).added_tokens["[MASK]"] == 25


# ---- generic loader dispatch (r19: tokenio.load_tokenizer_spec) ------------


def test_load_tokenizer_spec_dispatches_wordpiece(spark, tmp_path):
    """tokenio.load_tokenizer_spec is the generic tokenizer.json
    entry point since r19: WordPiece files come back as a
    WordPieceSpec that encodes exactly like from_wordpiece_json's."""
    from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
        TokenizerSpec,
        load_tokenizer_spec,
    )

    path = tmp_path / "wp.json"
    path.write_text(json.dumps(_doc()))
    spec = load_tokenizer_spec(spark, str(path))
    assert isinstance(spec, WordPieceSpec)
    for text, want in CASES:
        assert encode_text(text, spec) == want
    # non-WordPiece files still return a TokenizerSpec
    bpe = tmp_path / "bpe.json"
    bpe.write_text(json.dumps({
        "version": "1.0",
        "pre_tokenizer": {"type": "WhitespaceSplit"},
        "model": {
            "type": "BPE", "unk_token": "<unk>",
            "vocab": {"<unk>": 0, "a": 1, "b": 2, "ab": 3},
            "merges": ["a b"],
        },
    }))
    assert isinstance(load_tokenizer_spec(spark, str(bpe)), TokenizerSpec)
    # a top-level JSON array hits the shared one-object error (ADVICE
    # r18: the CLI's old sniffing raised AttributeError here)
    arr = tmp_path / "arr.json"
    arr.write_text("[1, 2]")
    with pytest.raises(ValueError, match="one JSON object"):
        load_tokenizer_spec(spark, str(arr))


def test_wordpiece_spec_decode_df_round_trips(spark):
    """spec_decode_df is decode_ids' distributed twin: encode ->
    decode round-trips normalized, whitespace-canonical, in-vocab
    text (the achievable WordPiece round-trip)."""
    from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
        spec_decode_df,
    )

    # words that split into continuations re-fuse on decode, so
    # normalized in-vocab text round-trips exactly
    texts = ["the quick brown fox", "jumps", "unaffable"]
    want = ["the quick brown fox", "jumps", "unaffable"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ids_df = spec_encode(df, SPEC)
    got = {
        r["doc_id"]: r["text"]
        for r in spec_decode_df(ids_df, SPEC).collect()
    }
    assert [got[i] for i in range(len(texts))] == want


def test_report_and_utilization_accept_wordpiece_spec(spark):
    """r19: the fitness report and the utilization table serve
    WordPiece specs through the same aggregate path as BPE specs
    (their encode legs dispatch on the spec family)."""
    from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
        tokenizer_report_spec,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.tokeval import (
        vocab_utilization,
    )

    df = spark.createDataFrame(
        [(1, "the quick fox zzz"), (2, "jumping over the lazy dog")],
        "doc_id long, text string",
    )
    rep = tokenizer_report_spec(df, SPEC, slice_col=None).collect()
    assert len(rep) == 1
    # 'zzz' is the one OOV word (1 unk of 4+6 tokens — hand-counted:
    # the,quick,fox,[UNK] + jump,##ing,over,the,lazy,dog)
    assert rep[0]["n_tokens"] == 10
    assert rep[0]["oov_rate"] == pytest.approx(0.1)
    util = vocab_utilization(df, SPEC).collect()
    assert len(util) == 1
    # distinct ids exercised: the,quick,fox,[UNK],jump,##ing,over,
    # lazy,dog = 9
    assert util[0]["distinct_ids"] == 9
    assert util[0]["n_tokens"] == 10


def test_cli_tokenizer_wordpiece_lifecycle(spark, tmp_path, capsys):
    """r19: beyond --op encode, the tokenizer verb serves WordPiece
    files for decode/report/utilization through load_tokenizer_spec's
    generic dispatch, refuses --op prune (no merges to prune), and
    rejects --sample-seed like --sample-alpha (WordPiece encoding is
    deterministic)."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    model = tmp_path / "tokenizer.json"
    model.write_text(json.dumps(_doc()))
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "the quick fox"), (2, "jumps over the lazy dog")],
        "doc_id long, text string",
    ).write.parquet(src)
    ids_out = str(tmp_path / "ids")
    assert cli.main(
        ["tokenizer", "--op", "encode", "--model", str(model),
         "--input", src, "--output", ids_out]
    ) == 0
    capsys.readouterr()

    # decode: the distributed inverse round-trips the (already
    # normalized, in-vocab) inputs exactly
    texts_out = str(tmp_path / "texts")
    assert cli.main(
        ["tokenizer", "--op", "decode", "--model", str(model),
         "--input", ids_out, "--output", texts_out]
    ) == 0
    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(texts_out).collect()
    }
    assert got == {1: "the quick fox", 2: "jumps over the lazy dog"}

    # report + utilization run (correctness of the numbers is pinned
    # in test_report_and_utilization_accept_wordpiece_spec)
    assert cli.main(
        ["tokenizer", "--op", "report", "--model", str(model),
         "--input", src]
    ) == 0
    assert "oov" in capsys.readouterr().out
    assert cli.main(
        ["tokenizer", "--op", "utilization", "--model", str(model),
         "--input", src]
    ) == 0
    assert "coverage" in capsys.readouterr().out

    # prune (r19): real support — the pruned file loads back and
    # re-encodes the measured corpus to the identical pieces with
    # remapped ids (the subset-vocab greedy theorem; pinned in depth
    # by tests/test_vocabprune.py's WordPiece cases)
    pruned_path = str(tmp_path / "pruned.json")
    remap_path = str(tmp_path / "remap")
    assert cli.main(
        ["tokenizer", "--op", "prune", "--model", str(model),
         "--input", src, "--output", pruned_path,
         "--remap-output", remap_path]
    ) == 0
    assert "pruned WordPiece vocab" in capsys.readouterr().out
    from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
        load_tokenizer_spec,
    )

    pruned = load_tokenizer_spec(spark, pruned_path)
    assert isinstance(pruned, WordPieceSpec)
    assert len(pruned.vocab) <= len(VOCAB) + 1  # +1: [MASK] added token
    remap = {
        r["old_id"]: r["new_id"]
        for r in spark.read.parquet(remap_path).collect()
    }
    spec = from_wordpiece_json(json.dumps(_doc()))
    for t in ("the quick fox", "jumps over the lazy dog"):
        assert encode_text(t, pruned) == [
            remap[i] for i in encode_text(t, spec)
        ]

    # --sample-seed is BPE/Unigram subword regularization
    with pytest.raises(SystemExit) as exc:
        cli.main(
            ["tokenizer", "--op", "encode", "--model", str(model),
             "--input", src, "--output", ids_out, "--sample-seed", "7"]
        )
    assert exc.value.code == 2


def test_cli_wordpiece_sample_seed_zero_also_rejected(spark, tmp_path):
    """Review r19: --sample-seed defaults to None so EXPLICIT use is
    always detectable — `--sample-seed 0` exits 2 on the WordPiece
    route exactly like any other seed."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    model = tmp_path / "tokenizer.json"
    model.write_text(json.dumps(_doc()))
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "the fox")], "doc_id long, text string"
    ).write.parquet(src)
    with pytest.raises(SystemExit) as exc:
        cli.main(
            ["tokenizer", "--op", "encode", "--model", str(model),
             "--input", src, "--output", str(tmp_path / "o"),
             "--sample-seed", "0"]
        )
    assert exc.value.code == 2


def test_encode_for_spec_dispatch_and_refusals(spark):
    """tokenio.encode_for_spec is THE family dispatch (review r19:
    previously copy-pasted at four call sites): WordPieceSpec routes
    to the wordpiece kernel, sampling knobs refuse loudly, and
    cache_cap (an implementation bound, not semantics) is ignored."""
    from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
        decode_for_spec,
        encode_for_spec,
    )

    df = spark.createDataFrame(
        [(1, "the quick fox")], "doc_id long, text string"
    )
    ids = encode_for_spec(df, SPEC)
    got = ids.collect()[0]["token_ids"]
    assert got == encode_text("the quick fox", SPEC)
    # cache_cap ignored, not refused
    assert encode_for_spec(df, SPEC, cache_cap=10).collect()[0][
        "token_ids"
    ] == got
    with pytest.raises(ValueError, match="deterministic"):
        encode_for_spec(df, SPEC, sample_alpha=0.1)
    with pytest.raises(ValueError, match="sample_seed"):
        encode_for_spec(df, SPEC, sample_seed=0)
    back = decode_for_spec(ids, SPEC).collect()[0]["text"]
    assert back == "the quick fox"
