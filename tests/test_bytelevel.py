"""operators/bytelevel.py + tokenio spec API: byte-level (GPT-2
family) BPE — load a real-shaped tokenizer.json, encode distributed,
round-trip text exactly, train a loadable byte-level model.

The expected values come from an INDEPENDENT reference implementation
in this file (the published bytes_to_unicode construction and the
iterative lowest-rank-first BPE of the openai/gpt-2 encoder), so the
tests are differential, not self-referential: the operator applies
merges as sequential rank-order passes, the reference merges the
lowest-rank adjacent pair repeatedly — agreement is exactly the
well-formed-table equivalence the repo's tokenizer contract claims.
"""

from __future__ import annotations

import json
import os

import pytest

from utc_cuip_kafka_aws_connector_spark.operators.bytelevel import (
    byte_level_histogram,
    byte_level_train,
    byte_level_vocab,
    byte_pretokenize,
    byte_symbols_to_text,
    byte_to_unicode,
    decode_byte_ids,
    spec_encode,
    text_to_byte_symbols,
    unicode_to_byte,
)
from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
    TokenizerSpec,
    from_tokenizer_json,
    from_tokenizer_json_spec,
    load_tokenizer_spec,
    save_tokenizer,
    to_tokenizer_json,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "byte_level_tokenizer.json")
SF = "/root/testdata/sf0.001"


# --- independent reference implementation (public algorithm) -------------


def _ref_bytes_to_unicode() -> dict[int, str]:
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _ref_bpe(symbols: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Iterative lowest-rank-first merging (the gpt-2 encoder loop)."""
    word = list(symbols)
    while len(word) > 1:
        pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, (a, b) = min(ranked)
        out, i = [], 0
        while i < len(word):
            if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(word[i])
                i += 1
        word = out
    return word


def _ref_encode(text: str, spec: TokenizerSpec) -> list[int]:
    table = _ref_bytes_to_unicode()
    ranks = {pair: r for r, pair in enumerate(spec.merges)}
    ids: list[int] = []
    for piece in byte_pretokenize(text, spec.add_prefix_space, spec.use_regex):
        symbols = "".join(table[b] for b in piece.encode("utf-8"))
        for tok in _ref_bpe(symbols, ranks):
            ids.append(spec.vocab[tok])
    return ids


# --- alphabet + pretokenizer --------------------------------------------


def test_alphabet_is_the_published_bijection():
    table = byte_to_unicode()
    assert table == _ref_bytes_to_unicode()
    assert len(set(table.values())) == 256
    assert table[ord("a")] == "a" and table[ord("!")] == "!"
    assert table[ord(" ")] == "Ġ"  # the famous Ġ
    assert table[0] == "Ā"
    assert unicode_to_byte() == {c: b for b, c in table.items()}


def test_symbols_roundtrip_any_text():
    for s in ["hello world", "naïve £5 — ≠ 😀", "\t\nmixed\x00bytes\xff"]:
        assert byte_symbols_to_text(text_to_byte_symbols(s)) == s


def test_gpt2_pretokenize_vectors():
    assert byte_pretokenize("Hello world's  end.") == [
        "Hello", " world", "'s", " ", " end", ".",
    ]
    assert byte_pretokenize("a1b2") == ["a", "1", "b", "2"]
    assert byte_pretokenize("x  ") == ["x", "  "]
    assert byte_pretokenize("tab\tsep") == ["tab", "\t", "sep"]
    assert byte_pretokenize("hi", add_prefix_space=True) == [" hi"]
    assert byte_pretokenize("a b", use_regex=False) == ["a b"]
    # the split is a partition: pieces concatenate back to the text
    for t in ["Hello, wörld!  123 it's\n\ndone ", "", "  ", "a"]:
        assert "".join(byte_pretokenize(t)) == t


def test_exact_unicode_classes_with_regex_module():
    """With the `regex` module available (this container has it), the
    split runs the EXACT published pattern: Nl/No characters are
    \\p{N}, so a roman numeral breaks a letter run."""
    pytest.importorskip("regex")
    assert byte_pretokenize("xⅫy") == ["x", "Ⅻ", "y"]  # U+216B is Nl
    assert byte_pretokenize("a½") == ["a", "½"]          # U+00BD is No


# --- fixture load + encode parity ---------------------------------------


@pytest.fixture(scope="module")
def fixture_spec():
    with open(FIXTURE) as fh:
        return from_tokenizer_json_spec(fh.read()), fh


def test_fixture_loads_as_byte_level(fixture_spec):
    spec, _ = fixture_spec
    assert spec.byte_level and not spec.add_prefix_space and spec.use_regex
    assert spec.unk_token is None and not spec.byte_fallback
    assert spec.added_tokens == {"<|endoftext|>": 268}
    assert spec.vocab["<|endoftext|>"] == 268
    assert len(spec.merges) == 12 and spec.merges[0] == ("Ġ", "t")


def test_legacy_loader_still_refuses_byte_level():
    with open(FIXTURE) as fh:
        text = fh.read()
    with pytest.raises(ValueError, match="byte-level"):
        from_tokenizer_json(text)


def test_spec_encode_matches_reference_on_fixture(spark, fixture_spec):
    spec, _ = fixture_spec
    texts = [
        "the world",
        "Hello the world's end",
        "tabs\tand\nnewlines  end",
        "unicode: naïve £5 😀",
        "",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r.token_ids for r in spec_encode(df, spec).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _ref_encode(t, spec), t
    # known-merge smoke: " the" is one token, " world" is one token
    the_ids = got[0]
    inv = {i: t for t, i in spec.vocab.items()}
    assert [inv[i] for i in the_ids] == ["t", "he", "Ġworld"]


def test_byte_level_decode_roundtrips_text_exactly(spark, fixture_spec):
    spec, _ = fixture_spec
    texts = ["the world  ends\there", "ȧccents & emoji 😀 'll"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r.token_ids for r in spec_encode(df, spec).collect()}
    for i, t in enumerate(texts):
        assert decode_byte_ids(got[i], spec.vocab) == t


def test_spec_encode_raises_on_unrepresentable_miss(spark):
    # a crippled byte-level vocab missing most bytes, no unk, no
    # fallback: loud failure, not a silent drop
    spec = TokenizerSpec(
        merges=[], vocab={"a": 0}, unk_token=None, byte_level=True
    )
    df = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(Exception, match="outside the vocab"):
        spec_encode(df, spec).collect()


def test_byte_fallback_escapes_unknown_chars(spark):
    # char-level model: 'é' is outside the vocab; byte_fallback maps
    # it to its UTF-8 bytes <0xC3><0xA9> (the Llama convention)
    vocab = {"a": 0, "b": 1, "<0xC3>": 2, "<0xA9>": 3}
    spec = TokenizerSpec(
        merges=[], vocab=vocab, unk_token=None,
        byte_level=False, byte_fallback=True,
    )
    df = spark.createDataFrame([(0, "ab éa")], "doc_id long, text string")
    (row,) = spec_encode(df, spec).collect()
    assert row.token_ids == [0, 1, 2, 3, 0]


def test_spec_rejects_sections_that_change_ids(fixture_spec):
    spec, _ = fixture_spec
    with open(FIXTURE) as fh:
        base = json.load(fh)
    bad_norm = dict(base, normalizer={"type": "NFC"})
    with pytest.raises(ValueError, match="normalizer"):
        from_tokenizer_json_spec(json.dumps(bad_norm))
    # Metaspace became a supported pre_tokenizer at r12 (see
    # tests/test_unigram.py); Whitespace (the \w+|[^\w\s]+ REGEX
    # splitter — a different segmentation than WhitespaceSplit)
    # remains unsupported.
    bad_pre = dict(base, pre_tokenizer={"type": "Whitespace"})
    with pytest.raises(ValueError, match="pre_tokenizer"):
        from_tokenizer_json_spec(json.dumps(bad_pre))
    bad_post = dict(base, post_processor={"type": "RobertaProcessing"})
    with pytest.raises(ValueError, match="post_processor"):
        from_tokenizer_json_spec(json.dumps(bad_post))
    bad_tpl = dict(
        base,
        post_processor={
            "type": "TemplateProcessing",
            "single": [{"SpecialToken": {"id": "<missing>", "type_id": 0}}],
        },
    )
    with pytest.raises(ValueError, match="not in the vocab"):
        from_tokenizer_json_spec(json.dumps(bad_tpl))
    bad_top = dict(base, mystery_section=1)
    with pytest.raises(ValueError, match="unsupported tokenizer sections"):
        from_tokenizer_json_spec(json.dumps(bad_top))
    bad_trunc = dict(base, truncation={"type": "LongestFirst", "max_length": 2})
    with pytest.raises(ValueError, match="truncation"):
        from_tokenizer_json_spec(json.dumps(bad_trunc))
    clash = json.loads(json.dumps(base))
    clash["added_tokens"][0]["id"] = 5  # "Ā" already holds vocab id 0
    clash["added_tokens"][0]["content"] = "Ā"
    with pytest.raises(ValueError, match="conflicts"):
        from_tokenizer_json_spec(json.dumps(clash))


# --- train-side flag: learn byte-level, save, reload, re-encode ----------


@pytest.fixture(scope="module")
def byte_trained(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges_df = byte_level_train(docs, n_merges=12)
    merges = [
        (r.lhs, r.rhs) for r in merges_df.orderBy("merge_rank").collect()
    ]
    return docs, merges, byte_level_vocab(merges)


def test_byte_level_train_learns_wellformed_space_merges(byte_trained):
    _, merges, vocab = byte_trained
    assert len(merges) == 12
    # well-formed: each side is an alphabet symbol or an earlier product
    produced = {c for b, c in byte_to_unicode().items()}
    for a, b in merges:
        assert a in produced and b in produced, (a, b)
        produced.add(a + b)
    # byte-level corpora are dominated by space-prefixed merges
    assert any(a.startswith("Ġ") or "Ġ" in a + b for a, b in merges)
    assert list(vocab.values()) == list(range(len(vocab)))


def test_byte_level_roundtrip_through_tokenizer_json(spark, byte_trained, tmp_path):
    docs, merges, vocab = byte_trained
    path = str(tmp_path / "byte_tokenizer.json")
    save_tokenizer(spark, path, merges, vocab, byte_level=True)
    spec = load_tokenizer_spec(spark, path)
    assert spec.byte_level and spec.unk_token is None
    assert spec.merges == merges and spec.vocab == vocab
    direct = TokenizerSpec(
        merges=merges, vocab=vocab, unk_token=None, byte_level=True
    )
    sample = docs.limit(40)
    a = {r.doc_id: r.token_ids for r in spec_encode(sample, direct).collect()}
    b = {r.doc_id: r.token_ids for r in spec_encode(sample, spec).collect()}
    assert a == b and a
    # byte-level contract: decode reproduces the document EXACTLY
    texts = {r.doc_id: r.text for r in sample.select("doc_id", "text").collect()}
    for did, ids in a.items():
        assert decode_byte_ids(ids, vocab) == texts[did]


def test_byte_level_json_shape(byte_trained):
    _, merges, vocab = byte_trained
    doc = json.loads(to_tokenizer_json(merges, vocab, byte_level=True))
    assert doc["pre_tokenizer"]["type"] == "ByteLevel"
    assert doc["decoder"]["type"] == "ByteLevel"
    assert doc["model"]["unk_token"] is None


def test_byte_histogram_matches_driver_pretokenize(spark):
    texts = ["the cat  sat", "the cat", "tab\tend"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.word: r.freq
        for r in byte_level_histogram(df.repartition(3)).collect()
    }
    want: dict[str, int] = {}
    for t in texts:
        for piece in byte_pretokenize(t):
            sym = text_to_byte_symbols(piece)
            want[sym] = want.get(sym, 0) + 1
    assert got == want


def test_ranked_encoder_equals_sequential_passes_on_wellformed_tables():
    """spec_encode's lowest-rank-first kernel (O(1) in table size) and
    the sequential-pass kernel the oracle replays
    (tokenizer.bpe_encode_word) are bit-identical on WELL-FORMED merge
    tables — the repo's pinned equivalence, differentialed here on the
    committed fixture's merges and on randomized learned-style tables."""
    import random

    from utc_cuip_kafka_aws_connector_spark.operators.bytelevel import (
        ranked_bpe_encode,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.tokenizer import (
        bpe_encode_word,
    )

    with open(FIXTURE) as fh:
        spec = from_tokenizer_json_spec(fh.read())
    ranks = {p: r for r, p in enumerate(spec.merges)}
    table = byte_to_unicode()
    for text in ["the world ends", "written words formed here", "aaaa bb"]:
        for piece in byte_pretokenize(text):
            syms = text_to_byte_symbols(piece)
            assert ranked_bpe_encode(syms, ranks) == bpe_encode_word(
                syms, spec.merges
            ), piece

    # randomized well-formed tables over a tiny alphabet: each merge
    # side is a base char or an earlier product (the learned-table
    # invariant)
    for seed in range(8):
        rng = random.Random(seed)
        produced = ["a", "b", "c"]
        merges = []
        for _ in range(12):
            x, y = rng.choice(produced), rng.choice(produced)
            merges.append((x, y))
            produced.append(x + y)
        ranks2 = {p: r for r, p in enumerate(dict.fromkeys(merges))}
        # dedupe preserving first occurrence, as a learner would
        uniq = list(dict.fromkeys(merges))
        for _ in range(40):
            w = "".join(rng.choice("abc") for _ in range(rng.randrange(1, 14)))
            assert ranked_bpe_encode(w, ranks2) == bpe_encode_word(w, uniq), (
                seed, w, uniq,
            )


# --- Llama-family (sentencepiece-style) fixture --------------------------

LLAMA_FIXTURE = os.path.join(
    os.path.dirname(__file__), "data", "llama_like_tokenizer.json"
)


@pytest.fixture(scope="module")
def llama_spec():
    with open(LLAMA_FIXTURE) as fh:
        return from_tokenizer_json_spec(fh.read())


def test_llama_fixture_loads_with_normalizers_and_specials(llama_spec):
    spec = llama_spec
    assert not spec.byte_level and spec.byte_fallback
    assert spec.split_mode == "none"  # absent pre_tokenizer = no split
    assert spec.normalizers == [
        ("prepend", "▁"), ("replace", " ", "▁"),
    ]
    assert spec.special_prefix == [1] and spec.special_suffix == []
    assert spec.unk_token == "<unk>" and spec.vocab["<unk>"] == 0
    assert spec.vocab["<0x00>"] == 3 and spec.vocab["<0xFF>"] == 258


def test_legacy_loader_refuses_sentencepiece_shape():
    with open(LLAMA_FIXTURE) as fh:
        text = fh.read()
    # byte_fallback trips first; a fallback-free sentencepiece file
    # trips the normalizer/specials check
    with pytest.raises(ValueError, match="from_tokenizer_json_spec"):
        from_tokenizer_json(text)
    doc = json.loads(text)
    doc["model"]["byte_fallback"] = False
    with pytest.raises(ValueError, match="sentencepiece-style"):
        from_tokenizer_json(json.dumps(doc))


def test_llama_encode_matches_hand_derivation(spark, llama_spec):
    """"the world" -> "▁the▁world" -> the merge cascade ends at
    [▁the, ▁world]; 'é' (not in vocab) escapes via byte_fallback to
    <0xC3><0xA9>; specials wrap only when asked."""
    spec = llama_spec
    inv = {i: t for t, i in spec.vocab.items()}
    df = spark.createDataFrame(
        [(0, "the world"), (1, "worlds and é"), (2, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.token_ids for r in spec_encode(df, spec).collect()}
    assert [inv[i] for i in got[0]] == ["▁the", "▁world"]
    # "worlds and é" -> "▁worlds▁and▁é"; the merge cascade yields
    # [▁world, s, ▁and, ▁, é]; 's' and 'é' are outside the vocab, so
    # byte_fallback escapes them (it wins over unk, the HF order)
    assert [inv[i] for i in got[1]] == [
        "▁world", "<0x73>", "▁and", "▁", "<0xC3>", "<0xA9>",
    ]
    assert got[2] == []  # HF Prepend is a no-op on the empty string
    wrapped = {
        r.doc_id: r.token_ids
        for r in spec_encode(df, spec, add_special_tokens=True).collect()
    }
    assert wrapped[0][0] == 1 and wrapped[0][1:] == got[0]
    assert wrapped[2] == [1]


def test_llama_decode_roundtrips(spark, llama_spec):
    from utc_cuip_kafka_aws_connector_spark.operators.bytelevel import (
        spec_decode,
    )

    spec = llama_spec
    texts = ["the world", "and the théorld", "worlds and é"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    for flag in (False, True):
        got = {
            r.doc_id: r.token_ids
            for r in spec_encode(
                df, spec, add_special_tokens=flag
            ).collect()
        }
        for i, t in enumerate(texts):
            assert spec_decode(got[i], spec) == t, (flag, t)


def test_llama_whole_text_is_one_sequence(spark, llama_spec):
    """split_mode 'none': merges can cross what whitespace would have
    split — '▁and' exists because the space became ▁ IN the sequence,
    and a cross-boundary merge like (d, ▁an) would be reachable if
    ranked; pin that the text is NOT whitespace-pre-split by checking
    a merge that consumes the ▁ between words."""
    spec = llama_spec
    inv = {i: t for t, i in spec.vocab.items()}
    df = spark.createDataFrame([(0, "world and")], "doc_id long, text string")
    (row,) = spec_encode(df, spec).collect()
    toks = [inv[i] for i in row.token_ids]
    assert toks == ["▁world", "▁and"]  # ▁and spans the original space


# --- hypothesis properties (the repo's §5.2 idiom) -----------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# any unicode text, surrogates excluded (not UTF-8 encodable)
any_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=120
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(any_text, min_size=1, max_size=5))
def test_hypothesis_byte_level_roundtrip_any_text(spark, fixture_spec, texts):
    """Byte-level's headline property, over ARBITRARY unicode: decode
    (encode(text)) == text exactly — total byte coverage means no
    text can fail to round-trip."""
    spec, _ = fixture_spec
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: r.token_ids for r in spec_encode(df, spec).collect()}
    for i, t in enumerate(texts):
        assert decode_byte_ids(got[i], spec.vocab) == t


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(any_text.map(lambda s: s.replace("▁", "")), min_size=1, max_size=4))
def test_hypothesis_llama_shape_roundtrip(spark, llama_spec, texts):
    """Sentencepiece-shape round trip over arbitrary text not
    containing the ▁ marker itself (the one character the normalizer
    inverse cannot distinguish from a rewritten space)."""
    from utc_cuip_kafka_aws_connector_spark.operators.bytelevel import (
        spec_decode,
    )

    spec = llama_spec
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: r.token_ids
        for r in spec_encode(df, spec, add_special_tokens=True).collect()
    }
    for i, t in enumerate(texts):
        assert spec_decode(got[i], spec) == t


def test_spec_decode_df_round_trips_all_shapes(spark, tmp_path, capsys):
    """Distributed decode inverts distributed encode for the
    byte-level shape (exact round trip) and the CLI decode verb
    closes the encode->decode loop on real testdata."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli
    from utc_cuip_kafka_aws_connector_spark.operators.bytelevel import (
        spec_decode_df,
        spec_encode,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
        from_tokenizer_json_spec,
        to_tokenizer_json,
    )

    inp = "/root/testdata/sf0.001/documents.parquet"
    model = str(tmp_path / "bl.json")
    ids_out = str(tmp_path / "ids")
    texts_out = str(tmp_path / "texts")
    assert cli.main(
        ["tokenizer", "--op", "train", "--model", model,
         "--input", inp, "--merges", "8", "--byte-level"]
    ) == 0
    assert cli.main(
        ["tokenizer", "--op", "encode", "--model", model,
         "--input", inp, "--output", ids_out]
    ) == 0
    assert cli.main(
        ["tokenizer", "--op", "decode", "--model", model,
         "--input", ids_out, "--output", texts_out]
    ) == 0
    assert "decoded" in capsys.readouterr().out
    orig = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(inp).select("doc_id", "text").collect()
    }
    back = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(texts_out).collect()
    }
    assert back == orig  # byte-level: exact corpus round trip


def test_spec_encode_decode_keep_string_doc_ids(spark, fixture_spec):
    """ADVICE r12: the id column type must pass through verbatim —
    corpora keyed by string ids (url hashes, uuids) are as legitimate
    as longs, and semdecontam already honors that contract."""
    from utc_cuip_kafka_aws_connector_spark.operators.bytelevel import (
        spec_decode_df,
    )

    spec, _ = fixture_spec
    texts = {"doc/a": "the world", "doc/b": "Hello the world's end"}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id string, text string"
    )
    enc = spec_encode(df, spec)
    assert enc.schema["doc_id"].dataType.simpleString() == "string"
    got = {r.doc_id: r.token_ids for r in enc.collect()}
    assert set(got) == set(texts)
    dec = spec_decode_df(enc, spec)
    assert dec.schema["doc_id"].dataType.simpleString() == "string"
    assert {r.doc_id: r.text for r in dec.collect()} == texts
