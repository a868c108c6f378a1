"""operators/tokenio.py: tokenizer.json save/load round trip."""

from __future__ import annotations

import json

import pytest

from utc_cuip_kafka_aws_connector_spark.operators.encode import (
    bpe_encode,
    bpe_vocab,
    corpus_chars,
)
from utc_cuip_kafka_aws_connector_spark.operators.bpetrain import (
    bpe_train_merges,
)
from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
    from_tokenizer_json,
    load_tokenizer,
    save_tokenizer,
    to_tokenizer_json,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def trained(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = bpe_train_merges(docs, 8)
    vocab = bpe_vocab(merges, corpus_chars(docs))
    return docs, merges, vocab


def test_roundtrip_is_exact(spark, trained, tmp_path):
    _, merges, vocab = trained
    path = str(tmp_path / "tokenizer.json")
    save_tokenizer(spark, path, merges, vocab)
    merges2, vocab2 = load_tokenizer(spark, path)
    assert merges2 == merges
    assert vocab2 == vocab


def test_loaded_model_encodes_identically(spark, trained, tmp_path):
    docs, merges, vocab = trained
    path = str(tmp_path / "tokenizer.json")
    save_tokenizer(spark, path, merges, vocab)
    merges2, vocab2 = load_tokenizer(spark, path)
    a = {r.doc_id: r.token_ids for r in bpe_encode(docs, merges, vocab).collect()}
    b = {r.doc_id: r.token_ids for r in bpe_encode(docs, merges2, vocab2).collect()}
    assert a == b


def test_document_shape_is_the_public_format(trained):
    _, merges, vocab = trained
    doc = json.loads(to_tokenizer_json(merges, vocab))
    assert doc["model"]["type"] == "BPE"
    assert doc["model"]["unk_token"] == "<unk>"
    assert doc["model"]["merges"][0].count(" ") == 1
    # vocab serialized in id order so diffs are stable
    ids = list(doc["model"]["vocab"].values())
    assert ids == sorted(ids)


def test_pair_style_merges_accepted(trained):
    _, merges, vocab = trained
    doc = json.loads(to_tokenizer_json(merges, vocab))
    doc["model"]["merges"] = [[a, b] for a, b in merges]  # tokenizers >= 0.20
    m2, v2 = from_tokenizer_json(json.dumps(doc))
    assert m2 == merges and v2 == vocab


def test_unsupported_models_fail_loudly(trained):
    _, merges, vocab = trained
    base = json.loads(to_tokenizer_json(merges, vocab))

    wrong_type = dict(base, model=dict(base["model"], type="WordPiece"))
    with pytest.raises(ValueError, match="model type"):
        from_tokenizer_json(json.dumps(wrong_type))

    # Unigram is supported since r12 — but only in its OWN serialized
    # shape; a BPE-shaped section relabeled Unigram still fails loudly
    mislabeled = dict(base, model=dict(base["model"], type="Unigram"))
    with pytest.raises(ValueError, match="Unigram model sections"):
        from_tokenizer_json(json.dumps(mislabeled))

    gpt2ish = dict(base, model=dict(base["model"], continuing_subword_prefix="##"))
    with pytest.raises(ValueError, match="continuing_subword_prefix"):
        from_tokenizer_json(json.dumps(gpt2ish))

    bf = dict(base, model=dict(base["model"], byte_fallback=True))
    with pytest.raises(ValueError, match="byte_fallback"):
        from_tokenizer_json(json.dumps(bf))

    alien = dict(base, model=dict(base["model"], mystery=1))
    with pytest.raises(ValueError, match="unsupported BPE model sections"):
        from_tokenizer_json(json.dumps(alien))

    bad_merge = dict(base, model=dict(base["model"], merges=["a b c"]))
    with pytest.raises(ValueError, match="malformed merge"):
        from_tokenizer_json(json.dumps(bad_merge))


def test_tokenizer_report_coverage_and_compression(spark, trained):
    from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
        tokenizer_report,
    )

    docs, merges, vocab = trained
    rows = tokenizer_report(docs, merges, vocab).collect()
    assert rows and {r.lang for r in rows} == {
        r.lang for r in docs.select("lang").distinct().collect()
    }
    for r in rows:
        # trained on this very corpus: zero OOV, and merges compress
        assert r.oov_rate == 0.0
        assert 1.0 < r.chars_per_token < 20.0
        # fertility: whitespace BPE emits at least one subword per
        # word and cannot emit more subwords than non-space chars —
        # chars/token * tokens/word = chars/word stays >= 1
        assert r.tokens_per_word >= 1.0
        assert r.chars_per_token * r.tokens_per_word >= 1.0
    # an alien-alphabet corpus shows up as OOV leakage
    alien = spark.createDataFrame(
        [(0, "σπάρκ γραφτ τεστ", "el")], "doc_id long, text string, lang string"
    )
    leak = tokenizer_report(alien, merges, vocab).first()
    assert leak.oov_rate == 1.0


def test_tokenizer_report_respects_external_unk_id(spark):
    """r10 ADVICE low: an external tokenizer.json whose unk is NOT id
    0 must report oov against ITS unk id — id 0 is a real token
    there, and counting it as unk corrupts oov_rate both ways."""
    from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
        tokenizer_report,
    )

    # external-style vocab: 'a' holds id 0, unk sits at id 3
    vocab = {"a": 0, "b": 1, "c": 2, "<unk>": 3}
    docs = spark.createDataFrame(
        [(0, "a b a", "en"), (1, "a z", "en")], "doc_id long, text string, lang string"
    )
    rep = tokenizer_report(docs, [], vocab).first()
    # 5 tokens total, exactly one miss ('z') -> 1/5; the three id-0
    # 'a' tokens must NOT count
    assert rep.n_tokens == 5 and rep.oov_rate == 0.2

    # no unk declared: the one miss ('z') still counts via the -1
    # sentinel and the id-0 'a' hits still don't
    rep2 = tokenizer_report(docs, [], {"a": 0, "b": 1}, unk_token=None).first()
    assert rep2.oov_rate == pytest.approx(1 / 5)


def test_legacy_loader_rejects_external_whole_text_files():
    """ADVICE r12: a no-pre_tokenizer file that is NOT this repo's
    pre-r12 bare shape follows the sentencepiece whole-text
    convention — the legacy whitespace-splitting API must reject it
    toward the spec path instead of silently mis-tokenizing."""
    import json as _json

    import pytest as _pytest

    from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
        from_tokenizer_json,
    )

    model = {
        "type": "BPE",
        "unk_token": "<unk>",
        "vocab": {"<unk>": 0, "a": 1, "b": 2, "ab": 3},
        "merges": ["a b"],
    }
    # the pre-r12 bare emission still loads (back-compat contract)
    merges, vocab = from_tokenizer_json(
        _json.dumps({"version": "1.0", "model": model})
    )
    assert merges == [("a", "b")] and vocab["ab"] == 3
    # an external whole-text file (extra benign top-level section, no
    # pre_tokenizer) is rejected loudly
    ext = {"version": "1.0", "truncation": None, "model": model}
    with _pytest.raises(ValueError, match="no pre_tokenizer"):
        from_tokenizer_json(_json.dumps(ext))
    # extra model-section keys equally mark an external file
    ext2 = {"version": "1.0", "model": dict(model, dropout=None)}
    with _pytest.raises(ValueError, match="no pre_tokenizer"):
        from_tokenizer_json(_json.dumps(ext2))
