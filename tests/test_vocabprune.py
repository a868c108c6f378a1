"""operators/vocabprune.py: tokenizer vocabulary pruning.

Evidence: corpus re-encode identity (documents whose encodings used
only kept tokens produce the IDENTICAL piece sequence under the
pruned spec, ids remapped), encodability floor (out-of-corpus text
still encodes — falls back to smaller pieces, byte-level and
char-level+unk both), merge-decomposition closure (every surviving
merge's parts are in the vocab; chained merges resolve), contiguous
remapping in original-id order, vocab shrinkage, added/special-token
survival, and Unigram refusal.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.bytelevel import (
    byte_level_vocab,
    spec_encode,
)
from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
    TokenizerSpec,
)
from utc_cuip_kafka_aws_connector_spark.operators.vocabprune import (
    prune_spec,
    prune_to_corpus,
    used_token_ids,
)


def _char_spec():
    # chained merges: (a,b)->ab, (ab,c)->abc; plus an unused (x,y)
    merges = [("a", "b"), ("ab", "c"), ("x", "y")]
    vocab = {}
    for t in ["a", "b", "c", "x", "y", "z", "<unk>"]:
        vocab[t] = len(vocab)
    for a, b in merges:
        vocab[a + b] = len(vocab)
    return TokenizerSpec(
        merges=merges, vocab=vocab, unk_token="<unk>", byte_level=False
    )


def test_prune_to_corpus_reencode_identity_and_shrink(spark):
    spec = _char_spec()
    df = spark.createDataFrame(
        [(0, "abc ab"), (1, "abc z")], "doc_id long, text string"
    )
    before = {
        r.doc_id: r.token_ids for r in spec_encode(df, spec).collect()
    }
    pruned, remap = prune_to_corpus(df, spec)
    after = {
        r.doc_id: r.token_ids for r in spec_encode(df, pruned).collect()
    }
    for i in before:
        assert after[i] == [remap[t] for t in before[i]]
    # unused merge (x,y) and tokens absent from corpus closure pruned
    assert "xy" not in pruned.vocab
    assert ("x", "y") not in pruned.merges
    assert len(pruned.vocab) < len(spec.vocab)
    # contiguous ids in original order
    assert sorted(pruned.vocab.values()) == list(range(len(pruned.vocab)))
    old_order = sorted(remap, key=lambda o: o)
    assert [remap[o] for o in old_order] == sorted(remap.values())


def test_closure_keeps_merge_parts_and_alphabet(spark):
    spec = _char_spec()
    # only "abc" (the chained product) is used: closure must pull in
    # ab -> a, b; alphabet keeps c,x,y,z anyway
    abc_id = spec.vocab["abc"]
    pruned, _ = prune_spec(spec, [abc_id])
    assert {"a", "b", "ab", "abc"} <= set(pruned.vocab)
    assert {"x", "y", "z", "c"} <= set(pruned.vocab)  # alphabet floor
    assert "xy" not in pruned.vocab
    for a, b in pruned.merges:
        assert a in pruned.vocab and b in pruned.vocab
        assert a + b in pruned.vocab


def test_out_of_corpus_text_still_encodes(spark):
    spec = _char_spec()
    df = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    pruned, _ = prune_to_corpus(df, spec)
    assert "abc" not in pruned.vocab  # never produced by the corpus
    unseen = spark.createDataFrame([(9, "abc zq")], "doc_id long, text string")
    [r] = spec_encode(unseen, pruned).collect()
    # abc falls back to [ab][c]; q (not even in original vocab) -> unk
    toks = {i: t for t, i in pruned.vocab.items()}
    assert [toks[t] for t in r.token_ids] == ["ab", "c", "z", "<unk>"]


def test_byte_level_alphabet_floor(spark):
    merges = [("Ġ", "t"), ("Ġt", "h")]
    spec = TokenizerSpec(
        merges=merges,
        vocab=byte_level_vocab(merges),
        unk_token=None,
        byte_level=True,
    )
    df = spark.createDataFrame([(0, "aa bb")], "doc_id long, text string")
    pruned, _ = prune_to_corpus(df, spec)
    assert len([t for t in pruned.vocab if len(t) == 1]) == 256
    assert "Ġth" not in pruned.vocab  # merge product unused
    # any text still encodes (total byte coverage survives)
    unseen = spark.createDataFrame([(1, "the quick")], "doc_id long, text string")
    [r] = spec_encode(unseen, pruned).collect()
    assert len(r.token_ids) > 0


def test_specials_survive_and_unigram_refused(spark):
    base = _char_spec()
    spec = TokenizerSpec(
        merges=base.merges,
        vocab={**base.vocab, "<pad>": 99},
        unk_token=base.unk_token,
        byte_level=False,
        added_tokens={"<pad>": 99},
    )
    pruned, remap = prune_spec(spec, [spec.vocab["z"]])
    assert "<unk>" in pruned.vocab and "<pad>" in pruned.vocab
    assert pruned.added_tokens == {"<pad>": remap[99]}
    uni = TokenizerSpec(
        merges=[], vocab={"a": 0}, unk_token=None, model_type="Unigram"
    )
    with pytest.raises(ValueError, match="BPE specs only"):
        prune_spec(uni, [0])
    with pytest.raises(ValueError, match="not in the spec vocab"):
        prune_spec(spec, [12345])


def test_used_ids_is_distinct_and_sorted(spark):
    spec = _char_spec()
    df = spark.createDataFrame(
        [(0, "ab ab ab"), (1, None)], "doc_id long, text string"
    )
    ids = used_token_ids(df, spec)
    assert ids == sorted(set(ids))
    assert spec.vocab["ab"] in ids


def test_template_specials_survive_unused(spark):
    """BOS/EOS ids referenced by TemplateProcessing survive pruning
    even when the measured corpus never emitted them."""
    base = _char_spec()
    vocab = {**base.vocab, "<s>": 50, "</s>": 51}
    spec = TokenizerSpec(
        merges=base.merges, vocab=vocab, unk_token="<unk>",
        byte_level=False, special_prefix=[50], special_suffix=[51],
    )
    pruned, remap = prune_spec(spec, [spec.vocab["z"]])
    assert "<s>" in pruned.vocab and "</s>" in pruned.vocab
    assert pruned.special_prefix == [remap[50]]
    assert pruned.special_suffix == [remap[51]]


# ------------------------------------------------- WordPiece (r19)


def _wp_spec():
    from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
        WordPieceSpec,
    )

    toks = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]",
        "the", "quick", "brown", "fox", "jump", "jumper",
        "##s", "##ed", "##ing", "##er", "over", "lazy", "dog",
        "t", "h", "e", "q", "u", "i", "c", "k", "b", "r", "o", "w",
        "n", "f", "x", "j", "m", "p", "s", "l", "a", "z", "y", "d", "g",
        "##t", "##h", "##e", "##q", "##u", "##i", "##c", "##k", "##b",
        "##r", "##o", "##w", "##n", "##f", "##x", "##j", "##m", "##p",
        "##l", "##a", "##z", "##y", "##d", "##g",
    ]
    vocab = {t: i for i, t in enumerate(toks)}
    return WordPieceSpec(
        vocab=vocab,
        added_tokens={"[PAD]": vocab["[PAD]"]},
        special_prefix=[vocab["[CLS]"]],
        special_suffix=[vocab["[SEP]"]],
    )


def test_wordpiece_prune_reencode_identity_and_floor(spark):
    """The subset-vocab greedy theorem, WordPiece edition: measured
    docs re-encode to identical pieces (ids remapped); the ##-aware
    single-char floor keeps every text encodable; unk/added/template
    specials survive."""
    from utc_cuip_kafka_aws_connector_spark.operators.vocabprune import (
        prune_to_corpus,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
        encode_text,
    )

    spec = _wp_spec()
    texts = ["the quick fox jumps", "the lazy dog"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pruned, remap = prune_to_corpus(df, spec)
    # shrank: 'jumper'/'##ed'/'##ing'/'##er'/'brown'/'over' unused
    # (multi-char, not floor) must be gone
    for gone in ("jumper", "##ed", "##ing", "##er", "brown", "over"):
        assert gone not in pruned.vocab
    # identity on the measured corpus
    for t in texts:
        assert encode_text(t, pruned) == [
            remap[i] for i in encode_text(t, spec)
        ]
    # floor: both positions' single chars survive, so unseen text
    # still encodes (to smaller pieces, never a crash)
    assert "w" in pruned.vocab and "##w" in pruned.vocab
    got = encode_text("brown", pruned)
    assert got == [pruned.vocab["b"]] + [
        pruned.vocab["##" + c] for c in "rown"
    ]
    # unk/added/template specials survive with remapped ids
    assert pruned.unk_token == "[UNK]" and "[UNK]" in pruned.vocab
    assert pruned.added_tokens == {"[PAD]": remap[spec.added_tokens["[PAD]"]]}
    assert pruned.special_prefix == [remap[spec.special_prefix[0]]]
    assert pruned.special_suffix == [remap[spec.special_suffix[0]]]
    # ids dense in original order
    assert sorted(pruned.vocab.values()) == list(range(len(pruned.vocab)))


def test_wordpiece_pruned_spec_round_trips_through_json(spark):
    """wordpiece_spec_json(pruned) loads back to an equal spec — the
    CLI's write path is the loader's own round-trip writer."""
    from utc_cuip_kafka_aws_connector_spark.operators.vocabprune import (
        prune_to_corpus,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
        from_wordpiece_json,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.wptrain import (
        wordpiece_spec_json,
    )

    df = spark.createDataFrame(
        [(1, "the quick fox")], "doc_id long, text string"
    )
    pruned, _ = prune_to_corpus(df, _wp_spec())
    back = from_wordpiece_json(wordpiece_spec_json(pruned))
    assert back == pruned


def test_wordpiece_spec_json_refuses_inexpressible_templates():
    from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
        WordPieceSpec,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.wptrain import (
        wordpiece_spec_json,
    )

    v = {"[UNK]": 0, "[CLS]": 1, "a": 2}
    with pytest.raises(ValueError, match="template"):
        wordpiece_spec_json(
            WordPieceSpec(vocab=v, special_prefix=[1], special_suffix=[])
        )
