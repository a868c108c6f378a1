"""operators/wptrain.py: WordPiece vocabulary training.

Evidence model (FIXTURES.md — no `tokenizers` lib in this image):
(1) the public worked example from the HF LLM course's WordPiece
chapter, recomputed BY HAND below (the likelihood score picks ##g+##s
where BPE's raw-frequency argmax would pick ##u+##g — the property
that makes WordPiece WordPiece); (2) a naive O(n^2) pure-Python
reference trainer written independently from the published
pseudocode, differentially compared on a larger corpus; (3) the full
train -> save -> generic-load -> encode lifecycle round-trip; and
(4) loud refusals for the budget/shape contracts.
"""

from __future__ import annotations

import pytest

from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
    WordPieceSpec,
    encode_text,
)
from utc_cuip_kafka_aws_connector_spark.operators.wptrain import (
    _driver_train,
    save_wordpiece_tokenizer,
    to_wordpiece_tokenizer_json,
    wordpiece_train,
)

# the HF course's worked corpus: (word, freq)
COURSE = [("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4), ("hugs", 5)]


def _naive_reference(wf, n_merges, prefix="##", min_pair_freq=2):
    """Published pseudocode, written independently of _driver_train:
    full recount + full rescore every round, argmax by explicit
    sort over (score desc, pair freq desc, lhs, rhs)."""
    segs = {i: [w[0]] + [prefix + c for c in w[1:]] for i, (w, _) in enumerate(wf)}
    freq = {i: f for i, (_, f) in enumerate(wf)}
    merges = []
    for _ in range(n_merges):
        sf, pf = {}, {}
        for i, s in segs.items():
            for sym in s:
                sf[sym] = sf.get(sym, 0) + freq[i]
            for p in zip(s, s[1:]):
                pf[p] = pf.get(p, 0) + freq[i]
        scored = [
            (c / (sf[a] * sf[b]), c, a, b)
            for (a, b), c in pf.items()
            if c >= min_pair_freq
        ]
        if not scored:
            break
        scored.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
        _, _, a, b = scored[0]
        merged = a + b[len(prefix):]
        merges.append(merged)
        for i, s in list(segs.items()):
            ns, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    ns.append(merged)
                    j += 2
                else:
                    ns.append(s[j])
                    j += 1
            segs[i] = ns
    return merges


def test_course_example_first_merge_is_likelihood_not_frequency():
    """Hand computation over the course corpus: pair counts are
    (h,##u)=15 (##u,##g)=20 (p,##u)=17 (##u,##n)=16 (b,##u)=4
    (##g,##s)=5; symbol counts h=15 ##u=36 ##g=20 p=17 ##n=16 b=4
    ##s=5. Every ##u pair scores exactly 1/36; (##g,##s) scores
    5/(20*5) = 1/20 — the likelihood argmax. BPE's raw-frequency
    argmax would have been (##u,##g) at count 20: asserting the
    difference is asserting the algorithm."""
    merges = _driver_train(COURSE, 1)
    assert merges == ["##gs"]
    # and explicitly NOT the BPE pick
    assert merges != ["##ug"]


def test_course_example_next_merges_match_reference():
    got = _driver_train(COURSE, 6)
    want = _naive_reference(COURSE, 6)
    assert got == want
    assert got[0] == "##gs"


def test_driver_trainer_matches_naive_reference_on_larger_corpus():
    """Differential on a deterministic synthetic corpus: 40 words
    over a 5-letter alphabet with Zipfish frequencies, 25 merges."""
    words = []
    letters = "abcde"
    x = 7
    for i in range(40):
        x = (x * 31 + 17) % 9973
        w = "".join(letters[(x >> (3 * j)) % 5] for j in range(2 + x % 4))
        words.append((w, 1 + (x % 13)))
    # dedupe keys (the histogram contract), keep first freq
    seen, wf = set(), []
    for w, f in words:
        if w not in seen:
            seen.add(w)
            wf.append((w, f))
    wf.sort()
    assert _driver_train(wf, 25) == _naive_reference(wf, 25)


def test_min_pair_freq_knob():
    # with the default (2), the singleton word's pairs never merge
    wf = [("xy", 1), ("ab", 10), ("abc", 5)]
    assert "xy" not in _driver_train(wf, 10)
    assert "xy" in _driver_train(wf, 10, min_pair_freq=1)


def test_wordpiece_train_end_to_end_round_trip(spark, tmp_path):
    """train -> save -> tokenio.load_tokenizer_spec (generic dispatch)
    -> encode: the loaded spec is a WordPieceSpec carrying exactly
    the trained vocab, and it tokenizes its own training corpus with
    zero UNKs (the alphabet covers every seen character)."""
    from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
        load_tokenizer_spec,
    )

    texts = [
        "the hugging pug hugs the pun",
        "a bun and a pug hug",
        "pun hugs bun hug hugs",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    vocab = wordpiece_train(df, vocab_size=60)
    assert vocab["[PAD]"] == 0 and vocab["[UNK]"] == 1
    assert len(vocab) <= 60
    # ids are dense and unique
    assert sorted(vocab.values()) == list(range(len(vocab)))

    path = tmp_path / "trained.json"
    save_wordpiece_tokenizer(spark, str(path), vocab)
    spec = load_tokenizer_spec(spark, str(path))
    assert isinstance(spec, WordPieceSpec)
    assert spec.vocab == vocab
    assert spec.lowercase and spec.clean_text  # the training defaults

    # review r19: trained specials are REACHABLE — registered as
    # added_tokens (atomic raw-text match) and as the CLS/SEP template
    assert spec.added_tokens == {
        t: vocab[t] for t in ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")
    }
    assert spec.special_prefix == [vocab["[CLS]"]]
    assert spec.special_suffix == [vocab["[SEP]"]]
    assert encode_text("the [MASK] pug", spec) == (
        encode_text("the", spec) + [vocab["[MASK]"]] + encode_text("pug", spec)
    )
    assert encode_text("pug", spec, add_special_tokens=True) == (
        [vocab["[CLS]"]] + encode_text("pug", spec) + [vocab["[SEP]"]]
    )

    unk = vocab["[UNK]"]
    for t in texts:
        ids = encode_text(t, spec)
        assert ids and unk not in ids, t
    # round-trip the json text itself (byte-stable serialization)
    assert to_wordpiece_tokenizer_json(vocab) == path.read_text()


def test_trained_vocab_prefers_merged_tokens(spark):
    """A corpus dominated by one word must mint its merged pieces:
    'hugging' encodes in fewer pieces than its character count."""
    df = spark.createDataFrame(
        [(i, "hugging hugging hugging hugs hug") for i in range(3)],
        "doc_id long, text string",
    )
    vocab = wordpiece_train(df, vocab_size=40)
    spec = WordPieceSpec(vocab=vocab)
    ids = encode_text("hugging", spec)
    assert 1 <= len(ids) < len("hugging")


def test_refusals(spark):
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="vocab_size"):
        wordpiece_train(df, vocab_size=0)
    with pytest.raises(ValueError, match="duplicate special"):
        wordpiece_train(df, vocab_size=50, special_tokens=("[UNK]", "[UNK]"))
    with pytest.raises(ValueError, match="cannot hold"):
        wordpiece_train(df, vocab_size=3)
    with pytest.raises(ValueError, match="max_histogram_rows"):
        df2 = spark.createDataFrame(
            [(1, "one two three four")], "doc_id long, text string"
        )
        wordpiece_train(df2, vocab_size=50, max_histogram_rows=2)
    with pytest.raises(ValueError, match="unk_token"):
        to_wordpiece_tokenizer_json({"a": 0})


def test_histogram_is_one_arrow_scan_one_shuffle(spark):
    """Scale pin: the corpus-scale part of training is one
    Arrow-batched normalize/pretokenize scan into one
    map-side-combined groupBy — no join, no second corpus pass."""
    from utc_cuip_kafka_aws_connector_spark.operators.wptrain import (
        word_histogram,
    )

    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    plan = (
        word_histogram(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_cli_tokenizer_train_wordpiece_lifecycle(spark, tmp_path, capsys):
    """`tokenizer --op train --wordpiece` writes a tokenizer.json the
    generic loader serves for encode immediately — the CLI closes the
    train -> encode loop for the third (and last) model family."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "the hugging pug hugs the pun"), (2, "a bun and a pug hug")],
        "doc_id long, text string",
    ).write.parquet(src)
    model = str(tmp_path / "wp.json")
    assert cli.main(
        ["tokenizer", "--op", "train", "--wordpiece",
         "--vocab-size", "50", "--model", model, "--input", src]
    ) == 0
    assert "trained WordPiece" in capsys.readouterr().out
    out = str(tmp_path / "ids")
    assert cli.main(
        ["tokenizer", "--op", "encode", "--model", model,
         "--input", src, "--output", out]
    ) == 0
    assert "WordPiece" in capsys.readouterr().out
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2 and all(len(r["token_ids"]) > 0 for r in rows)
    # exclusivity guard
    with pytest.raises(SystemExit) as exc:
        cli.main(
            ["tokenizer", "--op", "train", "--wordpiece", "--unigram",
             "--model", model, "--input", src]
        )
    assert exc.value.code == 2


def test_cli_train_flag_exclusivity_all_pairs(spark, tmp_path):
    """Review r19: every pair of model-family flags is refused, not
    just --unigram x --wordpiece (--byte-level --wordpiece used to
    silently train char-level WordPiece)."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "ab ab")], "doc_id long, text string"
    ).write.parquet(src)
    for flags in (
        ["--unigram", "--wordpiece"],
        ["--byte-level", "--wordpiece"],
        ["--unigram", "--byte-level"],
    ):
        with pytest.raises(SystemExit) as exc:
            cli.main(
                ["tokenizer", "--op", "train", *flags,
                 "--model", str(tmp_path / "m.json"), "--input", src]
            )
        assert exc.value.code == 2, flags


def test_added_token_special_flag_round_trips_verbatim():
    """ADVICE r19: a loaded file carrying a NON-special added token
    used to round-trip through wordpiece_spec_json with the flag
    flipped to true (behavior-neutral here, metadata drift for HF
    interop consumers of the written file). The per-token flag now
    re-emits verbatim, both ways."""
    import json

    from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
        from_wordpiece_json,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.wptrain import (
        wordpiece_spec_json,
    )

    vocab = {"[UNK]": 0, "[MASK]": 1, "<extra>": 2, "a": 3, "##a": 4}
    doc = {
        "model": {"type": "WordPiece", "unk_token": "[UNK]",
                  "continuing_subword_prefix": "##", "vocab": vocab},
        "added_tokens": [
            {"content": "[MASK]", "id": 1, "special": True},
            {"content": "<extra>", "id": 2, "special": False},
        ],
    }
    spec = from_wordpiece_json(json.dumps(doc))
    assert spec.added_specials == frozenset({"[MASK]"})
    written = json.loads(wordpiece_spec_json(spec))
    flags = {t["content"]: t["special"] for t in written["added_tokens"]}
    assert flags == {"[MASK]": True, "<extra>": False}
    # and the reload is an equal spec (the round-trip law unchanged)
    assert from_wordpiece_json(wordpiece_spec_json(spec)) == spec
    # the trainer path is unaffected: its added tokens ARE specials
    trained = json.loads(to_wordpiece_tokenizer_json(vocab))
    assert all(t["special"] for t in trained["added_tokens"])


def test_added_specials_survive_wordpiece_prune(spark):
    """The per-token special flags ride through prune_wordpiece_spec
    untouched (every added token is on the survival floor)."""
    import json

    from utc_cuip_kafka_aws_connector_spark.operators.vocabprune import (
        prune_to_corpus,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
        from_wordpiece_json,
    )

    vocab = {"[UNK]": 0, "[MASK]": 1, "<extra>": 2,
             "a": 3, "##a": 4, "b": 5, "##b": 6, "ab": 7}
    doc = {
        "model": {"type": "WordPiece", "unk_token": "[UNK]",
                  "continuing_subword_prefix": "##", "vocab": vocab},
        "added_tokens": [
            {"content": "[MASK]", "id": 1, "special": True},
            {"content": "<extra>", "id": 2, "special": False},
        ],
    }
    spec = from_wordpiece_json(json.dumps(doc))
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    pruned, _ = prune_to_corpus(df, spec)
    assert "ab" not in pruned.vocab  # it actually pruned something
    assert set(pruned.added_tokens) == {"[MASK]", "<extra>"}
    assert pruned.added_specials == frozenset({"[MASK]"})


def test_cli_prune_refuses_inexpressible_template_before_corpus_scan(
    spark, tmp_path, capsys
):
    """ADVICE r19: the WordPiece prune branch used to discover an
    unserializable TemplateProcessing shape only AFTER the corpus
    encode pass (wordpiece_spec_json's raise); the CLI now refuses
    up front via the writer's own wordpiece_template_refusal law —
    exit code 2 like the BPE branch's guard, BEFORE the corpus scan
    (the input parquet has no text column, so any encode attempt
    would crash with a column error instead)."""
    import json

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    # a prefix-only template ([CLS] A, no [SEP]) — loadable, but
    # outside the single-sequence shape the writer emits
    vocab = {"[UNK]": 0, "[CLS]": 1, "a": 2, "##a": 3}
    doc = {
        "model": {"type": "WordPiece", "unk_token": "[UNK]",
                  "continuing_subword_prefix": "##", "vocab": vocab},
        "post_processor": {
            "type": "TemplateProcessing",
            "single": [
                {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
                {"Sequence": {"id": "A", "type_id": 0}},
            ],
        },
    }
    model = str(tmp_path / "wp.json")
    with open(model, "w") as fh:
        fh.write(json.dumps(doc))
    src = str(tmp_path / "textless")
    spark.createDataFrame([(1,)], "doc_id long").write.parquet(src)
    with pytest.raises(SystemExit) as exc:
        cli.main(["tokenizer", "--op", "prune", "--model", model,
                  "--input", src,
                  "--output", str(tmp_path / "out.json")])
    assert exc.value.code == 2
    assert "template" in capsys.readouterr().err


def test_cli_encode_wordpiece_knob_refusal_is_usage_error_only(
    spark, tmp_path, capsys
):
    """ADVICE r19: only the WordPiece sampling-knob refusal routes
    through parser.error (exit 2); it fires as an up-front pre-check
    BEFORE the encoder touches the corpus (the input parquet has no
    text column, so reaching encode_for_spec would raise a column
    error, not this message)."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli
    from utc_cuip_kafka_aws_connector_spark.operators.wptrain import (
        save_wordpiece_tokenizer,
        wordpiece_train,
    )

    docs = spark.createDataFrame(
        [(1, "a b a")], "doc_id long, text string"
    )
    model = str(tmp_path / "wp.json")
    save_wordpiece_tokenizer(
        spark, model, wordpiece_train(docs, vocab_size=30)
    )
    src = str(tmp_path / "textless")
    spark.createDataFrame([(1,)], "doc_id long").write.parquet(src)
    with pytest.raises(SystemExit) as exc:
        cli.main(["tokenizer", "--op", "encode", "--model", model,
                  "--input", src,
                  "--output", str(tmp_path / "ids"),
                  "--sample-alpha", "0.2"])
    assert exc.value.code == 2
    assert "deterministic" in capsys.readouterr().err
