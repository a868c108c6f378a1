"""Unigram EM training (operators/unigram.py::unigram_train):
forward-backward correctness on closed-form lattices, the EM
monotonicity guarantee, coverage/vocab-size invariants, the full
train -> tokenizer.json -> load -> encode loop, CLI lifecycle.
"""

from __future__ import annotations

import math

import pytest

from utc_cuip_kafka_aws_connector_spark.operators.bytelevel import (
    spec_decode,
    spec_encode,
)
from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
    from_tokenizer_json_spec,
    to_unigram_tokenizer_json,
)
from utc_cuip_kafka_aws_connector_spark.operators.unigram import (
    _forward_backward,
    _m_step,
    metaspace_word_histogram,
    unigram_e_step,
    unigram_train,
)

CORPUS = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "the dog sat on the log",
    "a cat and a dog and a fish",
    "the fish swam past the cat",
] * 3


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(t,) for t in CORPUS], "text string"
    )


def test_forward_backward_closed_form():
    """Word 'ab' with pieces {a, b, ab}: two paths. Hand-computed
    posteriors: P(path ab) = p_ab / (p_ab + p_a p_b)."""
    logp = {
        "a": math.log(0.3),
        "b": math.log(0.2),
        "ab": math.log(0.1),
    }
    z, exp = _forward_backward("ab", logp, 2)
    total = 0.1 + 0.3 * 0.2
    assert z == pytest.approx(math.log(total), abs=1e-12)
    w_ab = 0.1 / total
    assert exp["ab"] == pytest.approx(w_ab, abs=1e-12)
    assert exp["a"] == pytest.approx(1 - w_ab, abs=1e-12)
    assert exp["b"] == pytest.approx(1 - w_ab, abs=1e-12)


def test_forward_backward_unsegmentable():
    assert _forward_backward("ax", {"a": -1.0}, 1) is None


def test_e_step_matches_local_computation(corpus, spark):
    """Distributed E-step == the same forward-backward run locally
    over the collected histogram (1e-9; the distributed sum order
    differs)."""
    hist = metaspace_word_histogram(corpus)
    rows = [(r["word"], r["freq"]) for r in hist.collect()]
    chars = sorted({c for w, _ in rows for c in w})
    logp = _m_step({c: 1.0 for c in chars})
    ll, exp = unigram_e_step(hist, logp, 4)

    want_ll = 0.0
    want_exp: dict[str, float] = {}
    for w, f in rows:
        z, e = _forward_backward(w, logp, 4)
        want_ll += f * z
        for p, c in e.items():
            want_exp[p] = want_exp.get(p, 0.0) + f * c
    assert ll == pytest.approx(want_ll, rel=1e-9)
    assert set(exp) == set(want_exp)
    for p in want_exp:
        assert exp[p] == pytest.approx(want_exp[p], rel=1e-9), p


def test_em_likelihood_non_decreasing(corpus):
    """The EM guarantee at fixed vocabulary: each (E, M) round must
    not decrease corpus log-likelihood."""
    hist = metaspace_word_histogram(corpus)
    rows = [(r["word"], r["freq"]) for r in hist.collect()]
    pieces = {c: 1.0 for w, _ in rows for c in w}
    pieces.update(
        {w[i : i + 2]: 1.0 for w, _ in rows for i in range(len(w) - 1)}
    )
    logp = _m_step(pieces)
    lls = []
    for _ in range(4):
        ll, expected = unigram_e_step(hist, logp, 2)
        lls.append(ll)
        logp = _m_step(expected)
    for a, b in zip(lls, lls[1:]):
        assert b >= a - 1e-9, lls


def test_train_invariants_and_round_trip(corpus, spark):
    vocab_scores = unigram_train(
        corpus, vocab_size=40, max_piece_len=6, seed_size=200
    )
    assert vocab_scores[0] == ("<unk>", 0.0)
    assert len(vocab_scores) <= 40
    pieces = [p for p, _ in vocab_scores[1:]]
    assert len(set(pieces)) == len(pieces)
    # coverage: every corpus character survives as a single piece
    chars = {
        c
        for t in CORPUS
        for c in ("▁" + t.replace(" ", "▁"))
    }
    assert chars <= set(pieces)
    # scores are a normalized distribution
    total = sum(math.exp(s) for _, s in vocab_scores[1:])
    assert total == pytest.approx(1.0, abs=1e-9)

    # the serialized model loads and encodes its own corpus unk-free
    spec = from_tokenizer_json_spec(
        to_unigram_tokenizer_json(vocab_scores)
    )
    df = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id long, text string"
    )
    out = spec_encode(df, spec).collect()
    unk = spec.vocab["<unk>"]
    for r in out:
        assert unk not in r["token_ids"], r
    # and decodes back exactly (Metaspace round trip)
    by_id = {r["doc_id"]: r["token_ids"] for r in out}
    for i, text in enumerate(CORPUS):
        assert spec_decode(by_id[i], spec) == text


def test_train_learns_frequent_words_as_pieces(corpus):
    """'▁the' dominates the corpus; EM must keep it as one piece
    over spelling it out char-by-char."""
    vocab_scores = unigram_train(
        corpus, vocab_size=40, max_piece_len=6, seed_size=200
    )
    scores = dict(vocab_scores[1:])
    assert "▁the" in scores
    spelled = sum(scores[c] for c in "▁the")
    assert scores["▁the"] > spelled


def test_train_validation(corpus):
    with pytest.raises(ValueError, match="vocab_size"):
        unigram_train(corpus, vocab_size=1)
    with pytest.raises(ValueError, match="prune_fraction"):
        unigram_train(corpus, vocab_size=40, prune_fraction=1.5)
    with pytest.raises(ValueError, match="single characters"):
        unigram_train(corpus, vocab_size=5)


def test_cli_unigram_lifecycle(spark, tmp_path, capsys):
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    inp = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(CORPUS)],
        "doc_id long, text string, lang string",
    ).write.parquet(inp)
    model = str(tmp_path / "uni.json")
    out = str(tmp_path / "ids")
    assert cli.main(
        ["tokenizer", "--op", "train", "--model", model, "--input", inp,
         "--unigram", "--vocab-size", "40"]
    ) == 0
    assert "trained Unigram" in capsys.readouterr().out
    assert cli.main(
        ["tokenizer", "--op", "encode", "--model", model, "--input", inp,
         "--output", out]
    ) == 0
    assert "(Unigram)" in capsys.readouterr().out
    assert spark.read.parquet(out).count() == len(CORPUS)
    assert cli.main(
        ["tokenizer", "--op", "report", "--model", model, "--input", inp]
    ) == 0
    report = capsys.readouterr().out
    assert "oov=0.0000" in report  # self-corpus: no unk


def test_cli_unigram_sampled_encode(spark, tmp_path, capsys):
    """tokenizer encode --sample-alpha on a trained unigram model:
    deterministic under one seed, different under another."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    inp = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)],
        "doc_id long, text string",
    ).write.parquet(inp)
    model = str(tmp_path / "uni.json")
    assert cli.main(
        ["tokenizer", "--op", "train", "--model", model, "--input", inp,
         "--unigram", "--vocab-size", "40"]
    ) == 0
    outs = []
    for seed in ("5", "5", "9"):
        out = str(tmp_path / f"ids_{len(outs)}")
        assert cli.main(
            ["tokenizer", "--op", "encode", "--model", model,
             "--input", inp, "--output", out,
             "--sample-alpha", "0.02", "--sample-seed", seed]
        ) == 0
        outs.append(
            sorted(
                (r["doc_id"], tuple(r["token_ids"]))
                for r in spark.read.parquet(out).collect()
            )
        )
    assert outs[0] == outs[1]
    assert outs[0] != outs[2]


def test_literal_unk_text_trains_loadable_model(spark):
    """A corpus containing the literal string '<unk>' must not seed
    a piece that collides with the reserved id-0 entry — the saved
    model stays loadable and the text still encodes."""
    corpus = spark.createDataFrame(
        [("the model printed <unk> twice <unk> here",)] * 6
        + [(t,) for t in CORPUS],
        "text string",
    )
    vocab_scores = unigram_train(
        corpus, vocab_size=60, max_piece_len=6, seed_size=300
    )
    pieces = [p for p, _ in vocab_scores]
    assert pieces.count("<unk>") == 1  # only the reserved entry
    spec = from_tokenizer_json_spec(
        to_unigram_tokenizer_json(vocab_scores)
    )
    df = spark.createDataFrame(
        [(0, "printed <unk> here")], "doc_id long, text string"
    )
    ids = spec_encode(df, spec).collect()[0]["token_ids"]
    assert spec_decode(ids, spec) == "printed <unk> here"


def test_best_alt_segmentation_closed_form():
    from utc_cuip_kafka_aws_connector_spark.operators.unigram import (
        _best_alt_segmentation,
    )

    logp = {
        "ab": math.log(0.3),
        "a": math.log(0.2),
        "b": math.log(0.1),
        "abc": math.log(0.3),
        "c": math.log(0.1),
    }
    # full-span edge disallowed: 'abc' must decompose; best is
    # ab+c (log .3 + log .1) over a+b+c
    assert _best_alt_segmentation("abc", logp, 8) == ["ab", "c"]
    # a piece whose only decomposition is its characters
    assert _best_alt_segmentation("ab", logp, 8) == ["a", "b"]


def test_prune_losses_closed_form_and_ordering():
    """The sentencepiece delta rule in plain-ML form: closed-form
    check of one loss, plus the case that DISTINGUISHES it from the
    old expected-count rule — a frequent piece with a cheap
    alternative must be cheaper to drop than a rarer piece whose
    alternative is expensive."""
    from utc_cuip_kafka_aws_connector_spark.operators.unigram import (
        _prune_losses,
    )

    expected = {
        "xy": 10.0, "x": 1000.0, "y": 1000.0,
        "qz": 5.0, "q": 1.0, "z": 1.0,
    }
    logp = {p: math.log(c / sum(expected.values()))
            for p, c in expected.items()}
    losses = _prune_losses(logp, expected, max_len=8)
    S = sum(expected.values())
    # closed form for 'xy': F=10, alt=[x, y], S'=S+10
    F = 10.0
    S2 = S + F
    want = F * (
        (math.log(F) - math.log(S))
        - ((math.log(1000.0 + F) - math.log(S2)) * 2)
    )
    assert losses["xy"] == pytest.approx(want, rel=1e-12)
    # count rule would drop 'qz' first (5 < 10); the likelihood rule
    # must rank 'xy' cheaper to drop (its parts are everywhere)
    assert expected["xy"] > expected["qz"]
    assert losses["xy"] < losses["qz"]
    # single characters never get a loss entry (coverage invariant)
    assert set(losses) == {"xy", "qz"}


def test_train_prunes_by_likelihood_not_count(spark):
    """End-to-end: a corpus engineered so the two rules pick
    different victims. 'ente' is FREQUENT but perfectly covered by
    the even-more-frequent 'en'+'te'; 'qxj' is rarer but spells out
    only through bottom-scored singles. The likelihood prune must
    keep 'qxj' and segment 'ente' through its parts."""
    corpus = spark.createDataFrame(
        [("en te " * 40 + "ente " * 12 + "qxj " * 8,)], "text string"
    )
    vocab = dict(
        unigram_train(
            corpus, vocab_size=14, max_piece_len=4, seed_size=60,
            em_iters=2,
        )[1:]
    )
    assert "▁qxj" in vocab
    assert "▁ente" not in vocab


def test_digamma_closed_forms_and_recurrence():
    """_digamma vs known values: psi(1) = -gamma, psi(1/2) =
    -gamma - 2 ln 2, psi(n) = -gamma + H_{n-1}, and the recurrence
    psi(x+1) = psi(x) + 1/x across the count range EM produces —
    all to 1e-12."""
    from utc_cuip_kafka_aws_connector_spark.operators.unigram import (
        _digamma,
    )

    gamma = 0.5772156649015329
    assert _digamma(1.0) == pytest.approx(-gamma, abs=1e-12)
    assert _digamma(0.5) == pytest.approx(
        -gamma - 2.0 * math.log(2.0), abs=1e-12
    )
    # psi(n) = -gamma + sum_{k=1}^{n-1} 1/k
    h = 0.0
    for n in range(2, 30):
        h += 1.0 / (n - 1)
        assert _digamma(float(n)) == pytest.approx(-gamma + h, abs=1e-12)
    for x in [0.2, 1.7, 5.999, 6.0, 42.5, 1e6]:
        assert _digamma(x + 1.0) == pytest.approx(
            _digamma(x) + 1.0 / x, rel=1e-12, abs=1e-12
        )
    # tiny counts (the EM floor range): the Laurent expansion
    # psi(x) = -1/x - gamma + (pi^2/6) x + O(x^2), checked at the
    # precision subtracting 1/x leaves in a double
    for x in [1e-9, 1e-3]:
        want = -1.0 / x - gamma + (math.pi**2 / 6.0) * x
        # the next Laurent term is -zeta(3) x^2 (~1e-6 rel at 1e-3)
        assert _digamma(x) == pytest.approx(want, rel=1e-8)
    with pytest.raises(ValueError, match="x > 0"):
        _digamma(0.0)


def test_m_step_bayes_is_sentencepiece_update():
    """The bayes variant is digamma(c) - digamma(total), strictly
    below the ML score for every piece (digamma(x) < log(x)), with
    the gap largest at tiny counts — exactly the prior-against-
    rare-pieces behavior the sentencepiece trainer has."""
    from utc_cuip_kafka_aws_connector_spark.operators.unigram import (
        _digamma,
        _m_step,
    )

    expected = {"a": 100.0, "b": 10.0, "c": 0.5}
    total = 110.5
    ml = _m_step(expected, "ml")
    vb = _m_step(expected, "bayes")
    for p, c in expected.items():
        assert vb[p] == pytest.approx(
            _digamma(c) - _digamma(total), abs=1e-12
        )
        assert vb[p] < ml[p]
    # the shrinkage is monotone in 1/c: rarest piece penalized most
    gaps = {p: ml[p] - vb[p] for p in expected}
    assert gaps["c"] > gaps["b"] > gaps["a"]
    with pytest.raises(ValueError, match="m_step must be"):
        _m_step(expected, "map")


def test_train_bayes_variant(corpus):
    """unigram_train(m_step='bayes'): valid model out (coverage,
    finite sub-normalized scores); the Bayesian shrinkage may settle
    UNDER vocab_size by zeroing weak redundant seeds, but what it
    keeps is a SUBSET of the ML trainer's pieces with the
    high-frequency head intact — the r13 deviation note's 'rankings
    coincide except near-ties at tiny counts' claim, now test-pinned
    instead of prose."""
    kw = dict(vocab_size=40, max_piece_len=6, seed_size=200, em_iters=2)
    ml_vocab = unigram_train(corpus, **kw)
    vb_vocab = unigram_train(corpus, m_step="bayes", **kw)
    assert vb_vocab[0] == ("<unk>", 0.0)
    assert len(ml_vocab) == 40
    assert 20 <= len(vb_vocab) <= 40
    ml_pieces = {p for p, _ in ml_vocab}
    vb_pieces = {p for p, _ in vb_vocab}
    assert vb_pieces <= ml_pieces
    # vocab lists are sorted by expected count: the unambiguous
    # frequent head (clear of count ties, where digamma's correction
    # is negligible) must coincide exactly
    assert [p for p, _ in vb_vocab[:4]] == [p for p, _ in ml_vocab[:4]]
    # coverage invariant holds in both variants: every single char
    singles_ml = {p for p in ml_pieces if len(p) == 1}
    singles_vb = {p for p in vb_pieces if len(p) == 1}
    assert singles_vb == singles_ml
    scores = dict(vb_vocab[1:])
    assert all(math.isfinite(s) for s in scores.values())
    # digamma scores are sub-normalized: sum of probabilities < 1
    assert sum(math.exp(s) for s in scores.values()) < 1.0
    with pytest.raises(ValueError, match="m_step must be"):
        unigram_train(corpus, vocab_size=10, m_step="map")
