"""Unigram-LM tokenization (the SentencePiece unigram model): the
Viterbi segmentation kernel behind ``bytelevel.spec_encode``'s
``model.type == "Unigram"`` path.

Why this exists: half the public tokenizer.json files are not BPE.
The T5 / ALBERT / XLNet / mT5 family serializes a unigram language
model (Kudo 2018, "Subword Regularization"): a vocabulary of pieces
with log-probability scores, and tokenization = the segmentation of
the input that maximizes the sum of piece scores — computed exactly
by Viterbi dynamic programming over the piece lattice. Without this
module those models are rejected at load time; with it they encode
through the same distributed ``spec_encode`` scan as the BPE shapes.

Algorithm (the published sentencepiece ``unigram_model.cc``
semantics, re-derived — no code consulted):

- ``best[j] = max over pieces p ending at j of best[j - |p|] +
  score(p)``; a single character with no vocabulary piece scores
  ``unk_score = min(scores) - 10.0`` (sentencepiece's kUnkPenalty)
  and is marked unknown.
- Ties broken deterministically: the LONGER piece wins at equal
  total score (pinned here — the brute-force differential in
  tests/test_unigram.py applies the same rule, and the optimality
  property compares totals only, which is tie-break-independent).
- Consecutive unknown characters FUSE into one unk token
  (tokenizers' ``fuse_unk`` default for Unigram) — unless the model
  declares ``byte_fallback``, in which case each unknown character
  is emitted as its ``<0xNN>`` UTF-8 byte tokens (the sentencepiece
  byte-fallback convention; fusing would garble multi-char runs).

Scale shape: the kernel is O(len(piece) * max_piece_len) per
pretokenized piece with dict lookups — pure per-row Python, which is
exactly why it runs inside ``spec_encode``'s Arrow-batched
``mapInPandas`` scan (per-executor piece cache, no shuffle, no
driver involvement). The model tables (piece -> score/id) are
closure-captured — a unigram vocab is < 1 M entries, MBs in the
task broadcast.

Reference basis: SURVEY §2.D training-data-pipeline scope; the
reference repo has no tokenizer surface. Public sources: Kudo 2018
(arXiv:1804.10959), the sentencepiece and Hugging Face `tokenizers`
documentation of the serialized Unigram model
({"type": "Unigram", "unk_id", "vocab": [[piece, score], ...],
"byte_fallback"}).
"""

from __future__ import annotations

import math
from typing import Iterator

UNK_PENALTY = 10.0


def unigram_unk_score(scores: dict[str, float]) -> float:
    """sentencepiece's unknown-character score: worse than every
    real piece by a fixed penalty, so unknowns never displace a
    viable segmentation."""
    if not scores:
        raise ValueError("unigram model has an empty vocabulary")
    return min(scores.values()) - UNK_PENALTY


def viterbi_segment(
    text: str,
    scores: dict[str, float],
    unk_score: float,
    max_piece_len: int,
) -> list[tuple[str, bool]]:
    """Max-score segmentation of ``text`` as ``[(piece, known)]``.

    Exact DP, no heuristics: every vocabulary piece ending at every
    position is considered (bounded by the longest piece in the
    vocabulary), plus the single-character unknown node. Returns []
    for empty input."""
    n = len(text)
    if n == 0:
        return []
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    best[0] = 0.0
    back: list[tuple[int, str, bool]] = [(-1, "", False)] * (n + 1)
    for j in range(1, n + 1):
        # longer pieces first so the pinned longest-wins tie-break is
        # "first candidate at equal score wins" (strict > below)
        for l in range(min(max_piece_len, j), 0, -1):
            piece = text[j - l : j]
            s = scores.get(piece)
            if s is not None and best[j - l] + s > best[j]:
                best[j] = best[j - l] + s
                back[j] = (j - l, piece, True)
        if best[j - 1] != NEG and best[j - 1] + unk_score > best[j]:
            best[j] = best[j - 1] + unk_score
            back[j] = (j - 1, text[j - 1], False)
    out: list[tuple[str, bool]] = []
    j = n
    while j > 0:
        i, piece, known = back[j]
        out.append((piece, known))
        j = i
    out.reverse()
    return out


def fuse_unknowns(
    segments: list[tuple[str, bool]]
) -> list[tuple[str, bool]]:
    """Merge runs of unknown single characters into one unknown
    token (tokenizers' ``fuse_unk``)."""
    out: list[tuple[str, bool]] = []
    for piece, known in segments:
        if not known and out and not out[-1][1]:
            out[-1] = (out[-1][0] + piece, False)
        else:
            out.append((piece, known))
    return out


def unigram_encode_piece(
    piece: str,
    scores: dict[str, float],
    vocab: dict[str, int],
    unk_id: int | None,
    byte_fallback: bool,
    unk_score: float,
    max_piece_len: int,
) -> list[int]:
    """One pretokenized piece -> token ids under the model's miss
    policy: Viterbi over the lattice, then per segment vocab hit /
    ``<0xNN>`` byte fallback / fused unk / loud error — the same
    escalation ladder as the BPE path
    (bytelevel._encode_piece_symbols), never a silent drop."""
    segments = viterbi_segment(piece, scores, unk_score, max_piece_len)
    return segments_to_ids(segments, vocab, unk_id, byte_fallback)


def segments_to_ids(
    segments: list[tuple[str, bool]],
    vocab: dict[str, int],
    unk_id: int | None,
    byte_fallback: bool,
) -> list[int]:
    """The shared miss-policy ladder for any segmentation source
    (Viterbi or sampled): vocab hit / ``<0xNN>`` byte fallback /
    fused unk / loud error."""
    if not byte_fallback:
        segments = fuse_unknowns(segments)
    ids: list[int] = []
    for seg, known in segments:
        if known:
            ids.append(vocab[seg])
            continue
        if byte_fallback:
            bts = [vocab.get(f"<0x{b:02X}>") for b in seg.encode("utf-8")]
            if all(b is not None for b in bts):
                ids.extend(bts)
                continue
        if unk_id is not None:
            ids.append(unk_id)
            continue
        raise ValueError(
            f"segment {seg!r} is outside the unigram vocab and the "
            "model declares no unk_id/byte_fallback escape"
        )
    return ids


# ---------------------------------------------------------------------------
# Training (the EM side of Kudo 2018, distributed over the word
# histogram). The serialized result is a loadable Unigram
# tokenizer.json (tokenio.to_unigram_tokenizer_json), so train ->
# save -> load -> spec_encode closes the same loop the BPE stack has.
#
# Honest scope: the E step is the exact unigram-LM lattice
# forward-backward over every word. TWO M-step variants (r14,
# closing the r13 documented deviation): ``m_step="ml"`` (default)
# is the exact multinomial update — corpus likelihood provably
# non-decreasing, pinned in tests/test_unigram_train.py;
# ``m_step="bayes"`` is sentencepiece's digamma update (the
# implicit-Dirichlet variational M-step its trainer runs — digamma
# in pure Python, recurrence + asymptotic series, test-pinned
# against closed forms). PRUNING is sentencepiece's likelihood-delta
# rule (r13): each multi-char piece is scored by the corpus
# log-likelihood LOST if its occurrences re-segment through their
# best alternative (Viterbi over the piece's own string with the
# full-span edge disallowed), computed under the SAME count->log map
# as the chosen M-step, so "bayes" reproduces sentencepiece's
# formulation end-to-end. Piece RANKINGS of the two variants
# coincide except within near-ties at tiny counts, where digamma's
# correction is largest (test-pinned on the fixture corpus). All
# single characters are always kept (the coverage invariant
# sentencepiece enforces via required pieces).
#
# Scale shape: ONE corpus-sized shuffle builds the (word, freq)
# histogram (map-side partial counts in the Arrow scan, the
# bytelevel.byte_level_histogram pattern); every EM round after that
# is a histogram-scan mapInPandas (per-word forward-backward in
# Python, piece table closure-broadcast) + one piece-sized groupBy.
# The piece table (<= ~10x vocab_size rows) lives on the driver
# between rounds — MBs, the same crossover every trainer in this
# repo uses (bpetrain's collect-when-small discipline).
# ---------------------------------------------------------------------------


def metaspace_word_histogram(
    df,
    text_col: str = "text",
    replacement: str = "▁",
    prepend_scheme: str = "always",
):
    """(word, freq) over Metaspace-pretokenized pieces — the single
    corpus-scale shuffle of unigram training; everything downstream
    works on this vocabulary-sized frame."""
    import pandas as pd
    from pyspark.sql import functions as F

    from utc_cuip_kafka_aws_connector_spark.operators.bytelevel import (
        metaspace_pretokenize,
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            counts: dict[str, int] = {}
            for text in pdf[text_col].fillna("").astype(str):
                for piece in metaspace_pretokenize(
                    text, replacement, prepend_scheme
                ):
                    counts[piece] = counts.get(piece, 0) + 1
            yield pd.DataFrame(
                {"word": list(counts), "freq": list(counts.values())}
            )

    partial = df.select(text_col).mapInPandas(run, "word string, freq long")
    return partial.groupBy("word").agg(F.sum("freq").alias("freq"))


def _logaddexp(a: float, b: float) -> float:
    if a == float("-inf"):
        return b
    if b == float("-inf"):
        return a
    hi, lo = (a, b) if a >= b else (b, a)
    return hi + math.log1p(math.exp(lo - hi))


def _forward_backward(
    word: str, logp: dict[str, float], max_len: int
):
    """Lattice posteriors for one word: returns (log-likelihood,
    {piece: expected count}) or None if the word cannot be segmented
    with the current pieces."""
    n = len(word)
    NEG = float("-inf")
    edges: list[list[tuple[int, str, float]]] = [[] for _ in range(n + 1)]
    for j in range(1, n + 1):
        for l in range(1, min(max_len, j) + 1):
            piece = word[j - l : j]
            lp = logp.get(piece)
            if lp is not None:
                edges[j].append((j - l, piece, lp))
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        for i, _, lp in edges[j]:
            if alpha[i] != NEG:
                alpha[j] = _logaddexp(alpha[j], alpha[i] + lp)
    if alpha[n] == NEG:
        return None
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for j in range(n, 0, -1):
        if beta[j] == NEG:
            continue
        for i, _, lp in edges[j]:
            if alpha[i] != NEG:
                beta[i] = _logaddexp(beta[i], beta[j] + lp)
    z = alpha[n]
    exp: dict[str, float] = {}
    for j in range(1, n + 1):
        if beta[j] == NEG:
            continue
        for i, piece, lp in edges[j]:
            if alpha[i] != NEG:
                exp[piece] = exp.get(piece, 0.0) + math.exp(
                    alpha[i] + lp + beta[j] - z
                )
    return z, exp

_LL_SENTINEL = "\x00__loglik__"


def unigram_e_step(
    hist, logp: dict[str, float], max_piece_len: int
) -> tuple[float, dict[str, float]]:
    """Distributed E-step over the (word, freq) histogram: one
    mapInPandas scan emitting per-batch partial expected counts (and
    the batch log-likelihood under a sentinel key), one piece-sized
    groupBy, one vocab-sized collect. Returns (corpus log-likelihood,
    piece -> expected count)."""
    import pandas as pd
    from pyspark.sql import functions as F

    pieces = dict(logp)
    max_len = int(max_piece_len)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            counts: dict[str, float] = {}
            ll = 0.0
            for word, freq in zip(
                pdf["word"].astype(str), pdf["freq"].astype(int)
            ):
                res = _forward_backward(word, pieces, max_len)
                if res is None:
                    raise ValueError(
                        f"word {word!r} is unsegmentable under the current "
                        "piece set (single-character coverage was dropped?)"
                    )
                z, exp = res
                ll += freq * z
                for p, c in exp.items():
                    counts[p] = counts.get(p, 0.0) + freq * c
            counts[_LL_SENTINEL] = counts.get(_LL_SENTINEL, 0.0) + ll
            yield pd.DataFrame(
                {"piece": list(counts), "cnt": list(counts.values())}
            )

    rows = (
        hist.select("word", "freq")
        .mapInPandas(run, "piece string, cnt double")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    expected = {r["piece"]: r["cnt"] for r in rows}
    loglik = expected.pop(_LL_SENTINEL, 0.0)
    return loglik, expected


def _best_alt_segmentation(
    piece: str, logp: dict[str, float], max_len: int
) -> list[str] | None:
    """Best segmentation of ``piece`` under the current model with
    the single full-span edge disallowed — sentencepiece's
    "alternative segmentation" (its NBest(2) second path when the
    piece itself is the best path). Exact DP; None when no
    decomposition exists (impossible while single-character coverage
    holds, kept as a guard)."""
    n = len(piece)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for l in range(1, min(max_len, j) + 1):
            if l == n:  # the full-span edge IS the piece — disallowed
                continue
            sub = piece[j - l : j]
            lp = logp.get(sub)
            if lp is None or best[j - l] == NEG:
                continue
            cand = best[j - l] + lp
            # deterministic tie-break: longer piece wins (the
            # viterbi_segment convention)
            if cand > best[j] or (cand == best[j] and back[j] and l > j - back[j][0]):
                best[j] = cand
                back[j] = (j - l, sub)
    if best[n] == NEG:
        return None
    out: list[str] = []
    j = n
    while j > 0:
        i, sub = back[j]
        out.append(sub)
        j = i
    out.reverse()
    return out


def _digamma(x: float) -> float:
    """psi(x) for x > 0, pure Python: the recurrence
    psi(x) = psi(x+1) - 1/x pushes the argument to >= 10, then the
    asymptotic series (Abramowitz & Stegun 6.3.18) converges to
    double precision. Matches scipy.special.digamma to ~1e-12 over
    the count range EM produces (test-pinned against psi(1) = -gamma,
    psi(1/2) = -gamma - 2 ln 2, and the recurrence itself)."""
    if x <= 0.0:
        raise ValueError(f"digamma needs x > 0, got {x}")
    r = 0.0
    while x < 10.0:
        r -= 1.0 / x
        x += 1.0
    inv = 1.0 / x
    inv2 = inv * inv
    series = inv2 * (
        1.0 / 12
        - inv2 * (
            1.0 / 120
            - inv2 * (1.0 / 252 - inv2 * (1.0 / 240 - inv2 / 132))
        )
    )
    return r + math.log(x) - 0.5 * inv - series


def _count_log(m_step: str):
    """The count -> log-domain map the chosen M-step variant uses:
    plain log for maximum-likelihood EM, digamma for sentencepiece's
    Bayesianified EM (the implicit-Dirichlet variational update its
    trainer applies; Kudo 2018 / unigram_model_trainer's RunMStep)."""
    if m_step == "ml":
        return math.log
    if m_step == "bayes":
        return _digamma
    raise ValueError(f"m_step must be 'ml' or 'bayes', got {m_step!r}")


def _prune_losses(
    logp: dict[str, float],
    expected: dict[str, float],
    max_len: int,
    m_step: str = "ml",
) -> dict[str, float]:
    """Per-multi-char-piece corpus log-likelihood loss if the piece
    were removed and its occurrences re-segmented through their best
    alternative — the sentencepiece pruning objective
    (unigram_model_trainer's PruneSentencePieces, re-derived from
    the published algorithm description), under the SAME count->log
    map as the chosen M-step: plain log for ``m_step="ml"``, digamma
    for ``m_step="bayes"`` (sentencepiece's own formulation).

    With F = expected count of the piece, S = total expected count,
    alt = its alternative pieces (k of them), lg = log or digamma:

        S' = S + F * (k - 1)              (each occurrence now emits
                                           k pieces instead of 1)
        loss = F * ( [lg F - lg S]
                   - sum_a [lg(F_a + F) - lg S'] )

    Driver-side and vocab-sized (the M-step crossover discipline) —
    one Viterbi over each piece's OWN string, never the corpus."""
    lg = _count_log(m_step)
    S = sum(max(c, 0.0) for c in expected.values())
    logS = lg(S)
    losses: dict[str, float] = {}
    for p in logp:
        if len(p) <= 1:
            continue
        F_p = expected.get(p, 0.0)
        if F_p <= 0.0:
            losses[p] = 0.0  # unused piece: free to drop
            continue
        alt = _best_alt_segmentation(p, logp, max_len)
        if alt is None:
            losses[p] = float("inf")  # irreplaceable: never drop
            continue
        S_alt = S + F_p * (len(alt) - 1)
        log_alt = sum(
            lg(expected.get(a, 0.0) + F_p) - lg(S_alt)
            for a in alt
        )
        losses[p] = F_p * ((lg(F_p) - logS) - log_alt)
    return losses


def _m_step(
    expected: dict[str, float], m_step: str = "ml"
) -> dict[str, float]:
    """``"ml"``: exact multinomial update, log(c) - log(total) — the
    EM whose corpus likelihood is provably non-decreasing. ``"bayes"``:
    sentencepiece's digamma update, digamma(c) - digamma(total) — the
    implicit-Dirichlet variational M-step its trainer runs; scores
    are slightly sub-normalized (sum of exp < 1), which sharpens the
    prior against tiny-count pieces exactly where the two variants'
    rankings can differ."""
    lg = _count_log(m_step)
    total = sum(expected.values())
    return {
        p: lg(c) - lg(total)
        for p, c in expected.items()
        if c > 0.0
    }


def unigram_train(
    df,
    vocab_size: int,
    text_col: str = "text",
    max_piece_len: int = 8,
    seed_size: int | None = None,
    em_iters: int = 2,
    prune_fraction: float = 0.25,
    replacement: str = "▁",
    prepend_scheme: str = "always",
    m_step: str = "ml",
) -> list[tuple[str, float]]:
    """Train a unigram LM tokenizer: returns the serialized-model
    vocab list ``[(piece, score), ...]`` with ``<unk>`` at index 0 —
    exactly the ``model.vocab`` of a Unigram tokenizer.json
    (``tokenio.to_unigram_tokenizer_json`` writes it;
    ``spec_encode`` runs it).

    Seeding: the ``seed_size`` most frequent substrings (length <=
    ``max_piece_len``) of the word histogram, plus ALL single
    characters (coverage invariant — never pruned, so every training
    word stays segmentable and the trained model needs no unk on its
    own corpus). Then rounds of (EM x ``em_iters``, prune the
    multi-char pieces with the smallest likelihood loss — the
    sentencepiece delta rule, see ``_prune_losses``) until the piece
    count fits ``vocab_size - 1``, and a final EM settle.

    ``m_step="ml"`` (default) runs exact maximum-likelihood EM;
    ``m_step="bayes"`` runs sentencepiece's digamma (variational
    Bayes) update in both the M-step and the prune objective — use it
    when score-level parity with a sentencepiece-trained model
    matters more than the ML monotonicity guarantee. The Bayesian
    shrinkage can zero the posterior of weak redundant seeds
    entirely, so "bayes" may settle UNDER ``vocab_size`` (its piece
    set is a subset of what "ml" keeps on the same corpus —
    test-pinned); sentencepiece's own kExpectedFrequencyThreshold
    drop is the same behavior."""
    from pyspark.sql import functions as F

    _count_log(m_step)  # validate the variant name before any work
    if vocab_size < 2:
        raise ValueError(f"vocab_size must be >= 2, got {vocab_size}")
    if not 0.0 < prune_fraction < 1.0:
        raise ValueError(
            f"prune_fraction must be in (0, 1), got {prune_fraction}"
        )
    hist = metaspace_word_histogram(
        df, text_col, replacement, prepend_scheme
    ).persist()
    try:
        if seed_size is None:
            seed_size = 10 * vocab_size
        # substring histogram, JVM-side: every (start, len) window of
        # every word, weighted by word freq
        subs = hist.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.length("word")),
                        lambda i: F.transform(
                            F.sequence(
                                F.lit(1),
                                F.least(
                                    F.lit(max_piece_len),
                                    F.length("word") - i + 1,
                                ),
                            ),
                            lambda l: F.substring(F.col("word"), i, l),
                        ),
                    )
                )
            ).alias("piece"),
            F.col("freq"),
        ).groupBy("piece").agg(F.sum("freq").alias("cnt"))
        # the literal string "<unk>" can occur in real text (dumped
        # model output, escaped markup); as a PIECE it would collide
        # with the reserved id-0 entry and make the serialized model
        # unloadable (duplicate piece) — excluded from seeding, so
        # such text segments through its characters instead
        subs = subs.where(F.col("piece") != F.lit("<unk>"))
        singles = {
            r["piece"]: float(r["cnt"])
            for r in subs.where(F.length("piece") == 1).collect()
        }
        if vocab_size - 1 <= len(singles):
            raise ValueError(
                f"vocab_size {vocab_size} cannot hold the {len(singles)} "
                "single characters + <unk> the corpus requires"
            )
        top_multi = (
            subs.where(F.length("piece") > 1)
            .orderBy(F.desc("cnt"), F.asc("piece"))
            .limit(max(0, seed_size - len(singles)))
            .collect()
        )
        expected = dict(singles)
        expected.update({r["piece"]: float(r["cnt"]) for r in top_multi})
        logp = _m_step(expected, m_step)

        target_pieces = vocab_size - 1  # index 0 is <unk>
        while True:
            for _ in range(em_iters):
                _, expected = unigram_e_step(hist, logp, max_piece_len)
                # coverage invariant: singles survive with floor mass
                # (posterior mass can underflow to EXACTLY 0.0 when a
                # whole-word piece dominates, so max-with-floor, not
                # setdefault)
                for ch in singles:
                    if expected.get(ch, 0.0) < 1e-12:
                        expected[ch] = 1e-12
                logp = _m_step(expected, m_step)
            multi = [p for p in logp if len(p) > 1]
            excess = len(logp) - target_pieces
            if excess <= 0:
                break
            drop_n = min(
                excess, max(1, int(len(multi) * prune_fraction))
            )
            # sentencepiece's likelihood-delta prune: drop the pieces
            # whose removal costs the corpus likelihood least
            losses = _prune_losses(logp, expected, max_piece_len, m_step)
            victims = sorted(
                multi, key=lambda p: (losses[p], p)
            )[:drop_n]
            for p in victims:
                del logp[p]
            # renormalize the survivors (dropping mass): exact M-step
            # over the surviving expected counts
            logp = _m_step(
                {p: max(expected.get(p, 0.0), 1e-12) for p in logp},
                m_step,
            )
        _, expected = unigram_e_step(hist, logp, max_piece_len)
        for ch in singles:
            if expected.get(ch, 0.0) < 1e-12:
                expected[ch] = 1e-12
        logp = _m_step(expected, m_step)
        vocab = [("<unk>", 0.0)] + [
            (p, logp[p])
            for p in sorted(
                logp, key=lambda p: (-expected.get(p, 0.0), p)
            )
        ]
        return vocab
    finally:
        hist.unpersist()


def sample_segment(
    text: str,
    scores: dict[str, float],
    unk_score: float,
    max_piece_len: int,
    alpha: float,
    rng,
) -> list[tuple[str, bool]]:
    """Subword regularization (Kudo 2018 §3): draw a segmentation
    with probability proportional to ``exp(alpha * score(seg))`` —
    exact forward-filtering / backward-sampling over the same
    lattice Viterbi maximizes. ``alpha`` is the inverse temperature:
    large alpha concentrates on the Viterbi argmax (pinned in
    tests), alpha=1 samples the true lattice posterior, small alpha
    flattens toward uniform-over-segmentations. ``rng`` is any
    object with ``random()`` — the caller owns determinism."""
    n = len(text)
    if n == 0:
        return []
    if alpha <= 0.0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    NEG = float("-inf")
    # edges[j] = (i, piece, known, alpha-scaled log score)
    edges: list[list[tuple[int, str, bool, float]]] = [
        [] for _ in range(n + 1)
    ]
    for j in range(1, n + 1):
        covered = False
        for l in range(1, min(max_piece_len, j) + 1):
            piece = text[j - l : j]
            lp = scores.get(piece)
            if lp is not None:
                edges[j].append((j - l, piece, True, alpha * lp))
                if l == 1:
                    covered = True
        if not covered:
            # the unknown node exists ONLY where no single-char piece
            # covers the character (the sentencepiece lattice rule) —
            # an unconditional unk edge would be harmless under
            # Viterbi's argmax but puts real probability mass on
            # spurious <unk> paths under sampling
            edges[j].append(
                (j - 1, text[j - 1], False, alpha * unk_score)
            )
    fwd = [NEG] * (n + 1)
    fwd[0] = 0.0
    for j in range(1, n + 1):
        for i, _, _, lp in edges[j]:
            if fwd[i] != NEG:
                fwd[j] = _logaddexp(fwd[j], fwd[i] + lp)
    out: list[tuple[str, bool]] = []
    j = n
    while j > 0:
        # categorical draw over incoming edges by posterior mass
        u = rng.random()
        acc = 0.0
        chosen = None
        for i, piece, known, lp in edges[j]:
            if fwd[i] == NEG:
                continue
            acc += math.exp(fwd[i] + lp - fwd[j])
            if u <= acc:
                chosen = (i, piece, known)
                break
        if chosen is None:  # float residue: take the last viable edge
            for i, piece, known, lp in reversed(edges[j]):
                if fwd[i] != NEG:
                    chosen = (i, piece, known)
                    break
        i, piece, known = chosen
        out.append((piece, known))
        j = i
    out.reverse()
    return out
