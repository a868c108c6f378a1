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
