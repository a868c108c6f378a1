"""Byte-level BPE: the GPT-2 tokenizer family's representation,
wired into this repo's distributed train/encode stack.

Character-level BPE (operators/bpetrain.py + operators/encode.py)
carries an ``<unk>`` escape hatch because its alphabet is whatever
the training corpus happened to contain. The byte-level scheme
(Radford et al. 2019, the public ``openai/gpt-2`` ``encoder.py``;
the Hugging Face ``ByteLevel`` pretokenizer reimplements it) removes
unknowns entirely: text is UTF-8 encoded and every BYTE is mapped to
a printable stand-in character from a fixed 256-symbol alphabet, so
any string whatsoever is representable and BPE merges are learned
over byte-stand-in strings. This module provides that alphabet, the
GPT-2 pretokenizer split, a byte-level trainer (delegating the merge
loop to ``bpetrain.bpe_train`` over a byte-symbol histogram), and a
spec-driven distributed encoder that runs models loaded from real
``tokenizer.json`` files (operators/tokenio.py's ``TokenizerSpec``),
including SentencePiece-style ``byte_fallback`` (``<0xNN>`` tokens
for out-of-vocab characters, the Llama-family convention).

Alphabet (the published ``bytes_to_unicode`` construction): the 188
printable latin-1 bytes map to themselves; the remaining 68 bytes
map to U+0100.. in ascending byte order — a bijection, so decode is
exact. Space (0x20) maps to ``Ġ`` (U+0120), which is why GPT-2
merges look like ``("Ġ", "t")``.

Pretokenizer: the GPT-2 split regex (contractions, space-prefixed
letter runs, space-prefixed digit runs, space-prefixed punctuation
runs, trailing whitespace) expressed with stdlib ``re`` classes —
``\\p{L}`` as ``[^\\W\\d_]`` and ``\\p{N}`` as ``\\d``, exact for ASCII
and for all Unicode letters/decimal digits (only the rare Nl/No
number categories classify as letters instead of numbers; the
committed fixture pins ASCII parity). ``use_regex=False`` (an HF
ByteLevel option) skips the split and feeds whole texts to BPE.

Scale shape is identical to the character-level stack: training is
ONE corpus-scale histogram shuffle (here over pretokenized pieces)
and then vocab-sized merge iterations; encoding is one
Arrow-batched ``mapInPandas`` scan with a per-executor piece cache —
no shuffle, no collect of corpus data.
"""

from __future__ import annotations

import functools
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# GPT-2 split pattern. With the `regex` module (present in this
# container, probed r12) the EXACT published pattern runs — real
# \p{L}/\p{N} classes; without it, the stdlib approximation in the
# module docstring (identical on ASCII and all common text, Nl/No
# classify as letters instead of numbers).
try:
    import regex as _regex

    _GPT2_SPLIT = _regex.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d"
        r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
        r"|\s+(?!\S)|\s+"
    )
except ImportError:  # pragma: no cover - exercised only without `regex`
    _GPT2_SPLIT = re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d"
        r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+"
        r"|\s+(?!\S)|\s+"
    )


@functools.lru_cache(maxsize=1)
def byte_to_unicode() -> dict[int, str]:
    """byte value -> stand-in character (the published GPT-2
    bijection): printable latin-1 bytes map to themselves, the rest
    to consecutive codepoints from U+0100."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    mapping: dict[int, str] = {b: chr(b) for b in keep}
    n = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + n)
            n += 1
    return mapping


@functools.lru_cache(maxsize=1)
def unicode_to_byte() -> dict[str, int]:
    return {c: b for b, c in byte_to_unicode().items()}


def text_to_byte_symbols(piece: str) -> str:
    """One pretokenized piece -> its byte-stand-in symbol string (the
    string BPE merges operate on)."""
    table = byte_to_unicode()
    return "".join(table[b] for b in piece.encode("utf-8"))


def byte_symbols_to_text(symbols: str) -> str:
    """Exact inverse of ``text_to_byte_symbols`` (the alphabet is a
    bijection)."""
    table = unicode_to_byte()
    return bytes(table[c] for c in symbols).decode("utf-8")


def byte_pretokenize(
    text: str, add_prefix_space: bool = False, use_regex: bool = True
) -> list[str]:
    """The ByteLevel pretokenizer: optional leading-space injection
    (HF ``add_prefix_space``), then the GPT-2 split (or the whole
    text as one piece when ``use_regex`` is off)."""
    if add_prefix_space and text and not text.startswith(" "):
        text = " " + text
    if not use_regex:
        return [text] if text else []
    return _GPT2_SPLIT.findall(text)


@functools.lru_cache(maxsize=16)
def _metaspace_split_re(replacement: str):
    return re.compile(f"(?={re.escape(replacement)})")


def metaspace_pretokenize(
    text: str, replacement: str = "▁", prepend_scheme: str = "always"
) -> list[str]:
    """The sentencepiece Metaspace pretokenizer (T5/ALBERT/XLNet
    shape): literal spaces become ``replacement``, one is prepended
    under the "always"/"first" schemes (identical for a single
    sequence — "first" only differs for sequence PAIRS, which this
    corpus encoder never builds), and pieces start at each
    replacement occurrence. Only U+0020 is replaced — tabs/newlines
    pass through to the model, exactly as the published
    pretokenizer behaves."""
    if not text:
        return []
    text = text.replace(" ", replacement)
    if prepend_scheme != "never" and not text.startswith(replacement):
        text = replacement + text
    return [p for p in _metaspace_split_re(replacement).split(text) if p]


def byte_level_histogram(
    df: DataFrame,
    text_col: str = "text",
    add_prefix_space: bool = False,
    use_regex: bool = True,
) -> DataFrame:
    """(word, freq) over byte-symbol pretokenized pieces — the
    byte-level analogue of ``bpetrain.word_histogram`` and the single
    corpus-scale shuffle of byte-level training. The mapInPandas
    stage emits per-batch partial counts (a map-side combine in
    Python, bounding the shuffle at piece-vocabulary size), then one
    groupBy totals them."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts: dict[str, int] = {}
            for text in pdf[text_col].fillna("").astype(str):
                for piece in byte_pretokenize(text, add_prefix_space, use_regex):
                    sym = text_to_byte_symbols(piece)
                    counts[sym] = counts.get(sym, 0) + 1
            yield pd.DataFrame(
                {"word": list(counts), "freq": list(counts.values())}
            )

    partial = df.select(text_col).mapInPandas(run, "word string, freq long")
    return partial.groupBy("word").agg(F.sum("freq").alias("freq"))


def byte_level_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """token -> id for a byte-level model: the 256 alphabet symbols
    in byte order (ids 0..255 — total coverage, hence no unk), then
    merge products in rank order. Deterministic in ``merges``."""
    vocab: dict[str, int] = {}
    table = byte_to_unicode()
    for b in range(256):
        vocab[table[b]] = len(vocab)
    for a, b in merges:
        t = a + b
        if t not in vocab:
            vocab[t] = len(vocab)
    return vocab


def byte_level_train(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    add_prefix_space: bool = False,
    use_regex: bool = True,
    driver_vocab_rows: int | None = 2_000_000,
) -> DataFrame:
    """Learn a byte-level merge table: the byte-symbol histogram
    feeds ``bpetrain.bpe_train``'s merge loop unchanged (same
    deterministic tie-breaks, same collect-when-small crossover).
    Returns the (merge_rank, lhs, rhs, merged, pair_count) table;
    pair ``byte_level_vocab`` + ``tokenio.to_tokenizer_json(...,
    byte_level=True)`` to persist a loadable model."""
    from utc_cuip_kafka_aws_connector_spark.operators.bpetrain import bpe_train

    hist = byte_level_histogram(df, text_col, add_prefix_space, use_regex)
    return bpe_train(
        df,
        n_merges,
        text_col=text_col,
        driver_vocab_rows=driver_vocab_rows,
        histogram=hist,
    )


def ranked_bpe_encode(
    symbols, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Lowest-rank-first BPE (the published openai/gpt-2 encoder
    algorithm): repeatedly merge the best-ranked adjacent pair,
    leftmost occurrence first, until no pair has a rank. Linked-list
    + lazy heap: O(n log n) in the piece length and O(1) in the merge
    TABLE size — where the sequential-pass kernel
    (``tokenizer.bpe_encode_word``) costs O(n_merges * n) per piece,
    prohibitive at real vocabulary sizes (GPT-2 ships 50k merges,
    Llama 60k+). For well-formed learned tables the two produce
    identical output (the repo's pinned equivalence;
    tests/test_bytelevel.py differentials them on the fixtures and on
    randomized well-formed tables), so ``spec_encode`` uses this form
    unconditionally."""
    import heapq

    syms = list(symbols)
    n = len(syms)
    if n < 2:
        return syms
    nxt = list(range(1, n)) + [-1]
    prv = [-1] + list(range(n - 1))
    alive = [True] * n
    heap: list[tuple[int, int, str, str]] = []

    def push(i: int) -> None:
        j = nxt[i]
        if j != -1:
            r = ranks.get((syms[i], syms[j]))
            if r is not None:
                heapq.heappush(heap, (r, i, syms[i], syms[j]))

    for i in range(n - 1):
        push(i)
    while heap:
        _, i, a, b = heapq.heappop(heap)
        # lazy invalidation: the entry is live only if position i
        # still holds `a` and its live successor still holds `b`
        if not alive[i] or syms[i] != a:
            continue
        j = nxt[i]
        if j == -1 or syms[j] != b:
            continue
        syms[i] = a + b
        alive[j] = False
        nxt[i] = nxt[j]
        if nxt[i] != -1:
            prv[nxt[i]] = i
        if prv[i] != -1:
            push(prv[i])
        push(i)
    return [syms[i] for i in range(n) if alive[i]]


def _encode_piece_symbols(
    symbols: str,
    ranks: dict[tuple[str, str], int],
    vocab: dict[str, int],
    unk_id: int | None,
    byte_fallback: bool,
) -> list[int]:
    """Symbol string -> ids under the spec's miss policy: vocab hit,
    else <0xNN> byte tokens (byte_fallback), else unk, else a loud
    error — never a silent drop."""
    ids: list[int] = []
    for tok in ranked_bpe_encode(symbols, ranks):
        i = vocab.get(tok)
        if i is not None:
            ids.append(i)
            continue
        if byte_fallback:
            bts = [vocab.get(f"<0x{b:02X}>") for b in tok.encode("utf-8")]
            if all(b is not None for b in bts):
                ids.extend(bts)
                continue
        if unk_id is not None:
            ids.append(unk_id)
            continue
        raise ValueError(
            f"token {tok!r} is outside the vocab and the model declares "
            "no unk_token/byte_fallback escape"
        )
    return ids


def spec_encode(
    df: DataFrame,
    spec,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "token_ids",
    cache_cap: int = 1_000_000,
    add_special_tokens: bool = False,
    sample_alpha: float | None = None,
    sample_seed: int = 0,
) -> DataFrame:
    """(id, out_col array<int>) under a ``tokenio.TokenizerSpec`` —
    the one encoder for every model shape this engine loads:
    byte-level specs run ByteLevel pretokenize -> byte symbols ->
    merges; character-level specs apply the spec's normalizer ops
    (sentencepiece Prepend/Replace) then split per ``split_mode`` —
    "whitespace" (this repo's plain BPE) or "none" (the whole
    normalized text as ONE BPE sequence, the Llama shape) — with
    ``byte_fallback`` honored on vocab misses.
    ``add_special_tokens`` wraps each document in the spec's
    TemplateProcessing BOS/EOS ids (off by default: corpus pipelines
    insert document separators at packing time, not per-encode).
    One Arrow-batched scan, per-executor piece cache (short pieces
    only — whole-document sequences are not worth caching), no
    shuffle; the merge loop is ``ranked_bpe_encode``, O(len log len)
    per piece regardless of merge-table size."""
    ranks = {pair: r for r, pair in enumerate(spec.merges)}
    vocab = dict(spec.vocab)
    unk_id = vocab.get(spec.unk_token) if spec.unk_token else None
    byte_level = bool(spec.byte_level)
    add_prefix_space = bool(spec.add_prefix_space)
    use_regex = bool(getattr(spec, "use_regex", True))
    byte_fallback = bool(getattr(spec, "byte_fallback", False))
    norm_ops = tuple(getattr(spec, "normalizers", ()) or ())
    split_mode = getattr(spec, "split_mode", "whitespace")
    prefix = list(getattr(spec, "special_prefix", ())) if add_special_tokens else []
    suffix = list(getattr(spec, "special_suffix", ())) if add_special_tokens else []
    ws = re.compile(r"\s+")
    model_type = getattr(spec, "model_type", "BPE")
    if sample_alpha is not None and model_type != "Unigram":
        raise ValueError(
            "sample_alpha (subword regularization) applies only to "
            "Unigram models"
        )
    if model_type == "Unigram":
        from utc_cuip_kafka_aws_connector_spark.operators.unigram import (
            sample_segment,
            segments_to_ids,
            unigram_encode_piece,
            unigram_unk_score,
        )

        u_scores = dict(spec.scores)
        u_unk_score = unigram_unk_score(u_scores)
        u_max_len = max(len(p) for p in u_scores)
    meta_repl = getattr(spec, "metaspace_replacement", "▁")
    meta_prepend = getattr(spec, "metaspace_prepend", "always")

    def normalize(text: str) -> str:
        for op in norm_ops:
            if op[0] == "prepend":
                if text:  # HF Prepend is a no-op on the empty string
                    text = op[1] + text
            else:
                text = text.replace(op[1], op[2])
        return text

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[int]] = {}

        def encode_piece(piece: str) -> list[int]:
            ids = cache.get(piece)
            if ids is None:
                if model_type == "Unigram":
                    ids = unigram_encode_piece(
                        piece, u_scores, vocab, unk_id,
                        byte_fallback, u_unk_score, u_max_len,
                    )
                else:
                    symbols = (
                        text_to_byte_symbols(piece) if byte_level else piece
                    )
                    ids = _encode_piece_symbols(
                        symbols, ranks, vocab, unk_id, byte_fallback
                    )
                if len(piece) <= 256 and len(cache) < cache_cap:
                    cache[piece] = ids
            return ids

        for pdf in batches:
            out = []
            for doc_key, text in zip(
                pdf[id_col], pdf[text_col].fillna("").astype(str)
            ):
                text = normalize(text)
                if byte_level:
                    pieces = byte_pretokenize(text, add_prefix_space, use_regex)
                elif split_mode == "whitespace":
                    pieces = [w for w in ws.split(text) if w]
                elif split_mode == "metaspace":
                    pieces = metaspace_pretokenize(
                        text, meta_repl, meta_prepend
                    )
                else:  # "none": whole text, one sequence
                    pieces = [text] if text else []
                ids: list[int] = list(prefix)
                if sample_alpha is not None:
                    # subword regularization: every occurrence draws
                    # its own segmentation (no cache), deterministic
                    # in (seed, doc, occurrence) — layout-independent
                    for occ, piece in enumerate(pieces):
                        segs = sample_segment(
                            piece, u_scores, u_unk_score, u_max_len,
                            sample_alpha,
                            _det_rng(sample_seed, doc_key, occ),
                        )
                        ids.extend(
                            segments_to_ids(
                                segs, vocab, unk_id, byte_fallback
                            )
                        )
                else:
                    for piece in pieces:
                        ids.extend(encode_piece(piece))
                ids.extend(suffix)
                out.append(ids)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: out})

    # id column type passes through verbatim (string doc ids are as
    # legitimate as longs — the semdecontam genericity contract)
    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, schema=f"{id_col} {id_type}, {out_col} array<int>"
    )


def _det_rng(seed: int, doc_key, occurrence: int):
    """Seeded rng for one (document, piece-occurrence): blake2-keyed
    so draws are reproducible run-to-run and independent of partition
    layout (Python's salted str hash would not be)."""
    import hashlib
    import random

    digest = hashlib.blake2s(
        f"{seed}|{doc_key}|{occurrence}".encode()
    ).digest()
    return random.Random(int.from_bytes(digest[:8], "big"))


def decode_byte_ids(ids: list[int], vocab: dict[str, int]) -> str:
    """Driver-side inverse of byte-level encoding for one document:
    ids -> tokens -> stand-in symbols -> UTF-8 bytes -> text. Exact
    (the alphabet is a bijection and byte-level never drops)."""
    inv = {i: t for t, i in vocab.items()}
    return byte_symbols_to_text("".join(inv[i] for i in ids))


_BYTE_TOKEN = re.compile(r"<0x([0-9A-Fa-f]{2})>")


def spec_decode(ids: list[int], spec) -> str:
    """Driver-side inverse of ``spec_encode`` for one document (the
    verification helper, not a distributed op): strips the spec's
    special affixes, folds ``<0xNN>`` byte-fallback runs back into
    UTF-8, unmaps the byte-level alphabet, and inverts the
    sentencepiece normalizer ops (replaces undone in reverse order,
    then the prepend marker — as transformed by those undos —
    stripped from the front). Exact for every shape the loader
    accepts when the text round-trips at all (byte-level always;
    char-level up to the whitespace its split discards)."""
    inv = {i: t for t, i in spec.vocab.items()}
    toks = [inv[i] for i in ids]
    prefix = list(getattr(spec, "special_prefix", ()))
    suffix = list(getattr(spec, "special_suffix", ()))
    if prefix and ids[: len(prefix)] == prefix:
        toks = toks[len(prefix):]
    if suffix and len(toks) >= len(suffix) and ids[-len(suffix):] == suffix:
        toks = toks[: len(toks) - len(suffix)]
    parts: list[str] = []
    buf: list[int] = []
    for t in toks:
        m = _BYTE_TOKEN.fullmatch(t)
        if m:
            buf.append(int(m.group(1), 16))
            continue
        if buf:
            parts.append(bytes(buf).decode("utf-8"))
            buf = []
        parts.append(t)
    if buf:
        parts.append(bytes(buf).decode("utf-8"))
    s = "".join(parts)
    if spec.byte_level:
        return byte_symbols_to_text(s)
    if getattr(spec, "split_mode", "") == "metaspace":
        # undo Metaspace before the normalizer ops (encode order was
        # normalize -> metaspace-split)
        s = s.replace(getattr(spec, "metaspace_replacement", "▁"), " ")
        if getattr(spec, "metaspace_prepend", "always") != "never":
            s = s.removeprefix(" ")
    ops = tuple(getattr(spec, "normalizers", ()) or ())

    def undo_replaces(x: str) -> str:
        for op in reversed(ops):
            if op[0] == "replace":
                x = x.replace(op[2], op[1])
        return x

    s = undo_replaces(s)
    for op in ops:
        if op[0] == "prepend":
            s = s.removeprefix(undo_replaces(op[1]))
    return s


def spec_decode_df(
    df: DataFrame,
    spec,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    out_col: str = "text",
) -> DataFrame:
    """Distributed inverse of ``spec_encode``: ``(id, out_col)`` via
    one Arrow-batched scan running ``spec_decode`` per row — the
    inspection/debug path (sample packed shards back to text, audit
    a tokenizer swap). Same exactness contract as ``spec_decode``:
    byte-level always round-trips; char-level up to the whitespace
    its split discarded."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [
                spec_decode([int(t) for t in ids], spec)
                for ids in pdf[ids_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out_col: texts})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(ids_col)).mapInPandas(
        run, schema=f"{id_col} {id_type}, {out_col} string"
    )
