"""WordPiece tokenization (the BERT family) — the one mainstream
``tokenizer.json`` model type the tokenizer tier still refused
(BPE, byte-level BPE, and Unigram live in operators/tokenio.py /
bytelevel.py / unigram.py). Published semantics throughout: the
greedy longest-match-first subword algorithm with ``##``
continuation (Devlin et al. 2018; the HF `tokenizers` WordPiece
model), BertNormalizer (clean_text, CJK spacing, optional accent
strip + lowercase), and BertPreTokenizer (whitespace split with
every punctuation character its own token).

Kept as its OWN module rather than a tokenio.py branch (landed r18
while tokenio was pinned under q127's resting r17 gate row); since
r19, ``tokenio.load_tokenizer_spec`` IS the generic entry point — it
dispatches ``model.type == "WordPiece"`` files to
``from_wordpiece_json`` here. The file-format guardrails are shared
by IMPORT (tokenio's ``_parse_post_processor`` and top-level section
law), so the two loaders cannot drift apart on what a tokenizer.json
may contain.

Algorithm (per pre-tokenized word): words longer than
``max_input_chars_per_word`` become ``unk`` outright; otherwise scan
greedily — at each position take the LONGEST vocab entry matching
(continuation positions try with the ``##`` prefix), and if no
entry matches at any position the WHOLE word becomes ``unk`` (the
published all-or-nothing rule, not a partial emit).

Scale shape: encoding is ONE Arrow-batched pandas UDF scan — the
vocab (a ~30k-entry dict for real BERT files) ships in the task
closure, there is no shuffle, no join, no driver data path; plan =
scan -> ArrowEvalPython -> project, same as bytelevel.spec_encode.

No `tokenizers`/`transformers` in this environment (FIXTURES.md):
the evidence is hand-authored differentials in
tests/test_wordpiece.py — expected token streams written out by
hand from the published algorithm, plus exact round-trips and loud
rejection of every id-altering section.
"""

from __future__ import annotations

import json
import re
import unicodedata
from dataclasses import dataclass, field
from functools import lru_cache

import pandas as pd  # module scope: the pandas_udf type hints resolve here
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
    _KNOWN_TOP_KEYS,
    _parse_post_processor,
)

_CJK_RANGES = (
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F), (0x2B740, 0x2B81F), (0x2B820, 0x2CEAF),
    (0xF900, 0xFAFF), (0x2F800, 0x2FA1F),
)


@dataclass(frozen=True)
class WordPieceSpec:
    """Everything the distributed encoder needs from a WordPiece
    ``tokenizer.json``: the vocab and unk/continuation conventions,
    the BertNormalizer switches, and the TemplateProcessing specials
    ([CLS]/[SEP] ids), applied only when the encoder is asked to
    (``add_special_tokens=``)."""

    vocab: dict[str, int]
    unk_token: str = "[UNK]"
    continuing_subword_prefix: str = "##"
    max_input_chars_per_word: int = 100
    clean_text: bool = True
    handle_chinese_chars: bool = True
    strip_accents: bool | None = None  # None: follow lowercase (HF)
    lowercase: bool = True
    added_tokens: dict[str, int] = field(default_factory=dict)
    # which added tokens the source file marked "special": true —
    # matching is identical either way (this engine's added-token
    # scan ignores the flag), but a serialized spec must re-emit each
    # token's flag VERBATIM or HF-interop consumers of the written
    # file see drifted metadata (ADVICE r19)
    added_specials: frozenset[str] = frozenset()
    special_prefix: list[int] = field(default_factory=list)
    special_suffix: list[int] = field(default_factory=list)


def _is_cjk(cp: int) -> bool:
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def _is_punctuation(ch: str) -> bool:
    """BERT's punctuation law: the four ASCII symbol runs plus every
    Unicode P* category character."""
    cp = ord(ch)
    if (
        33 <= cp <= 47
        or 58 <= cp <= 64
        or 91 <= cp <= 96
        or 123 <= cp <= 126
    ):
        return True
    return unicodedata.category(ch).startswith("P")


def normalize_text(text: str, spec: WordPieceSpec) -> str:
    """BertNormalizer, reproduced exactly: clean_text (drop control
    chars and U+FFFD, any whitespace -> one space char), CJK chars
    get surrounding spaces, NFD accent-strip (when strip_accents, or
    when it is None and lowercase is on), lowercase."""
    out = []
    for ch in text:
        cp = ord(ch)
        if spec.clean_text:
            if cp == 0 or cp == 0xFFFD or (
                unicodedata.category(ch).startswith("C") and ch not in "\t\n\r"
            ):
                continue
            if ch.isspace():
                out.append(" ")
                continue
        if spec.handle_chinese_chars and _is_cjk(cp):
            out.append(f" {ch} ")
            continue
        out.append(ch)
    s = "".join(out)
    strip = (
        spec.strip_accents
        if spec.strip_accents is not None
        else spec.lowercase
    )
    if strip:
        s = "".join(
            c
            for c in unicodedata.normalize("NFD", s)
            if unicodedata.category(c) != "Mn"
        )
    if spec.lowercase:
        s = s.lower()
    return s


def pretokenize(text: str) -> list[str]:
    """BertPreTokenizer: whitespace split, then every punctuation
    character becomes its own word."""
    words: list[str] = []
    for chunk in text.split():
        cur = []
        for ch in chunk:
            if _is_punctuation(ch):
                if cur:
                    words.append("".join(cur))
                    cur = []
                words.append(ch)
            else:
                cur.append(ch)
        if cur:
            words.append("".join(cur))
    return words


def encode_word(word: str, spec: WordPieceSpec) -> list[str]:
    """The greedy longest-match-first WordPiece split of one word
    (tokens, unk substituted per the all-or-nothing rule)."""
    if len(word) > spec.max_input_chars_per_word:
        return [spec.unk_token]
    pieces: list[str] = []
    pos = 0
    while pos < len(word):
        end = len(word)
        found = None
        while end > pos:
            sub = word[pos:end]
            if pos > 0:
                sub = spec.continuing_subword_prefix + sub
            if sub in spec.vocab:
                found = sub
                break
            end -= 1
        if found is None:
            return [spec.unk_token]
        pieces.append(found)
        pos = end
    return pieces


@lru_cache(maxsize=32)
def _added_token_pattern(tokens: tuple[str, ...]) -> re.Pattern:
    """Capturing alternation over the added tokens, longest first (the
    HF matching order: at each position the longest added token wins).
    Cached per distinct token SET — the UDF calls encode_text per
    document, and recompiling a ~5-entry alternation per doc would be
    pure waste."""
    alts = sorted(tokens, key=len, reverse=True)
    return re.compile("(" + "|".join(re.escape(t) for t in alts) + ")")


def encode_text(
    text: str, spec: WordPieceSpec, add_special_tokens: bool = False
) -> list[int]:
    """One document through added-token split -> normalize ->
    pretokenize -> per-word greedy split -> ids (the driver-side twin
    of the Spark kernel; the UDF calls exactly this).

    Added tokens match ATOMICALLY on the RAW text, before
    normalization (the HF convention, ADVICE r18): '[MASK]' in
    running text emits its own id — it is never lowercased to
    '[mask]' or punctuation-split into '[', 'mask', ']'. The loader
    only accepts added tokens with default matching flags
    (normalized=false, no lstrip/rstrip/single_word), so this raw
    exact-substring split IS the published behavior for the files it
    loads."""
    ids: list[int] = []
    unk_id = spec.vocab.get(spec.unk_token)
    if spec.added_tokens:
        segments = _added_token_pattern(
            tuple(sorted(spec.added_tokens))
        ).split(text or "")
    else:
        segments = [text or ""]
    for seg in segments:
        if not seg:
            continue
        tid = spec.added_tokens.get(seg)
        if tid is not None:
            ids.append(tid)
            continue
        for word in pretokenize(normalize_text(seg, spec)):
            for tok in encode_word(word, spec):
                tid = spec.vocab.get(tok, unk_id)
                if tid is None:
                    raise ValueError(
                        f"token {tok!r} missing from vocab and no "
                        "unk_token to fall back to"
                    )
                ids.append(tid)
    if add_special_tokens:
        ids = list(spec.special_prefix) + ids + list(spec.special_suffix)
    return ids


def spec_encode(
    df: DataFrame,
    spec: WordPieceSpec,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_special_tokens: bool = False,
    out_col: str = "token_ids",
) -> DataFrame:
    """(id_col, out_col): every document encoded to WordPiece ids —
    one Arrow-batched pandas UDF scan, vocab in the task closure, no
    shuffle."""

    @F.pandas_udf(ArrayType(IntegerType()))
    def enc(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_text(t, spec, add_special_tokens=add_special_tokens)
                for t in texts
            ]
        )

    return df.select(F.col(id_col), enc(F.col(text_col)).alias(out_col))


def decode_ids(ids: list[int], spec: WordPieceSpec) -> str:
    """ids -> text: space-joined words, ``##`` continuations fused.
    Exact inverse of encode on text that is already normalized,
    whitespace-canonical, and fully in-vocab (the achievable
    WordPiece round-trip — normalization is lossy by design)."""
    rev = {i: t for t, i in spec.vocab.items()}
    words: list[str] = []
    for i in ids:
        tok = rev.get(i)
        if tok is None:
            raise ValueError(f"id {i} is not in the vocab")
        if tok.startswith(spec.continuing_subword_prefix) and words:
            words[-1] += tok[len(spec.continuing_subword_prefix):]
        else:
            words.append(tok)
    return " ".join(words)


def spec_decode_df(
    df: DataFrame,
    spec: WordPieceSpec,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    out_col: str = "text",
) -> DataFrame:
    """Distributed inverse of ``spec_encode``: ``(id, out_col)`` via
    one Arrow-batched scan running ``decode_ids`` per row — the same
    shape (and the same inspection/debug purpose) as
    bytelevel.spec_decode_df, so the CLI's ``tokenizer --op decode``
    serves WordPiece specs through the identical plumbing. Exactness
    contract as ``decode_ids``: round-trips normalized,
    whitespace-canonical, fully in-vocab text; normalization is lossy
    by design."""

    def run(batches):
        for pdf in batches:
            texts = [
                decode_ids([int(t) for t in ids], spec)
                for ids in pdf[ids_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out_col: texts})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(ids_col)).mapInPandas(
        run, schema=f"{id_col} {id_type}, {out_col} string"
    )


def from_wordpiece_json(text: str) -> WordPieceSpec:
    """Parse a WordPiece-model ``tokenizer.json`` (the BERT-family
    shape). Accepts exactly what this module reproduces and raises
    on any id-altering section it cannot: other model types (BPE /
    byte-level / Unigram belong to tokenio.load_tokenizer_spec),
    truncation/padding, normalizers beyond BertNormalizer (or plain
    Lowercase, or absent), pre_tokenizers beyond BertPreTokenizer /
    WhitespaceSplit (or absent = whitespace), post-processors beyond
    the TemplateProcessing single-sequence specials (via tokenio's
    shared parser)."""
    doc = json.loads(text)
    if not isinstance(doc, dict):
        raise ValueError("tokenizer.json must be one JSON object")
    unknown = set(doc) - _KNOWN_TOP_KEYS
    if unknown:
        raise ValueError(f"unsupported tokenizer sections: {sorted(unknown)}")
    for sec in ("truncation", "padding"):
        if doc.get(sec) is not None:
            raise ValueError(
                f"{sec} is not supported (it would change tokenization; "
                "strip it or preprocess upstream)"
            )
    model = doc.get("model") or {}
    if model.get("type") != "WordPiece":
        raise ValueError(
            f"not a WordPiece model: {model.get('type')!r} (BPE/Unigram "
            "files load through tokenio.load_tokenizer_spec)"
        )
    known_model = {
        "type", "unk_token", "continuing_subword_prefix",
        "max_input_chars_per_word", "vocab",
    }
    bad = set(model) - known_model
    if bad:
        raise ValueError(f"unsupported WordPiece model sections: {sorted(bad)}")
    vocab_raw = model.get("vocab")
    if not vocab_raw:
        raise ValueError("tokenizer.json carries no vocab")
    vocab = {str(t): int(i) for t, i in vocab_raw.items()}

    # ABSENT normalizer is the IDENTITY (the HF convention) — every
    # Bert-specific behavior must be opted into by the file, or this
    # loader would silently tokenize differently than the file's real
    # tokenizer (review r18)
    clean_text, handle_cjk, strip_accents, lowercase = (
        False, False, False, False,
    )
    norm = doc.get("normalizer")
    if norm is not None:
        ntype = norm.get("type") if isinstance(norm, dict) else None
        if ntype == "BertNormalizer":
            clean_text = bool(norm.get("clean_text", True))
            handle_cjk = bool(norm.get("handle_chinese_chars", True))
            strip_accents = norm.get("strip_accents")  # None | bool
            lowercase = bool(norm.get("lowercase", True))
        elif ntype == "Lowercase":
            # HF's standalone Lowercase normalizer ONLY lowercases —
            # no accent strip (strip_accents=None would follow the
            # lowercase flag, which is BertNormalizer semantics, not
            # Lowercase's)
            lowercase = True
        else:
            raise ValueError(
                f"unsupported normalizer type for WordPiece: {ntype!r} "
                "(supported: BertNormalizer, Lowercase, absent)"
            )
    pre = doc.get("pre_tokenizer")
    if pre is not None:
        ptype = pre.get("type") if isinstance(pre, dict) else None
        if ptype not in ("BertPreTokenizer", "WhitespaceSplit"):
            raise ValueError(
                f"unsupported pre_tokenizer type for WordPiece: {ptype!r} "
                "(supported: BertPreTokenizer, WhitespaceSplit, absent)"
            )
        # WhitespaceSplit files skip punctuation isolation; this
        # engine's pretokenize always isolates punctuation, which
        # diverges on such files — refuse rather than mis-tokenize
        if ptype == "WhitespaceSplit":
            raise ValueError(
                "WhitespaceSplit WordPiece files are not supported (this "
                "engine reproduces BertPreTokenizer's punctuation "
                "isolation; a pure-whitespace split would tokenize "
                "differently)"
            )
    added: dict[str, int] = {}
    for tok in doc.get("added_tokens") or []:
        content, tid = str(tok["content"]), int(tok["id"])
        if vocab.get(content, tid) != tid:
            raise ValueError(
                f"added token {content!r} id {tid} conflicts with vocab "
                f"id {vocab[content]}"
            )
        # encode_text matches added tokens as raw exact substrings,
        # which is HF's behavior ONLY under the default matching flags
        # — a file asking for lstrip/rstrip whitespace absorption,
        # whole-word-only matching, or match-after-normalization would
        # tokenize differently, so refuse it rather than diverge
        # (ADVICE r18; real BERT files ship all-default flags)
        bad_flags = [
            f for f in ("single_word", "lstrip", "rstrip", "normalized")
            if tok.get(f)
        ]
        if bad_flags:
            raise ValueError(
                f"added token {content!r} sets unsupported matching "
                f"flag(s) {bad_flags} (this engine reproduces the "
                "default raw exact-substring matching only)"
            )
        added[content] = tid
        vocab[content] = tid
    added_specials = frozenset(
        str(tok["content"])
        for tok in doc.get("added_tokens") or []
        if tok.get("special")
    )
    special_prefix, special_suffix = _parse_post_processor(
        doc.get("post_processor"), vocab
    )
    unk = str(model.get("unk_token") or "[UNK]")
    if unk not in vocab:
        raise ValueError(f"unk_token {unk!r} is not in the vocab")
    return WordPieceSpec(
        vocab=vocab,
        unk_token=unk,
        continuing_subword_prefix=str(
            model.get("continuing_subword_prefix", "##")
        ),
        max_input_chars_per_word=int(
            model.get("max_input_chars_per_word", 100)
        ),
        clean_text=clean_text,
        handle_chinese_chars=handle_cjk,
        strip_accents=strip_accents,
        lowercase=lowercase,
        added_tokens=added,
        added_specials=added_specials,
        special_prefix=special_prefix,
        special_suffix=special_suffix,
    )
