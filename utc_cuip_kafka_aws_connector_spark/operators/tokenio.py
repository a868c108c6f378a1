"""Tokenizer serialization in the public ``tokenizer.json`` shape.

The trainer (operators/bpetrain.py), the vocab builder and the
id encoder (operators/encode.py) close the in-repo loop, but a
tokenizer only earns its keep when the TRAINING stack can load it —
and the lingua franca there is the Hugging Face `tokenizers` JSON
layout (a public, documented format: one object with
``model.type = "BPE"``, ``model.vocab`` mapping token -> id and
``model.merges`` as rank-ordered ``"lhs rhs"`` strings). This module
writes and reads that subset, so a merge table learned here drops
into any consumer of that format, and a BPE model trained elsewhere
can drive this repo's distributed encoder.

Scope is the honest subset the engine implements, now in three
model shapes:

- plain whitespace-pretokenized BPE with a single unk token (this
  repo's character-level trainer),
- byte-level BPE (the GPT-2 family: ``pre_tokenizer.type ==
  "ByteLevel"``, no unk — operators/bytelevel.py holds the alphabet,
  pretokenizer, trainer and encoder), plus SentencePiece-style
  ``model.byte_fallback`` (``<0xNN>`` escape tokens, the
  Llama-family convention) on the character-level path, and
- Unigram (``model.type == "Unigram"``, the T5/ALBERT/XLNet
  family): piece scores drive operators/unigram.py's Viterbi
  segmentation; the sentencepiece ``Metaspace`` pre_tokenizer is
  supported for both model types.

``from_tokenizer_json_spec`` parses either shape into a
``TokenizerSpec`` that ``bytelevel.spec_encode`` runs distributed;
the legacy two-tuple ``from_tokenizer_json`` keeps its old contract
(plain models only — byte-level input still raises, pointing at the
spec API, so it can never silently mis-tokenize through the old
path). Sections this engine cannot faithfully run — normalizers,
non-ByteLevel pretokenizers, id-altering post-processors,
truncation/padding — are REJECTED loudly rather than silently
dropped. ``added_tokens`` are accepted and folded into the vocab;
the encoder deliberately does NOT carve special tokens out of
running text (special tokens are boundaries the training pipeline
inserts, not strings learned from documents).

Round-trip contract, pinned in tests/test_tokenio.py: save(train(C))
-> load -> encode == encode with the in-memory model, token for
token; and load(save(x)) == x exactly — for both shapes. Files go
through the Hadoop-FS helpers (operators/tableread.py), so an index
on s3a:// works the same as a local path.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from utc_cuip_kafka_aws_connector_spark.operators.encode import UNK
from utc_cuip_kafka_aws_connector_spark.operators.tableread import (
    _fs_read_text,
    _fs_write_text,
)

_SUPPORTED_MODEL_KEYS = {
    "type",
    "vocab",
    "merges",
    "unk_token",
    "dropout",
    "continuing_subword_prefix",
    "end_of_word_suffix",
    "fuse_unk",
    "byte_fallback",
    "ignore_merges",
}

# Top-level sections a real `tokenizers` file carries. Anything else
# is rejected: an unknown section could change tokenization.
_KNOWN_TOP_KEYS = {
    "version",
    "truncation",
    "padding",
    "added_tokens",
    "normalizer",
    "pre_tokenizer",
    "post_processor",
    "decoder",
    "model",
}


@dataclass(frozen=True)
class TokenizerSpec:
    """Everything the distributed encoder needs from a
    ``tokenizer.json``: the BPE tables plus the pretokenization,
    normalizer and escape options this engine supports.
    ``bytelevel.spec_encode`` consumes this directly.

    ``normalizers`` is the accepted sentencepiece-style op list in
    file order: ``("prepend", s)`` and ``("replace", old, new)`` —
    the Llama-family ``Prepend "▁" + Replace " "→"▁"`` shape.
    ``split_mode`` (char-level models): "whitespace" (this repo's
    \\s+ split, written as a WhitespaceSplit section) or "none" (no
    pre_tokenizer in the file — the sentencepiece convention: the
    whole normalized text is one BPE sequence). ``special_prefix`` /
    ``special_suffix`` are the TemplateProcessing single-sequence
    specials (BOS/EOS ids), applied only when the encoder is asked
    to (``add_special_tokens=``)."""

    merges: list[tuple[str, str]]
    vocab: dict[str, int]
    unk_token: str | None = UNK
    byte_level: bool = False
    add_prefix_space: bool = False
    use_regex: bool = True
    byte_fallback: bool = False
    added_tokens: dict[str, int] = field(default_factory=dict)
    normalizers: list[tuple] = field(default_factory=list)
    split_mode: str = "whitespace"
    special_prefix: list[int] = field(default_factory=list)
    special_suffix: list[int] = field(default_factory=list)
    # Unigram extensions (model.type == "Unigram", the T5/ALBERT/
    # XLNet family): piece -> log-prob scores drive operators/
    # unigram.py's Viterbi kernel; merges is empty for that shape.
    model_type: str = "BPE"
    scores: dict[str, float] = field(default_factory=dict)
    # Metaspace pre_tokenizer parameters (meaningful when
    # split_mode == "metaspace"): the space stand-in character and
    # whether it is prepended to the sequence ("always"/"first" vs
    # "never").
    metaspace_replacement: str = "▁"
    metaspace_prepend: str = "always"


def to_tokenizer_json(
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    byte_level: bool = False,
    add_prefix_space: bool = False,
    unk_token: str | None = UNK,
) -> str:
    """The (vocab, merges) pair as a ``tokenizer.json`` document
    string. Default shape is unchanged from earlier rounds (model
    section only, unk declared); ``byte_level=True`` emits the GPT-2
    shape instead — ByteLevel pre_tokenizer + decoder sections and no
    unk (byte coverage is total), loadable by any consumer of the
    public format."""
    doc: dict = {
        "version": "1.0",
        "model": {
            "type": "BPE",
            "unk_token": None if byte_level else unk_token,
            "vocab": dict(sorted(vocab.items(), key=lambda kv: kv[1])),
            "merges": [f"{a} {b}" for a, b in merges],
        },
    }
    if byte_level:
        section = {
            "type": "ByteLevel",
            "add_prefix_space": bool(add_prefix_space),
            "trim_offsets": True,
            "use_regex": True,
        }
        doc["pre_tokenizer"] = section
        doc["decoder"] = section
    else:
        # explicit, so the spec loader's absent-means-no-split
        # (sentencepiece) convention can never misread our files
        doc["pre_tokenizer"] = {"type": "WhitespaceSplit"}
    return json.dumps(doc, ensure_ascii=False, indent=2)


_SUPPORTED_UNIGRAM_KEYS = {"type", "vocab", "unk_id", "byte_fallback"}


def _parse_unigram_model(
    model: dict,
) -> tuple[dict[str, int], dict[str, float], str | None]:
    """The serialized Unigram model: ``vocab`` is a LIST of
    ``[piece, score]`` pairs whose index is the token id, ``unk_id``
    indexes the unk piece (or null for closed-vocabulary models).
    Returns (vocab piece->id, scores piece->score, unk_token)."""
    unknown = set(model) - _SUPPORTED_UNIGRAM_KEYS
    if unknown:
        raise ValueError(
            f"unsupported Unigram model sections: {sorted(unknown)}"
        )
    entries = model.get("vocab") or []
    vocab: dict[str, int] = {}
    scores: dict[str, float] = {}
    for i, entry in enumerate(entries):
        piece, score = entry[0], entry[1]
        piece = str(piece)
        if piece in vocab:
            raise ValueError(f"duplicate unigram piece: {piece!r}")
        vocab[piece] = i
        scores[piece] = float(score)
    if not vocab:
        raise ValueError("tokenizer.json carries no vocab")
    unk_id = model.get("unk_id")
    if unk_id is None:
        return vocab, scores, None
    unk_id = int(unk_id)
    if not 0 <= unk_id < len(entries):
        raise ValueError(
            f"unk_id {unk_id} is outside the {len(entries)}-entry vocab"
        )
    return vocab, scores, str(entries[unk_id][0])


def to_unigram_tokenizer_json(
    vocab_scores: list[tuple[str, float]],
    unk_id: int | None = 0,
    replacement: str = "▁",
    prepend_scheme: str = "always",
) -> str:
    """A trained unigram model (operators/unigram.py::unigram_train's
    ``[(piece, score), ...]`` list, index = id) as a Unigram
    tokenizer.json with the Metaspace pre_tokenizer — the T5-family
    shape, loadable by any consumer of the public format (and by
    ``from_tokenizer_json_spec``)."""
    doc = {
        "version": "1.0",
        "pre_tokenizer": {
            "type": "Metaspace",
            "replacement": replacement,
            "prepend_scheme": prepend_scheme,
            "split": True,
        },
        "decoder": {
            "type": "Metaspace",
            "replacement": replacement,
            "prepend_scheme": prepend_scheme,
            "split": True,
        },
        "model": {
            "type": "Unigram",
            "unk_id": unk_id,
            "vocab": [[p, float(s)] for p, s in vocab_scores],
            "byte_fallback": False,
        },
    }
    return json.dumps(doc, ensure_ascii=False, indent=2)


def save_unigram_tokenizer(
    spark: SparkSession,
    path: str,
    vocab_scores: list[tuple[str, float]],
    unk_id: int | None = 0,
) -> None:
    _fs_write_text(
        spark, path, to_unigram_tokenizer_json(vocab_scores, unk_id)
    )


def _parse_model(model: dict) -> tuple[list[tuple[str, str]], dict[str, int]]:
    if model.get("type") != "BPE":
        raise ValueError(f"unsupported tokenizer model type: {model.get('type')!r}")
    unknown = set(model) - _SUPPORTED_MODEL_KEYS
    if unknown:
        raise ValueError(f"unsupported BPE model sections: {sorted(unknown)}")
    for opt in ("continuing_subword_prefix", "end_of_word_suffix"):
        if model.get(opt):
            raise ValueError(
                f"{opt}={model[opt]!r} is not supported (this engine runs "
                "plain whitespace- or byte-level-pretokenized BPE)"
            )
    merges_raw = model.get("merges") or []
    merges: list[tuple[str, str]] = []
    for m in merges_raw:
        if isinstance(m, str):
            a, sep, b = m.partition(" ")
            if not sep or " " in b:
                raise ValueError(f"malformed merge entry: {m!r}")
            merges.append((a, b))
        else:  # tokenizers >= 0.20 also allows ["a", "b"] pairs
            a, b = m
            merges.append((str(a), str(b)))
    vocab = {str(t): int(i) for t, i in (model.get("vocab") or {}).items()}
    if not vocab:
        raise ValueError("tokenizer.json carries no vocab")
    return merges, vocab


def _parse_normalizer(norm) -> list[tuple]:
    """The accepted normalizer shapes: absent, ``Prepend``,
    ``Replace`` with a literal-string pattern, or a ``Sequence`` of
    those (the Llama/sentencepiece ``Prepend ▁ + Replace " "→"▁"``
    stack). Anything else would change tokenization in a way this
    engine does not reproduce — rejected loudly."""
    if norm is None:
        return []
    ntype = norm.get("type") if isinstance(norm, dict) else None
    if ntype == "Sequence":
        ops: list[tuple] = []
        for sub in norm.get("normalizers") or []:
            ops.extend(_parse_normalizer(sub))
        return ops
    if ntype == "Prepend":
        return [("prepend", str(norm.get("prepend", "")))]
    if ntype == "Replace":
        pat = norm.get("pattern")
        if isinstance(pat, dict) and "String" in pat:
            return [("replace", str(pat["String"]), str(norm.get("content", "")))]
        raise ValueError(
            "unsupported Replace normalizer pattern (only literal "
            f"String patterns run exactly): {pat!r}"
        )
    raise ValueError(
        f"unsupported normalizer type: {ntype!r} (supported: Prepend, "
        "Replace(String), Sequence of those, absent — e.g. NFC/NFKC "
        "must be applied upstream, operators/normalize.py)"
    )


def _parse_post_processor(post, vocab: dict[str, int]) -> tuple[list[int], list[int]]:
    """(prefix ids, suffix ids) a post-processor adds around a single
    sequence. ByteLevel only adjusts offsets (no ids); a
    TemplateProcessing ``single`` template of specials around one
    ``Sequence`` (the Llama BOS shape) parses to its id lists; any
    other processor would alter ids unpredictably — rejected."""
    if post is None:
        return [], []
    ptype = post.get("type")
    if ptype == "ByteLevel":
        return [], []
    if ptype == "TemplateProcessing":
        prefix: list[int] = []
        suffix: list[int] = []
        seen_seq = False
        for item in post.get("single") or []:
            if "SpecialToken" in item:
                tok = str(item["SpecialToken"]["id"])
                if tok not in vocab:
                    raise ValueError(
                        f"TemplateProcessing special {tok!r} is not in the "
                        "vocab/added_tokens"
                    )
                (suffix if seen_seq else prefix).append(vocab[tok])
            elif "Sequence" in item:
                if seen_seq:
                    raise ValueError(
                        "TemplateProcessing with multiple Sequence slots is "
                        "not supported"
                    )
                seen_seq = True
            else:
                raise ValueError(
                    f"unsupported TemplateProcessing item: {item!r}"
                )
        return prefix, suffix
    raise ValueError(
        f"unsupported post_processor type: {ptype!r} (it would alter "
        "token ids)"
    )


def from_tokenizer_json_spec(text: str) -> TokenizerSpec:
    """Parse a ``tokenizer.json`` into a ``TokenizerSpec`` — the full
    supported surface: plain whitespace BPE, byte-level (GPT-2
    family) BPE, sentencepiece-style normalizers + whole-text BPE
    with ``byte_fallback`` escapes (the Llama family, incl. its
    TemplateProcessing BOS/EOS recorded as special_prefix/suffix),
    ``added_tokens``. Raises on any section whose semantics this
    engine cannot reproduce (other normalizers, other pretokenizers,
    other post-processors, truncation/padding) instead of
    mis-tokenizing silently.

    Pre-tokenizer convention: ``WhitespaceSplit`` is this repo's
    ``\\s+`` split (the plain writer emits it explicitly); an ABSENT
    pre_tokenizer means NO split — the sentencepiece convention, the
    whole normalized text is one BPE sequence."""
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
    normalizers = _parse_normalizer(doc.get("normalizer"))

    byte_level = False
    add_prefix_space = False
    use_regex = True
    split_mode = "none"
    meta_repl = "▁"
    meta_prepend = "always"
    pre = doc.get("pre_tokenizer")
    if pre is not None:
        ptype = pre.get("type") if isinstance(pre, dict) else None
        if ptype == "ByteLevel":
            byte_level = True
            add_prefix_space = bool(pre.get("add_prefix_space", False))
            use_regex = bool(pre.get("use_regex", True))
        elif ptype == "WhitespaceSplit":
            split_mode = "whitespace"
        elif ptype == "Metaspace":
            # The sentencepiece space stand-in splitter (T5/ALBERT/
            # XLNet shape): spaces become `replacement`, pieces start
            # at each replacement occurrence, and the scheme decides
            # whether the sequence head gets one prepended.
            split_mode = "metaspace"
            meta_repl = str(pre.get("replacement", "▁"))
            if not meta_repl:
                raise ValueError("Metaspace replacement must be non-empty")
            scheme = pre.get("prepend_scheme")
            if scheme is None:  # legacy files carry a bool instead
                scheme = (
                    "always"
                    if pre.get("add_prefix_space", True)
                    else "never"
                )
            if scheme not in ("always", "first", "never"):
                raise ValueError(
                    f"unsupported Metaspace prepend_scheme: {scheme!r}"
                )
            meta_prepend = scheme
            if pre.get("split") is False:
                raise ValueError(
                    "Metaspace split=false is not supported (it changes "
                    "segmentation boundaries)"
                )
        else:
            raise ValueError(
                f"unsupported pre_tokenizer type: {ptype!r} (supported: "
                "ByteLevel, WhitespaceSplit, Metaspace, absent)"
            )
    # decoder: display-only (ids unaffected) -- accepted and ignored.

    model = doc.get("model") or {}
    model_type = "BPE"
    scores: dict[str, float] = {}
    if model.get("type") == "Unigram":
        model_type = "Unigram"
        if byte_level:
            raise ValueError(
                "ByteLevel pre_tokenizer with a Unigram model is not "
                "supported (no public tokenizer ships that shape)"
            )
        merges = []
        vocab, scores, unigram_unk = _parse_unigram_model(model)
    else:
        merges, vocab = _parse_model(model)
    added: dict[str, int] = {}
    for tok in doc.get("added_tokens") or []:
        content, tid = str(tok["content"]), int(tok["id"])
        if vocab.get(content, tid) != tid:
            raise ValueError(
                f"added token {content!r} id {tid} conflicts with vocab "
                f"id {vocab[content]}"
            )
        added[content] = tid
        vocab[content] = tid
    special_prefix, special_suffix = _parse_post_processor(
        doc.get("post_processor"), vocab
    )
    if model_type == "Unigram":
        unk = unigram_unk
    else:
        raw_unk = model.get("unk_token")
        unk = str(raw_unk) if raw_unk is not None else None
    return TokenizerSpec(
        merges=merges,
        vocab=vocab,
        unk_token=unk,
        byte_level=byte_level,
        add_prefix_space=add_prefix_space,
        use_regex=use_regex,
        byte_fallback=bool(model.get("byte_fallback")),
        added_tokens=added,
        normalizers=normalizers,
        split_mode=split_mode,
        special_prefix=special_prefix,
        special_suffix=special_suffix,
        model_type=model_type,
        scores=scores,
        metaspace_replacement=meta_repl,
        metaspace_prepend=meta_prepend,
    )


def from_tokenizer_json(text: str) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Legacy two-tuple loader: the plain whitespace-BPE subset only.
    Byte-level and byte_fallback models still RAISE here — code built
    on the (merges, vocab) pair would mis-tokenize them; load those
    through ``from_tokenizer_json_spec`` + ``bytelevel.spec_encode``
    instead."""
    spec = from_tokenizer_json_spec(text)
    if spec.model_type != "BPE" or spec.split_mode == "metaspace":
        raise ValueError(
            "unigram/metaspace tokenizer: load with "
            "from_tokenizer_json_spec and encode with "
            "bytelevel.spec_encode"
        )
    if spec.byte_level:
        raise ValueError(
            "byte-level tokenizer: load with from_tokenizer_json_spec and "
            "encode with bytelevel.spec_encode"
        )
    if spec.byte_fallback:
        raise ValueError(
            "byte_fallback tokenizer: load with from_tokenizer_json_spec "
            "and encode with bytelevel.spec_encode"
        )
    if spec.normalizers or spec.special_prefix or spec.special_suffix:
        raise ValueError(
            "sentencepiece-style tokenizer (normalizers/template "
            "specials): load with from_tokenizer_json_spec and encode "
            "with bytelevel.spec_encode"
        )
    # split_mode "none" (no pre_tokenizer section) is ambiguous: it is
    # BOTH this repo's pre-r12 bare emission (whose callers whitespace-
    # split, correctly) AND the sentencepiece whole-text convention
    # (which must NOT be whitespace-split). Accept only documents
    # matching the pre-r12 writer's exact shape — top-level
    # {version, model}, model keys {type, unk_token, vocab, merges} —
    # and route everything else to the spec loader (ADVICE r12).
    if spec.split_mode == "none":
        doc = json.loads(text)
        bare = set(doc) <= {"version", "model"} and set(
            doc.get("model", {})
        ) <= {"type", "unk_token", "vocab", "merges"}
        if not bare:
            raise ValueError(
                "tokenizer.json with no pre_tokenizer (sentencepiece "
                "whole-text convention): this legacy (merges, vocab) "
                "API whitespace-splits and would mis-tokenize it; load "
                "with from_tokenizer_json_spec and encode with "
                "bytelevel.spec_encode"
            )
    return spec.merges, spec.vocab


def save_tokenizer(
    spark: SparkSession,
    path: str,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    byte_level: bool = False,
    add_prefix_space: bool = False,
) -> None:
    _fs_write_text(
        spark, path, to_tokenizer_json(merges, vocab, byte_level, add_prefix_space)
    )


def load_tokenizer(
    spark: SparkSession, path: str
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    text = _fs_read_text(spark, path)
    if text is None:
        raise FileNotFoundError(path)
    return from_tokenizer_json(text)


def load_tokenizer_spec(spark: SparkSession, path: str):
    """``load_tokenizer`` for the full supported surface: the generic
    ``tokenizer.json`` entry point, dispatching on ``model.type``.
    BPE / byte-level BPE / Unigram files return a ``TokenizerSpec``
    (feed it to ``bytelevel.spec_encode``); WordPiece files — the
    BERT family, the last mainstream model type (r19) — return a
    ``wordpiece.WordPieceSpec`` (feed it to ``wordpiece.spec_encode``
    / ``spec_decode_df``). Dispatch is on the parsed document, so a
    malformed file hits the shared "must be one JSON object" error
    here rather than an AttributeError in a caller's sniffing code
    (ADVICE r18 cli.py). Callers that need one family only should
    isinstance-check the result."""
    text = _fs_read_text(spark, path)
    if text is None:
        raise FileNotFoundError(path)
    doc = json.loads(text)
    if not isinstance(doc, dict):
        raise ValueError("tokenizer.json must be one JSON object")
    model = doc.get("model")
    if isinstance(model, dict) and model.get("type") == "WordPiece":
        # lazy import: wordpiece.py imports this module's shared
        # section parsers at its top level
        from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
            from_wordpiece_json,
        )

        return from_wordpiece_json(text)
    return from_tokenizer_json_spec(text)


def encode_for_spec(
    df,
    spec,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "token_ids",
    cache_cap: int | None = None,
    add_special_tokens: bool = False,
    sample_alpha: float | None = None,
    sample_seed: int | None = None,
):
    """THE encoder dispatch for ``load_tokenizer_spec`` results
    (review r19: this decision used to be copy-pasted at four call
    sites): ``TokenizerSpec`` -> ``bytelevel.spec_encode``,
    ``WordPieceSpec`` -> ``wordpiece.spec_encode``. Both kernels
    share the ``(id_col, out_col array<int>)`` output contract.
    Raises ``ValueError`` when an ID-CHANGING BPE/Unigram-only knob
    (``sample_alpha``/``sample_seed`` subword regularization) is
    asked of the deterministic WordPiece kernel — callers surface
    that message verbatim. ``cache_cap`` is an implementation bound
    (the byte-level kernel's segmentation cache), not a semantics
    knob: the cache-free WordPiece kernel ignores it."""
    from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
        WordPieceSpec,
    )

    if isinstance(spec, WordPieceSpec):
        bad = [
            name
            for name, v in (
                ("sample_alpha", sample_alpha),
                ("sample_seed", sample_seed),
            )
            if v is not None
        ]
        if bad:
            raise ValueError(
                f"{'/'.join(bad)} only appl"
                f"{'y' if len(bad) > 1 else 'ies'} to BPE/Unigram "
                "models (subword regularization); WordPiece encoding "
                "is deterministic"
            )
        from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
            spec_encode as _wp_encode,
        )

        return _wp_encode(
            df,
            spec,
            id_col=id_col,
            text_col=text_col,
            add_special_tokens=add_special_tokens,
            out_col=out_col,
        )
    from utc_cuip_kafka_aws_connector_spark.operators.bytelevel import (
        spec_encode as _bl_encode,
    )

    kw = {} if cache_cap is None else {"cache_cap": cache_cap}
    return _bl_encode(
        df,
        spec,
        id_col=id_col,
        text_col=text_col,
        out_col=out_col,
        add_special_tokens=add_special_tokens,
        sample_alpha=sample_alpha,
        sample_seed=0 if sample_seed is None else sample_seed,
        **kw,
    )


def decode_for_spec(
    df,
    spec,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    out_col: str = "text",
):
    """``encode_for_spec``'s inverse dispatch: ``TokenizerSpec`` ->
    ``bytelevel.spec_decode_df``, ``WordPieceSpec`` ->
    ``wordpiece.spec_decode_df`` — one place to wire the next model
    family's decoder."""
    from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
        WordPieceSpec,
    )

    if isinstance(spec, WordPieceSpec):
        from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
            spec_decode_df as _decode,
        )
    else:
        from utc_cuip_kafka_aws_connector_spark.operators.bytelevel import (
            spec_decode_df as _decode,
        )
    return _decode(df, spec, id_col=id_col, ids_col=ids_col, out_col=out_col)


def tokenizer_report(
    df,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    slice_col: str | None = "lang",
    unk_token: str | None = UNK,
):
    """Tokenizer fitness per corpus slice: (slice, n_docs, n_tokens,
    oov_rate, chars_per_token) — the two numbers a tokenizer is
    judged by before training commits to it (unknown-token leakage
    and compression; the fertility/coverage tables of every tokenizer
    paper). One encode pass (operators/encode.py's Arrow kernel) and
    one aggregation. The unk id is looked up from the vocab's
    ``unk_token`` entry — an external tokenizer.json whose unk is not
    id 0 reports correctly (``None`` or an absent entry counts no
    token as unk, e.g. byte-level models with total coverage)."""
    from pyspark.sql import functions as F

    from utc_cuip_kafka_aws_connector_spark.operators.encode import bpe_encode

    unk_id = vocab.get(unk_token) if unk_token is not None else None
    # no unk in the vocab: misses get a sentinel no real token holds,
    # so they still count as OOV without colliding with token id 0
    eff_unk = unk_id if unk_id is not None else -1
    ids = bpe_encode(
        df.select(id_col, text_col), merges, vocab, unk_id=eff_unk
    )
    return _fitness_agg(df, ids, eff_unk, id_col, text_col, slice_col)


def tokenizer_report_spec(
    df,
    spec: TokenizerSpec,
    id_col: str = "doc_id",
    text_col: str = "text",
    slice_col: str | None = "lang",
):
    """``tokenizer_report`` for any loaded spec — the encode leg is
    ``encode_for_spec``'s family dispatch (bytelevel for
    ``TokenizerSpec``, so byte-level models, structurally zero-OOV,
    and byte_fallback models report through the same fitness columns
    as the plain path; wordpiece for ``WordPieceSpec``, r19); both
    kernels share the (id_col, token_ids) contract the aggregate
    consumes."""
    unk_id = spec.vocab.get(spec.unk_token) if spec.unk_token else None
    eff_unk = unk_id if unk_id is not None else -1
    ids = encode_for_spec(
        df.select(id_col, text_col), spec, id_col=id_col, text_col=text_col
    )
    return _fitness_agg(df, ids, eff_unk, id_col, text_col, slice_col)


def _fitness_agg(df, ids, eff_unk, id_col, text_col, slice_col):
    from pyspark.sql import functions as F

    enriched = df.select(
        id_col,
        F.length(
            F.regexp_replace(F.col(text_col), r"\s+", "")
        ).alias("_chars"),
        F.size(
            F.filter(
                F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
            )
        ).alias("_words"),
        *( [F.col(slice_col)] if slice_col and slice_col in df.columns else [] ),
    ).join(ids, id_col)
    group = (
        [slice_col]
        if slice_col and slice_col in enriched.columns
        else []
    )
    agg = enriched.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("token_ids")).alias("n_tokens"),
        F.sum(
            F.size(F.filter(F.col("token_ids"), lambda t: t == F.lit(eff_unk)))
        ).alias("_unk"),
        F.sum("_chars").alias("_chars"),
        F.sum("_words").alias("_words"),
    )
    out = agg.select(
        *group,
        "n_docs",
        "n_tokens",
        (F.col("_unk") / F.greatest(F.col("n_tokens"), F.lit(1))).alias(
            "oov_rate"
        ),
        (F.col("_chars") / F.greatest(F.col("n_tokens"), F.lit(1))).alias(
            "chars_per_token"
        ),
        # fertility: subword tokens per whitespace word — the third
        # number of every tokenizer-comparison table
        (F.col("n_tokens") / F.greatest(F.col("_words"), F.lit(1))).alias(
            "tokens_per_word"
        ),
    )
    return out.orderBy(*group) if group else out
