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

Scope is the honest subset the engine implements: plain
whitespace-pretokenized BPE with a single unk token — no added
tokens, normalizers, or byte-level pretokenizer sections (absent
sections simply aren't emitted; on load, unknown sections are
REJECTED loudly rather than silently dropped, so a byte-level GPT-2
tokenizer cannot masquerade as loadable).

Round-trip contract, pinned in tests/test_tokenio.py: save(train(C))
-> load -> encode == encode with the in-memory model, token for
token; and load(save(x)) == x exactly. Files go through the
Hadoop-FS helpers (operators/tableread.py), so an index on s3a://
works the same as a local path.
"""

from __future__ import annotations

import json

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


def to_tokenizer_json(
    merges: list[tuple[str, str]], vocab: dict[str, int]
) -> str:
    """The (vocab, merges) pair as a ``tokenizer.json`` document
    string — model section only, BPE type, unk declared."""
    doc = {
        "version": "1.0",
        "model": {
            "type": "BPE",
            "unk_token": UNK,
            "vocab": dict(sorted(vocab.items(), key=lambda kv: kv[1])),
            "merges": [f"{a} {b}" for a, b in merges],
        },
    }
    return json.dumps(doc, ensure_ascii=False, indent=2)


def from_tokenizer_json(text: str) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Parse the supported subset back to (merges, vocab). Raises on
    models this engine cannot faithfully run (non-BPE types,
    byte-level options, subword prefixes) instead of mis-tokenizing
    silently."""
    doc = json.loads(text)
    model = doc.get("model") or {}
    if model.get("type") != "BPE":
        raise ValueError(f"unsupported tokenizer model type: {model.get('type')!r}")
    unknown = set(model) - _SUPPORTED_MODEL_KEYS
    if unknown:
        raise ValueError(f"unsupported BPE model sections: {sorted(unknown)}")
    for opt in ("continuing_subword_prefix", "end_of_word_suffix"):
        if model.get(opt):
            raise ValueError(
                f"{opt}={model[opt]!r} is not supported (this engine runs "
                "plain whitespace-pretokenized BPE)"
            )
    if model.get("byte_fallback"):
        raise ValueError("byte_fallback is not supported")
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


def save_tokenizer(
    spark: SparkSession,
    path: str,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
) -> None:
    _fs_write_text(spark, path, to_tokenizer_json(merges, vocab))


def load_tokenizer(
    spark: SparkSession, path: str
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    text = _fs_read_text(spark, path)
    if text is None:
        raise FileNotFoundError(path)
    return from_tokenizer_json(text)


def tokenizer_report(
    df,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    slice_col: str | None = "lang",
):
    """Tokenizer fitness per corpus slice: (slice, n_docs, n_tokens,
    oov_rate, chars_per_token) — the two numbers a tokenizer is
    judged by before training commits to it (unknown-token leakage
    and compression; the fertility/coverage tables of every tokenizer
    paper). One encode pass (operators/encode.py's Arrow kernel) and
    one aggregation; unk is id 0 by the vocab contract."""
    from pyspark.sql import functions as F

    from utc_cuip_kafka_aws_connector_spark.operators.encode import bpe_encode

    ids = bpe_encode(df.select(id_col, text_col), merges, vocab)
    enriched = df.select(
        id_col,
        F.length(
            F.regexp_replace(F.col(text_col), r"\s+", "")
        ).alias("_chars"),
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
            F.size(F.filter(F.col("token_ids"), lambda t: t == F.lit(0)))
        ).alias("_unk"),
        F.sum("_chars").alias("_chars"),
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
    )
    return out.orderBy(*group) if group else out
