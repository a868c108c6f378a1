"""BPE encode-to-ids: the final step of the tokenize pipeline
(train -> count -> ENCODE), emitting per-document token-id arrays
ready for sequence packing (operators/packing.py) and sharding
(q98's operator).

The pieces already exist — ``bpetrain.bpe_train_merges`` learns the
merge table, ``tokenizer.bpe_encode_word`` pins the per-word merge
semantics, ``bpe_token_count`` counts — but a training-data pipeline
ultimately materializes IDS. This module adds the deterministic
vocabulary and the Arrow-batched id encoder on top of the same two
imported primitives (no tokenizer.py/bpetrain.py edits):

- ``bpe_vocab(merges, chars)``: id 0 = ``<unk>``, then the base
  characters sorted, then each merge product in rank order — fully
  determined by (merges, chars), no corpus pass, no hash ids, so two
  clusters training on the same corpus emit identical id spaces.
- ``corpus_chars(df)``: the base character set as ONE distinct
  aggregation over the corpus (exploded per-word chars; map-side
  partial distinct keeps the shuffle at alphabet size).
- ``bpe_encode``: one mapInPandas pass (same per-executor word->ids
  Zipf cache as ``bpe_token_count``; the merge loop runs only on
  cache misses), emitting (id, token_ids array<int>). Symbols
  outside the vocab map to ``<unk>`` = 0.

Consistency contract (test-pinned): ``size(token_ids)`` equals
``bpe_token_count``'s n_tokens for every document, and decoding ids
through the inverted vocab reproduces the input text exactly up to
the whitespace the tokenizer discards (i.e. the concatenation of
its words).

Reference basis: Sennrich et al. 2016 (arXiv:1508.07909) /
SentencePiece's merge-list encoder — public algorithm; the reference
repo has no tokenizer (389 lines, Kafka->csv). SURVEY §2.D scope.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.tokenizer import (
    _WS,
    bpe_encode_word,
)

UNK = "<unk>"


def corpus_chars(df: DataFrame, text_col: str = "text") -> list[str]:
    """Sorted distinct non-whitespace characters of the corpus — the
    base alphabet for ``bpe_vocab``. One exploded distinct
    aggregation; the shuffle carries at most |alphabet| rows per
    partition after map-side partial distinct."""
    rows = (
        df.select(
            F.explode(
                F.split(F.regexp_replace(F.col(text_col), r"\s+", ""), "")
            ).alias("c")
        )
        .filter(F.col("c") != "")
        .distinct()
        .collect()
    )
    return sorted(r.c for r in rows)


def bpe_vocab(
    merges: list[tuple[str, str]], chars: list[str]
) -> dict[str, int]:
    """token -> id: ``<unk>``=0, base chars sorted, then merge
    products in rank order (first occurrence wins when a product
    repeats). Deterministic in its inputs."""
    vocab: dict[str, int] = {UNK: 0}
    for c in sorted(set(chars)):
        if c not in vocab:
            vocab[c] = len(vocab)
    for a, b in merges:
        t = a + b
        if t not in vocab:
            vocab[t] = len(vocab)
    return vocab


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "token_ids",
    cache_cap: int = 1_000_000,
    unk_id: int = 0,
) -> DataFrame:
    """(id, out_col array<int>): whitespace-split words (``\\s+``,
    empties dropped — the shared corpus tokenizer), each word
    BPE-encoded by the rank-order merge semantics and mapped through
    ``vocab`` (unknown symbol -> ``unk_id``; 0 under this repo's
    ``bpe_vocab`` contract — pass the looked-up id for an external
    vocab whose unk sits elsewhere). Scan-local: no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[int]] = {}

        def encode_word(w: str) -> list[int]:
            ids = cache.get(w)
            if ids is None:
                ids = [vocab.get(s, unk_id) for s in bpe_encode_word(w, merges)]
                if len(cache) < cache_cap:
                    cache[w] = ids
            return ids

        for pdf in batches:
            out = []
            for text in pdf[text_col].astype(str):
                ids: list[int] = []
                for w in _WS.split(text):
                    if w:
                        ids.extend(encode_word(w))
                out.append(ids)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: out})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, schema=f"{id_col} long, {out_col} array<int>"
    )


def decode_ids(ids: list[int], vocab: dict[str, int]) -> str:
    """Driver-side helper inverting ``bpe_encode`` for one document:
    concatenates the tokens (ids -> strings). Token boundaries inside
    words are unmarked by construction, so this reproduces the
    de-whitespaced text — the round-trip the tests check per word."""
    inv = {i: t for t, i in vocab.items()}
    return "".join(inv[i] for i in ids)
