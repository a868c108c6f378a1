"""Positive-pair generation for contrastive pretraining — the
POSITIVE side of the retriever-training data story (operators/
negatives.py mines the hard negatives; this module manufactures the
(query, positive) pairs): independent cropping (two random spans of
the same document — the Contriever recipe, Izacard et al. 2022) and
the inverse cloze task (a span as query, the document MINUS the span
as positive — ICT, Lee et al. 2019).

Determinism (the sampling.py doctrine): span lengths and starts are
not RNG draws but content hashes — 13 hex chars of
``md5(id || ':' || seed || ':' || leg)`` (16^13 < 2^53, exact in a
double), so the same (id, seed) crops the same spans across
partitioning, retries, and engines, and the whole fixture is
replicable in pure Python for the differential test. Each leg
(query-length, query-start, positive-length, positive-start) salts
the hash differently, so the two crops are independent draws.

Scale shape: one scan-local projection per document — tokenize,
hash-derive the span geometry, slice, re-join. Zero UDFs, zero
shuffles, zero joins: a 100 TB corpus crops at full scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.arrayops import (
    ws_tokens,
)
from utc_cuip_kafka_aws_connector_spark.operators.hashdraw import (
    md5_uniform,
)

_STRATEGIES = ("crop", "ict")


def _draw(id_col: Column, seed: int, leg: str) -> Column:
    """Deterministic uniform in [0, 1) (hashdraw kernel)."""
    return md5_uniform(id_col, f"{int(seed)}:{leg}")


def _span(
    id_col: Column,
    n_toks: Column,
    min_tokens: int,
    max_tokens: int,
    seed: int,
    leg: str,
    len_cap: Column | None = None,
) -> tuple[Column, Column]:
    """(start, length) of one deterministic span: length uniform on
    [min_tokens, min(max_tokens, len_cap or n)], start uniform over
    EVERY valid position in the n-token document — both via
    floor(u * range), the inclusive-bounds form. ``len_cap`` caps
    only the length (the ICT remainder guarantee) without shrinking
    the start range, which would bias spans away from the tail."""
    hi = F.least(
        F.lit(max_tokens), len_cap if len_cap is not None else n_toks
    )
    n_lens = hi - F.lit(min_tokens) + 1
    length = F.lit(min_tokens) + F.floor(
        _draw(id_col, seed, leg + "len") * n_lens
    ).cast("int")
    n_starts = n_toks - length + 1
    start = (
        F.lit(1)
        + F.floor(_draw(id_col, seed, leg + "start") * n_starts).cast("int")
    )
    return start, length


def positive_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "crop",
    min_tokens: int = 4,
    max_tokens: int = 64,
    seed: int = 0,
) -> DataFrame:
    """(id, query, positive): one training pair per eligible
    document.

    ``crop``: two independently drawn spans of the same document —
    they may overlap (the Contriever setup trains through that).
    Documents with fewer than ``min_tokens`` whitespace tokens are
    dropped (no span fits).

    ``ict``: the drawn span is the query; the positive is the
    document with the span REMOVED (the retrieval-pretraining form:
    the model must match a sentence to its surrounding context, not
    to itself). Documents need at least ``min_tokens + 1`` tokens so
    the positive is never empty.

    NULL ids or texts are dropped. Whitespace tokenization; output
    spans re-join with single spaces (original inter-token
    whitespace is not preserved — stated, not hidden)."""
    if strategy not in _STRATEGIES:
        raise ValueError(
            f"strategy must be one of {_STRATEGIES}, got {strategy!r}"
        )
    if min_tokens < 1:
        raise ValueError(f"min_tokens must be >= 1, got {min_tokens}")
    if max_tokens < min_tokens:
        raise ValueError(
            f"max_tokens ({max_tokens}) must be >= min_tokens ({min_tokens})"
        )

    i = F.col(id_col)
    toks = ws_tokens(F.col(text_col))
    base = (
        df.filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(i.alias("id"), toks.alias("__t"))
        .withColumn("__n", F.size("__t"))
    )
    floor_n = min_tokens + 1 if strategy == "ict" else min_tokens
    base = base.filter(F.col("__n") >= floor_n)

    n = F.col("__n")
    # ict: the span may not swallow the whole document — cap its
    # LENGTH at n-1 so at least one token remains for the positive
    q_start, q_len = _span(
        F.col("id"),
        n,
        min_tokens,
        max_tokens,
        seed,
        "q",
        len_cap=(n - 1) if strategy == "ict" else None,
    )
    query = F.array_join(F.slice("__t", q_start, q_len), " ")

    if strategy == "crop":
        p_start, p_len = _span(
            F.col("id"), n, min_tokens, max_tokens, seed, "p"
        )
        positive = F.array_join(F.slice("__t", p_start, p_len), " ")
    else:
        before = F.slice("__t", 1, q_start - 1)
        after = F.slice(
            "__t", q_start + q_len, n - (q_start + q_len) + 1
        )
        positive = F.array_join(F.concat(before, after), " ")

    return base.select(
        F.col("id").alias(id_col),
        query.alias("query"),
        positive.alias("positive"),
    )
