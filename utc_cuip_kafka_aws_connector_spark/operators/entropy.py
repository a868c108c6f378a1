"""Entropy / compressibility quality signals.

The cheapest strong boilerplate detector in production corpus
filtering (used alongside the Gopher repetition rules —
operators/text.py:repetition_stats — and model-based scores —
operators/nbquality.py): machine-generated spam, template floods,
and binary-ish junk are outliers in CHARACTER-LEVEL statistics
that need no tokenizer, no model, no corpus pass:

- ``char_entropy``: Shannon entropy (bits/char) of the character
  histogram. Natural-language text sits ~3.5-4.5; single-char
  floods near 0; uniform random base64-ish noise near log2(64)=6.
- ``digram_entropy``: the same over adjacent character pairs,
  normalized per digram — catches "abababab..." floods that have
  high unigram but collapsed digram entropy.
- ``zlib_ratio``: DEFLATE compressed/raw byte ratio. Repetitive
  boilerplate compresses toward 0; prose lands ~0.4-0.7; already-
  compressed/random junk near (or above) 1. Both tails are filter
  candidates (Common Crawl practice).

One Arrow-batched pass, per-doc numpy histogram work (unigram via
np.unique on the byte codes, digram via a base-shift trick), zlib
from the stdlib; scan-local, no shuffle. Plain-Python single-doc
references live beside the kernel and the tests pin batch == single
exactly, mirroring dedup.py's _combine_shingles pattern.

Reference basis: Shannon 1948; public corpus-filtering practice
(CCNet / Gopher / RefinedWeb quality-signal families). The
reference repo has no text analysis (389 lines). SURVEY §2.D.
"""

from __future__ import annotations

import math
import zlib
from collections import Counter
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)


def char_entropy_one(text: str) -> float:
    """Single-doc reference: Shannon entropy (bits) of the char
    distribution; 0.0 for empty."""
    if not text:
        return 0.0
    n = len(text)
    return -sum(
        c / n * math.log2(c / n) for c in Counter(text).values()
    )


def digram_entropy_one(text: str) -> float:
    """Single-doc reference over adjacent char pairs; 0.0 when
    shorter than 2."""
    if len(text) < 2:
        return 0.0
    pairs = Counter(zip(text, text[1:]))
    n = len(text) - 1
    return -sum(c / n * math.log2(c / n) for c in pairs.values())


def zlib_ratio_one(text: str) -> float:
    """Single-doc reference: len(zlib(text)) / len(utf8(text)); 0.0
    for empty (nothing to judge)."""
    raw = text.encode("utf-8")
    if not raw:
        return 0.0
    return len(zlib.compress(raw, 6)) / len(raw)


def _entropy_columns(texts) -> dict[str, list]:
    """Per-text entropy/compressibility columns for one Arrow batch —
    the shared kernel of entropy_stats and with_entropy_cols."""
    ce, de, zr, ln = [], [], [], []
    for text in texts:
        codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        n = len(codes)
        ln.append(n)
        if n == 0:
            ce.append(0.0); de.append(0.0); zr.append(0.0)
            continue
        _, counts = np.unique(codes, return_counts=True)
        p = counts / n
        ce.append(float(-(p * np.log2(p)).sum()))
        if n < 2:
            de.append(0.0)
        else:
            # pair code = a * 2^21 + b (codepoints < 2^21)
            pair = codes[:-1].astype(np.uint64) << np.uint64(21)
            pair |= codes[1:].astype(np.uint64)
            _, pc = np.unique(pair, return_counts=True)
            q = pc / (n - 1)
            de.append(float(-(q * np.log2(q)).sum()))
        zr.append(zlib_ratio_one(text))
    return {
        "n_chars": ln,
        "char_entropy": ce,
        "digram_entropy": de,
        "zlib_ratio": zr,
    }


def entropy_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_chars, char_entropy, digram_entropy, zlib_ratio) per
    document — one scan-local Arrow pass; null text behaves as
    empty."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = _entropy_columns(pdf[text_col].fillna(""))
            yield pd.DataFrame({id_col: pdf[id_col], **cols})

    return df.select(id_col, text_col).mapInPandas(
        run,
        schema=(
            f"{id_col} long, n_chars long, char_entropy double, "
            "digram_entropy double, zlib_ratio double"
        ),
    )


def with_entropy_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Column-PRESERVING variant of entropy_stats: appends
    (char_entropy, digram_entropy, zlib_ratio) to whatever frame it
    is given, same Arrow kernel, no join — so a multi-signal pass
    (operators/report.py's single-scan data-card core) can stack the
    entropy leg onto an already-projected frame instead of paying a
    second corpus scan plus a shuffle to reunite the columns."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        df.schema.fields
        + [
            StructField("char_entropy", DoubleType()),
            StructField("digram_entropy", DoubleType()),
            StructField("zlib_ratio", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = _entropy_columns(pdf[text_col].fillna(""))
            out = pdf.copy()
            out["char_entropy"] = cols["char_entropy"]
            out["digram_entropy"] = cols["digram_entropy"]
            out["zlib_ratio"] = cols["zlib_ratio"]
            yield out

    return df.mapInPandas(run, schema=schema)
