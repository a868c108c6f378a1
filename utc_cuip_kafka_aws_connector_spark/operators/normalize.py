"""Unicode text normalization — the cleaning pass that runs BEFORE
every hash-based operator in a real corpus build.

Exact dedup, MinHash, BPE, n-gram decontamination all compare
BYTES; unnormalized unicode makes byte-identical content hash
differently ("ﬁle" vs "file", NFC vs NFD accents, fullwidth vs
ASCII digits, \\r\\n vs \\n), silently deflating dup rates and
splitting BPE statistics. The standard fix (CCNet, SentencePiece's
NFKC pretokenization — public practice) is a canonicalizing
normalize step. Spark SQL has no unicode-normalization builtin, so
this is a vectorized pandas kernel (``Series.str.normalize`` — ICU
via Python's unicodedata, batch-at-a-time, scan-local, no shuffle)
rather than a JVM expression; everything around it stays columnar.

Operations (each optional, applied in this order):
  form          unicodedata normalize: NFC | NFKC | NFD | NFKD
  strip_control remove Cc/Cf control & format chars (keeps \\n\\t)
  collapse_ws   any whitespace run -> one space, trim ends
  lower         str.lower() AFTER normalization (NFKC can produce
                uppercase expansions)
  strip_accents NFD-decompose then drop combining marks (Mn) —
                matches scikit-learn's strip_accents='unicode'

All transforms are idempotent (test-pinned: f(f(x)) == f(x)), so a
re-run over partially-normalized data is safe.

Reference basis: Unicode Standard Annex #15; the reference repo does
no text processing at all (389 lines, Kafka->csv). SURVEY §2.D.
"""

from __future__ import annotations

import re
import sys
import unicodedata
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS = re.compile(r"\s+")
_CLASS_CACHE: dict[str, re.Pattern] = {}


def _char_class(name: str) -> re.Pattern:
    """Build (once per worker, lazily — a full unicodedata sweep is
    ~1s, too slow for import time) a char-class regex for the
    combining marks (Mn) or the strippable control/format chars."""
    pat = _CLASS_CACHE.get(name)
    if pat is None:
        if name == "combining":
            chars = (
                chr(c)
                for c in range(sys.maxunicode + 1)
                if unicodedata.category(chr(c)) == "Mn"
            )
        else:  # control
            chars = (
                chr(c)
                for c in range(sys.maxunicode + 1)
                if unicodedata.category(chr(c)) in ("Cc", "Cf")
                and chr(c) not in "\n\t"
            )
        pat = re.compile("[" + re.escape("".join(chars)) + "]")
        _CLASS_CACHE[name] = pat
    return pat


def _normalize_series(
    s: pd.Series,
    form: str,
    lower: bool,
    strip_accents: bool,
    collapse_ws: bool,
    strip_control: bool,
) -> pd.Series:
    out = s.astype(str).str.normalize(form)
    if strip_control:
        out = out.str.replace(_char_class("control"), "", regex=True)
    if collapse_ws:
        out = out.str.replace(_WS, " ", regex=True).str.strip()
    if lower:
        out = out.str.lower()
    if strip_accents:
        out = (
            out.str.normalize("NFD")
            .str.replace(_char_class("combining"), "", regex=True)
            .str.normalize(form if form in ("NFC", "NFKC") else "NFC")
        )
    return out


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFKC",
    lower: bool = False,
    strip_accents: bool = False,
    collapse_ws: bool = True,
    strip_control: bool = True,
) -> DataFrame:
    """Normalized copy of ``text_col`` (in place when ``out_col`` is
    None). Scan-local vectorized kernel; nulls pass through as
    null. Idempotent for any option combination."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"form must be NFC/NFKC/NFD/NFKD, got {form!r}")
    target = out_col or text_col
    cols = list(df.columns)
    out_cols = cols + ([target] if target not in cols else [])
    fields = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" if c in df.columns else f"`{c}` string"
        for c in out_cols
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            live = pdf[text_col].notna()
            norm = _normalize_series(
                pdf[text_col][live],
                form,
                lower,
                strip_accents,
                collapse_ws,
                strip_control,
            )
            col = pdf[text_col].copy() if target == text_col else pd.Series(
                [None] * len(pdf), index=pdf.index, dtype=object
            )
            col[live] = norm
            out[target] = col
            yield out[out_cols]

    return df.mapInPandas(run, schema=fields)
