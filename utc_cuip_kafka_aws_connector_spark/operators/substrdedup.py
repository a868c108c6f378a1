"""Exact repeated-substring dedup (the ExactSubstr operation of Lee
et al. 2022, "Deduplicating Training Data Makes Language Models
Better", arXiv:2107.06499): remove every repeated token span of at
least ``window`` tokens, keeping exactly one (canonical) occurrence.

Document- and chunk-level dedup (operators/dedup.py,
operators/chunkdedup.py) miss the common web-scale case of a long
quoted passage embedded in otherwise-distinct documents; span-level
dedup is the published fix. Lee et al. build a corpus-wide suffix
array; the Spark-native equivalent here is hash-windowed:

1. ``duplicate_windows`` — one Arrow pass per partition computes a
   polynomial ROLLING hash of every ``window``-token span: token
   hashes from pandas' vectorized 64-bit hasher, prefix-folded with
   odd base B under natural uint64 wraparound, position-normalized
   by powers of B^-1 (B odd => invertible mod 2^64), so each doc
   costs O(n) regardless of window size. Output is (doc, start,
   whash) — the same O(total tokens) working set a suffix array
   carries, streamed through a shuffle instead of held in RAM.
2. One whash-partitioned analytic window: a span repeated anywhere
   (across OR within docs) has >= 2 rows; the minimum (doc, start)
   is canonical, every other occurrence is marked for removal. One
   shuffle of the (doc, start, whash) stream total.
3. ``strip_duplicate_spans`` — per doc, merge the marked starts into
   maximal intervals ([start, start+window) unions) and rebuild the
   text without the covered tokens (one Arrow pass; the canonical
   occurrence of every span survives by construction).

Honesty notes. (a) Equality is 64-bit-hash equality: two DIFFERENT
spans collide with probability ~2^-64 per pair — the published
suffix-array form is exact; this is the standard large-scale
approximation and the differential tests treat the pure-Python
tuple-equality reference as ground truth on corpora small enough
that collisions cannot occur. (b) ``stride`` > 1 trades the output
row count down by stride x for detection granularity (a repeat is
caught once it spans window + stride - 1 tokens); stride=1 is the
exact published semantics. (c) "Canonical survives" is per-WINDOW:
when repeats overlap, the removed token set is the union of covered
non-canonical windows, exactly as the reference implementation
computes it.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = np.uint64(0x9E3779B97F4A7C15)  # odd => invertible mod 2^64
_B_INV = np.uint64(pow(int(_B), -1, 1 << 64))


def _window_hashes(tokens: list[str], window: int) -> np.ndarray:
    """uint64 rolling hashes of every window, O(n) vectorized."""
    n = len(tokens)
    if n < window:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = pd.util.hash_array(np.asarray(tokens, dtype=object)).astype(
            np.uint64
        )
        base = np.full(n, _B, dtype=np.uint64)
        base[0] = np.uint64(1)
        powers = np.multiply.accumulate(base)  # B^0 .. B^(n-1), mod 2^64
        inv = np.full(n, _B_INV, dtype=np.uint64)
        inv[0] = np.uint64(1)
        inv_powers = np.multiply.accumulate(inv)
        prefix = np.cumsum(h * powers, dtype=np.uint64)
        # sum over [i, i+w) of h[j] * B^j, then normalize by B^-i
        tail = prefix[window - 1 :].copy()
        tail[1:] -= prefix[: n - window]
        return tail * inv_powers[: n - window + 1]


def duplicate_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    stride: int = 1,
) -> DataFrame:
    """(doc, start, whash, canonical): one row per repeated-window
    occurrence corpus-wide — windows occurring exactly once are
    dropped before the output (the overwhelming majority; the shuffle
    still carries every window row into the groupBy, which is the
    operator's honest corpus-scale cost). ``canonical`` marks the
    minimum (doc, start) occurrence of each hash."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    # The kernel packs ids into an int64 vector; validate here rather
    # than letting np.full raise an opaque cast error deep inside the
    # Arrow worker (ADVICE r10).
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"duplicate_windows needs an integral {id_col!r} (got "
            f"{id_type}); map string ids to a surrogate long first, "
            "e.g. xxhash64(id) or a dimension join"
        )

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs, starts, hashes = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in (text or "").split() if t]
                wh = _window_hashes(toks, window)[::stride]
                if not len(wh):
                    continue
                docs.append(np.full(len(wh), did, dtype=np.int64))
                starts.append(
                    np.arange(0, len(wh) * stride, stride, dtype=np.int64)
                )
                hashes.append(wh.view(np.int64))  # bit-reinterpret to long
            if not docs:
                continue
            yield pd.DataFrame(
                {
                    "doc": np.concatenate(docs),
                    "start": np.concatenate(starts),
                    "whash": np.concatenate(hashes),
                }
            )

    rows = df.select(id_col, text_col).mapInPandas(
        emit, schema="doc long, start long, whash long"
    )
    # Repetition count and canonical pick over a whash-partitioned
    # window: ONE exchange of the window stream and ONE Arrow pass.
    # The previous groupBy(whash) + join-back pair shuffled the stream
    # twice AND re-ran the mapInPandas kernel for the join's probe
    # side (Catalyst cannot share a subtree across an aggregate and a
    # join input) -- at corpus scale that doubled both the Python
    # boundary cost and the shuffle bytes for identical output.
    from pyspark.sql.window import Window as W

    per_hash = W.partitionBy("whash")
    return (
        rows.select(
            "doc",
            "start",
            "whash",
            F.count(F.lit(1)).over(per_hash).alias("_n"),
            F.min(F.struct("doc", "start")).over(per_hash).alias("_first"),
        )
        .filter(F.col("_n") >= 2)
        .select(
            "doc",
            "start",
            "whash",
            (
                (F.col("doc") == F.col("_first.doc"))
                & (F.col("start") == F.col("_first.start"))
            ).alias("canonical"),
        )
    )


def strip_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    stride: int = 1,
) -> DataFrame:
    """``df`` with every non-canonical repeated span removed from
    ``text_col`` (tokens re-joined with single spaces — span surgery
    is token surgery; use exact dedup first if byte preservation of
    untouched docs matters). Other columns ride through."""
    dups = (
        duplicate_windows(df, id_col, text_col, window, stride)
        .filter(~F.col("canonical"))
        .groupBy("doc")
        .agg(F.sort_array(F.collect_set("start")).alias("starts"))
        .select(F.col("doc").alias(id_col), "starts")
    )
    joined = df.join(dups, id_col, "left")

    def cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.copy()
            out = []
            for text, starts in zip(pdf[text_col], pdf["starts"]):
                if text is None or starts is None or not len(starts):
                    out.append(text)
                    continue
                toks = [t for t in text.split() if t]
                drop = np.zeros(len(toks), dtype=bool)
                for s in starts:
                    drop[s : s + window] = True
                out.append(" ".join(t for t, d in zip(toks, drop) if not d))
            pdf[text_col] = out
            yield pdf.drop(columns=["starts"])

    out_schema = df.schema
    return joined.mapInPandas(cut, schema=out_schema).select(*df.columns)
