"""Line-level boilerplate detection and removal.

The dedup family in this repo works at document (operators/dedup.py),
chunk (operators/chunkdedup.py) and semantic (operators/semdedup.py)
granularity; web-scale corpora also need the LINE level: navigation
menus, cookie banners, "subscribe" calls-to-action and license
footers repeat across a large fraction of a crawl and survive all
coarser dedup because the documents AROUND them differ. Stripping
lines that recur across many distinct documents is the standard
preprocessing step (the line-dedup stage of CCNet, Wenzek et al.
2020, and the line-wise filters of RefinedWeb, Penedo et al. 2023);
this module is that operator, Spark-first:

1. ``frequent_lines`` — one pass: explode trimmed lines
   (scan-local), count DISTINCT docs per line with a map-side-
   combining aggregate keyed by the line text, keep lines above the
   ``min_docs`` / ``max_doc_fraction`` threshold and a minimum
   length (short strings like "Home" would otherwise over-trigger).
   The hot set is SMALL by construction: at threshold k its size is
   bounded by total_line_occurrences / k.
2. ``strip_boilerplate`` — remove those lines from every document,
   preserving the order and content of everything else. Two
   equivalent execution modes (differential-tested):
   - ``driver`` (default when the hot set fits ``driver_max_lines``):
     collect the hot set once and filter each document SCAN-LOCALLY
     with one vectorized Arrow pass (a Python set probe per line —
     no explode, no reassembly shuffle, no join). This is the 100 TB
     path: the corpus streams through untouched by any shuffle.
   - ``join`` (unbounded hot sets): posexplode lines, left-anti join
     against the hot-line frame on the line text, reassemble with
     one doc-keyed aggregation (sort_array over (pos, line)).
     Costs one corpus-sized shuffle; exists so a pathological corpus
     whose hot set exceeds driver memory still works.

Blank lines are never counted or stripped (they carry document
structure, not boilerplate), and stripping is idempotent.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lines(text_col: str):
    return F.split(F.col(text_col), "\n")


def frequent_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 10,
    max_doc_fraction: float | None = None,
    min_len: int = 5,
) -> DataFrame:
    """(line, n_docs) for every trimmed line of at least ``min_len``
    characters that occurs in ``min_docs`` or more DISTINCT documents
    (and, if given, in at least ``max_doc_fraction`` of the corpus —
    the fraction form keeps the threshold meaningful as the corpus
    grows). Distinctness per doc comes from array_distinct BEFORE the
    explode, so the count aggregate needs no count-distinct state."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    per_doc = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.transform(_lines(text_col), lambda l: F.trim(l)),
                    lambda l: F.length(l) >= min_len,
                )
            )
        ).alias("line"),
    )
    counts = per_doc.groupBy("line").agg(F.count(F.lit(1)).alias("n_docs"))
    threshold = F.lit(min_docs)
    if max_doc_fraction is not None:
        n = df.count()
        threshold = F.greatest(
            threshold, F.lit(int(n * max_doc_fraction) + 1)
        )
    return counts.filter(F.col("n_docs") >= threshold)


def strip_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 10,
    max_doc_fraction: float | None = None,
    min_len: int = 5,
    driver_max_lines: int = 1_000_000,
    hot: DataFrame | None = None,
) -> DataFrame:
    """``df`` with ``text_col`` rewritten: every line whose trimmed
    form is corpus-frequent (per ``frequent_lines``) removed, all
    other lines byte-preserved in order. Pass a precomputed ``hot``
    frame to reuse one detection across several strip calls."""
    if hot is None:
        hot = frequent_lines(
            df, id_col, text_col, min_docs, max_doc_fraction, min_len
        )
    head = hot.select("line").limit(driver_max_lines + 1).collect()
    if len(head) <= driver_max_lines:
        hot_set = frozenset(r.line for r in head)

        def strip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                pdf = pdf.copy()
                pdf[text_col] = [
                    "\n".join(
                        l for l in t.split("\n") if l.strip() not in hot_set
                    )
                    if t is not None
                    else None
                    for t in pdf[text_col]
                ]
                yield pdf

        return df.mapInPandas(strip, schema=df.schema)

    # unbounded hot set: distributed explode -> anti-join -> reassemble
    exploded = df.select(
        F.col(id_col),
        F.posexplode(_lines(text_col)).alias("pos", "raw"),
    ).withColumn("line", F.trim(F.col("raw")))
    kept = exploded.join(hot.select("line"), "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("pos"), F.col("raw")))
                ),
                lambda s: s.getField("raw"),
            ),
            "\n",
        ).alias(text_col)
    )
    others = [c for c in df.columns if c != text_col]
    # A null text produces no posexplode rows, so the doc is absent
    # from `rebuilt`; a fully-stripped doc is absent too. Only the
    # latter may coalesce to "" -- driver mode keeps null as null,
    # and the two modes must agree on every input.
    had_null = F.col(text_col).isNull().alias("__had_null_text")
    return (
        df.select(*others, had_null)
        .join(rebuilt, id_col, "left")
        .withColumn(
            text_col,
            F.when(F.col("__had_null_text"), F.lit(None).cast("string")).otherwise(
                F.coalesce(F.col(text_col), F.lit(""))
            ),
        )
        .select(*df.columns)  # original column order, both modes
    )
