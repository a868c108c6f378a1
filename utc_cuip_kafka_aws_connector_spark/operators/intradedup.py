"""Within-document repetition removal — scraped pages commonly
repeat whole paragraphs inside ONE document (templated sections,
pagination artifacts, scroll-duplicated content). Cross-document
machinery doesn't touch this: boilerplate.py strips lines frequent
ACROSS the corpus, and the dedup tier drops whole near-duplicate
documents; this operator keeps the first occurrence of each
paragraph WITHIN a document and drops the rest, preserving order.

Relation to substrdedup.py (ExactSubstr): that operator removes
repeated >= window-token spans across AND within documents via a
corpus-wide rolling-hash shuffle — the published heavy machinery.
This one is its cheap scan-local complement: paragraph-boundary-
aware, catches SHORT repeats (a 6-token nav header repeated five
times never reaches the 50-token window), and matches under
whitespace/case normalization, which exact hashing by construction
does not. Run this first in a cleaning chain; what survives and
still repeats at length is ExactSubstr's job.

Scale shape: one scan-local projection per document — zero UDFs,
shuffles, or joins; dedup state never leaves the row. The paragraph
array is normalized ONCE into (raw, norm) structs and the whole
computation runs inside one outer lambda over a single-element array
(the text.py idiom), so neither the split chain nor the
normalization re-evaluates per element despite the O(paragraphs^2)
first-occurrence scan — quadratic in PARAGRAPH COUNT per row, which
is small, not in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    sep: str = "\n\n",
    out_col: str | None = None,
    removed_col: str = "paras_removed",
) -> DataFrame:
    """Rewrites ``text_col`` (or ``out_col``) with duplicate
    paragraphs removed — first occurrence wins, order preserved —
    and adds ``removed_col`` counting the dropped paragraphs.

    Duplicate detection is on the NORMALIZED paragraph (lowercased,
    trimmed, inner whitespace collapsed), so cosmetic variation
    doesn't protect a repeat; the KEPT text is the raw first
    occurrence, untouched. Consequently all whitespace-only
    paragraphs normalize equal and only the first survives —
    repeated blank filler is exactly the artifact being removed.
    ``sep`` splits AND re-joins (pass ``"\\n"`` for line-level
    dedup). NULL text passes through NULL with 0 removed.
    Idempotent: a second application removes nothing."""
    norm = lambda c: F.regexp_replace(  # noqa: E731
        F.lower(F.trim(c)), r"\s+", " "
    )
    import re as _re

    # sep is a LITERAL separator (it re-joins verbatim), so the split
    # pattern must be regex-escaped — an unescaped "." or "|" would
    # split on everything
    paras = F.transform(
        F.split(F.col(text_col), _re.escape(sep), -1),
        lambda p: F.struct(p.alias("raw"), norm(p).alias("nrm")),
    )

    def first_only(arr):
        return F.filter(
            arr,
            lambda p, i: ~F.exists(
                F.slice(arr, 1, i), lambda q: q.nrm == p.nrm
            ),
        )

    # single-element-array idiom: `arr` is a bound variable, so the
    # split+normalize chain evaluates once per row, not per paragraph
    result = F.try_element_at(
        F.transform(
            F.array(paras),
            lambda arr: F.struct(
                F.array_join(
                    F.transform(first_only(arr), lambda p: p.raw),
                    sep,
                ).alias("txt"),
                (F.size(arr) - F.size(first_only(arr))).alias("dropped"),
            ),
        ),
        F.lit(1),
    )
    target = out_col or text_col
    # withColumns: BOTH expressions resolve against the ORIGINAL
    # frame — sequential withColumn would compute removed_col over
    # the already-replaced text when target == text_col
    return df.withColumns(
        {
            target: F.when(
                F.col(text_col).isNull(), F.lit(None)
            ).otherwise(result["txt"]),
            removed_col: F.when(F.col(text_col).isNull(), F.lit(0))
            .otherwise(result["dropped"])
            .cast("int"),
        }
    )
