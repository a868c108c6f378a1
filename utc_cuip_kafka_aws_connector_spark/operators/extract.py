"""HTML-to-text extraction: the crawl front door of the curation
pipeline.

Web corpora arrive as markup; every downstream text operator in this
repo (quality, dedup, tokenization, boilerplate) assumes visible
text. This module is the extraction step, deliberately split so the
heavy lifting stays in whole-stage codegen:

1. JVM stage (pure ``regexp_replace`` chain, no Python):
   - drop ``<script>``/``<style>``/``<template>``/``<!-- -->``
     blocks wholesale (their content is never visible text);
   - convert block-level boundaries (``</p>``, ``</div>``,
     headings, list items, ``<br>``, table rows) to newlines so
     document STRUCTURE survives — which is exactly what
     ``operators/boilerplate.py`` keys on downstream;
   - strip every remaining tag to a space.
2. Arrow stage (one vectorized pass): entity unescape via the
   stdlib's ``html.unescape`` — named AND numeric entities, which a
   finite replace chain cannot cover — then whitespace
   normalization (spaces collapsed within lines, blank runs
   collapsed to one newline). The input to this stage is already
   tag-free, i.e. a fraction of the raw bytes.

This is a text EXTRACTOR, not an HTML parser: pathological markup
(unclosed scripts, tags inside attributes) degrades to extra
whitespace, never to an exception — the property the tests pin is
"visible text in, visible text out, garbage never crashes the
pipeline". Idempotent on plain text.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOCK_RE = (
    r"(?i)</?(p|div|h[1-6]|li|ul|ol|tr|table|blockquote|section|article|"
    r"header|footer|pre)\b[^>]*>|<br\s*/?>"
)
_DROP_RE = r"(?is)<(script|style|template)\b[^>]*>.*?</\1\s*>|<!--.*?-->"
_TAG_RE = r"<[^>]+>"


def html_text_expr(col: Column | str) -> Column:
    """The JVM half: markup removed, block boundaries as newlines,
    entities still escaped. Keep inside whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    no_hidden = F.regexp_replace(c, _DROP_RE, " ")
    blocks = F.regexp_replace(no_hidden, _BLOCK_RE, "\n")
    return F.regexp_replace(blocks, _TAG_RE, " ")


def html_to_text(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """``df`` with ``out_col`` (default: ``text_col`` replaced) as
    extracted visible text: JVM tag strip, then one Arrow pass for
    entity unescape + whitespace normalization."""
    out_col = out_col or text_col
    stripped = df.withColumn(out_col, html_text_expr(text_col))

    def finish(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import html
        import re

        ws = re.compile(r"[ \t\r\f\v]+")
        blanks = re.compile(r"\n\s*\n+")
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.copy()
            pdf[out_col] = [
                None
                if t is None
                else blanks.sub(
                    "\n",
                    "\n".join(
                        ws.sub(" ", line).strip()
                        for line in html.unescape(t).split("\n")
                    ),
                ).strip()
                for t in pdf[out_col]
            ]
            yield pdf

    return stripped.mapInPandas(finish, schema=stripped.schema)
