"""Markdown code-fence separation — the code/prose ROUTING primitive
(extract.py turns HTML into text; this splits mixed markdown into
its prose stream and its fenced code blocks). Mixed documents are
the norm in scraped technical text, and the two halves want
different pipelines: prose goes through lang-id / quality / ppl
scoring (where embedded code wrecks every signal — code is
"low-quality English"), code goes to the code corpus keyed by its
fence language tag.

Fence grammar handled: triple-backtick fences with an optional info
string (``` ```lang`` ``), non-greedy to the next closing fence —
the CommonMark common case. An UNCLOSED trailing fence stays in the
prose verbatim (no match — stated, not silently swallowed); tilde
fences and indented code blocks are out of scope and pass through
as prose.

Scale shape: one scan-local projection (two ``regexp_extract_all``
calls zipped into the block structs + one ``regexp_replace`` for
the prose + codegen length arithmetic for the ratio). Zero UDFs,
shuffles, or joins; the same Java-regex pattern drives extraction
and removal so the two can never disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (?s): dot spans newlines; group 1 = info string, group 2 = body.
#: Both fences must sit at line start: the opening via ^, the closing
#: via the MANDATORY \n before ``` — an optional \n would let a code
#: line ENDING in ``` close the block early, leaking the rest of the
#: code into the prose stream (review r16).
_FENCE = r"(?s)(?m)^```([^\n`]*)\n(.*?)\n```[ \t]*$"


def split_code_fences(
    df: DataFrame,
    text_col: str = "text",
    prose_col: str = "prose",
    code_col: str = "code_blocks",
    ratio_col: str = "code_ratio",
) -> DataFrame:
    """Adds three columns: ``prose_col`` (the text with fenced blocks
    and their fence lines removed), ``code_col``
    (``array<struct<lang, code>>`` in document order — ``lang`` is
    the trimmed, lowercased info string, empty when absent), and
    ``ratio_col`` (fenced characters / total characters, 0.0 for
    empty or NULL text — the routing signal: a 0.9-code_ratio
    document belongs in the code corpus whatever its prose says).
    NULL text yields NULL prose, empty blocks, ratio 0.0."""
    text = F.col(text_col)
    langs = F.regexp_extract_all(text, F.lit(_FENCE), 1)
    bodies = F.regexp_extract_all(text, F.lit(_FENCE), 2)
    blocks = F.zip_with(
        langs,
        bodies,
        lambda lg, cd: F.struct(
            F.lower(F.trim(lg)).alias("lang"), cd.alias("code")
        ),
    )
    # full-whitespace trim (F.trim is space-only — removal leaves
    # newlines at the seams)
    prose = F.regexp_replace(
        F.regexp_replace(text, _FENCE, ""), r"^\s+|\s+$", ""
    )
    code_chars = F.aggregate(
        bodies,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.length(b),
    )
    total = F.length(text)
    ratio = F.when(
        F.coalesce(total, F.lit(0)) == 0, F.lit(0.0)
    ).otherwise(code_chars / total)
    return df.withColumns(
        {
            prose_col: prose,
            code_col: F.when(
                text.isNull(),
                F.expr(
                    "CAST(array() AS array<struct<lang:string,code:string>>)"
                ),
            ).otherwise(blocks),
            ratio_col: ratio,
        }
    )


def explode_code_blocks(
    df: DataFrame,
    id_col: str = "doc_id",
    code_col: str = "code_blocks",
) -> DataFrame:
    """(id, block_idx, lang, code): one row per fenced block — the
    code-corpus side of the route, keyed for joining back. Documents
    with no blocks produce no rows."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.col(code_col)).alias("block_idx", "__b"),
    ).select(
        id_col,
        "block_idx",
        F.col("__b.lang").alias("lang"),
        F.col("__b.code").alias("code"),
    )
