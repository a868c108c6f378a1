"""Sliding-window document chunking for training-data pipelines.

Splits each document's token stream into fixed-size windows with a
configurable stride (overlap = chunk_size - stride), the preprocessing
step behind long-context training splits and embedding generation.
Distinct from sequence PACKING (operators/packing.py combines many
short docs into one sequence; chunking splits one long doc into many
windows).

Scale design: the whole operator is Catalyst expressions -- tokenize,
a `transform` over the chunk-start sequence, and one generator-style
`posexplode`. That keeps it scan-local (no shuffle, no Python): each
document's chunks are produced inside the scan stage and stream
straight into whatever comes next, so a 100 TB corpus chunks at scan
throughput with zero state.

Window arithmetic (the standard tail-covering convention): every chunk
has exactly ``chunk_size`` tokens except possibly the last; chunk i
starts at token i*stride; the number of chunks is
``1 + ceil((n_tokens - chunk_size) / stride)`` for docs longer than a
chunk, else 1 -- so the final window always reaches the end of the
document and no suffix is lost, while no start position beyond the
last useful one emits a fully-contained duplicate tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 256,
    stride: int | None = None,
    sep: str = " ",
) -> DataFrame:
    """Explode each document into (id, chunk_idx, n_tokens, chunk_text)
    sliding windows. ``stride`` defaults to ``chunk_size`` (disjoint
    chunks); ``stride < chunk_size`` overlaps consecutive chunks by
    ``chunk_size - stride`` tokens. ``sep`` is treated as a LITERAL
    separator (regex-escaped before the split, so '.', '|' etc. work).

    NULL ``text_col`` rows produce zero output rows (posexplode over
    the NULL chunk array generates nothing) -- standard Spark explode
    semantics; filter or coalesce upstream if such docs must
    survive."""
    import re

    if stride is None:
        stride = chunk_size
    if chunk_size < 1 or stride < 1:
        raise ValueError(f"chunk_size and stride must be >= 1, got {chunk_size}, {stride}")
    if stride > chunk_size:
        raise ValueError(
            f"stride {stride} > chunk_size {chunk_size} would drop tokens between windows"
        )

    # F.split takes a Java regex while concat_ws joins literally --
    # escape so both sides agree on the SAME separator.
    toks = F.split(F.col(text_col), re.escape(sep))
    n = F.size(toks)

    # The chunk builder runs inside a single-element-array transform
    # (operators/arrayops.py's "other safe idiom") so the lambda's
    # ELEMENT is the token array: Catalyst does no CSE inside
    # higher-order-function lambdas, so the previous shape -- slicing
    # the CAPTURED ``toks`` per chunk position -- re-ran the split
    # once per chunk, O(len^2 / stride) per document (measured 73 s
    # -> 39 s on 512 x 20k-token docs at stride 16, where the
    # remaining cost is the inherent 16x output materialization, not
    # re-evaluation; BENCH_NOTES r16).
    # Reading ``tk`` below is a lambda-variable load, not a recompute.
    def _chunks(tk):
        n_tk = F.size(tk)
        n_chunks = F.when(n_tk <= chunk_size, F.lit(1)).otherwise(
            (F.ceil((n_tk - F.lit(chunk_size)) / F.lit(float(stride))) + 1).cast("int")
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(sep, F.slice(tk, i * stride + 1, chunk_size)),
        )

    # NULL text: toks is NULL, the wrapper is [NULL], _chunks(NULL)
    # folds to NULL, and [NULL][0] is NULL -- posexplode over NULL
    # still yields zero rows, byte-identical to the previous shape.
    chunks = F.transform(F.array(toks), _chunks)[0]
    return df.select(
        F.col(id_col),
        n.alias("_n"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).select(
        id_col,
        "chunk_idx",
        F.least(F.lit(chunk_size), F.col("_n") - F.col("chunk_idx") * stride)
        .cast("long")
        .alias("n_tokens"),
        "chunk_text",
    )


def content_defined_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    boundary_prefix: str = "0",
) -> DataFrame:
    """Content-defined chunking: a chunk boundary falls AFTER token i
    whenever the md5 of the k-gram ending at i starts with
    ``boundary_prefix`` (one hex char => expected chunk length 16
    tokens; two => 256). Unlike fixed-stride windows, boundaries
    depend only on LOCAL content, so inserting a sentence into a
    document shifts one chunk instead of re-cutting every window
    after it -- the property that makes chunk-level dedup robust to
    edits (the FastCDC/rolling-hash idea, re-expressed on tokens).

    Scale design: entirely Catalyst array expressions, formulated on
    BOUNDARY POSITIONS so every step is linear in the token count --
    one md5 per token for the boundary predicate, a filter to the
    boundary positions, and one slice per resulting chunk. (The naive
    per-token-chunk-id formulation needs an in-array prefix sum plus
    a per-chunk gather -- O(n^2) nested higher-order expressions,
    measured ~20x slower on the catalog corpus.) Scan-local: NO
    shuffle, no Python.

    Returns (id, chunk_idx, n_tokens, chunk_text); md5 is identical
    in Spark/DuckDB/Python, so boundaries are engine-portable.

    Implementation note: every intermediate array (tokens, boundary
    positions, chunk starts/ends) is BOUND AS A COLUMN between
    projection steps rather than inlined as an expression tree --
    a lambda that references an inline tree re-evaluates it per
    element (the tokenizer would run once per token: O(n^2) splits;
    measured ~40x slower), while a column reference reads the row's
    already-materialized value."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    step = df.select(F.col(id_col), toks.alias("_t")).filter(F.size("_t") > 0)
    t, n = F.col("_t"), F.size("_t")

    def is_boundary(i):
        # boundary after token i (never after the last token)
        start = F.greatest(i - (k - 1), F.lit(1))
        gram = F.concat_ws(" ", F.slice(t, start, i - start + 1))
        return (
            F.substring(F.md5(gram), 1, len(boundary_prefix))
            == F.lit(boundary_prefix)
        ) & (i < n)

    step = step.select(
        id_col,
        "_t",
        F.filter(F.sequence(F.lit(1), n), is_boundary).alias("_b"),
    )
    b = F.col("_b")
    step = step.select(
        id_col,
        "_t",
        "_b",
        F.concat(F.array(F.lit(1)), F.transform(b, lambda x: x + 1)).alias("_s"),
        F.concat(b, F.array(n)).alias("_e"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), F.size(b)),
        lambda c: F.slice(
            F.col("_t"),
            F.element_at(F.col("_s"), c + 1),
            F.element_at(F.col("_e"), c + 1) - F.element_at(F.col("_s"), c + 1) + 1,
        ),
    )
    return step.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_toks")
    ).select(
        id_col,
        "chunk_idx",
        F.size("_toks").cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.col("_toks")).alias("chunk_text"),
    )
