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
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        (F.ceil((n - F.lit(chunk_size)) / F.lit(float(stride))) + 1).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(sep, F.slice(toks, i * stride + 1, chunk_size)),
    )
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
