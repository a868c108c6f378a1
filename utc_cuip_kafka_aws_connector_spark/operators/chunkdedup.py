"""Chunk-level deduplication -- the pipeline content-defined chunking
exists FOR: cut each document into edit-stable CDC chunks
(operators/chunking.py::content_defined_chunks), hash each chunk,
pick one canonical first occurrence per hash, and report per-document
how much of it duplicates the rest of the corpus. Filtering on the
ratio is the standard near-boilerplate / copy-contamination cut.

Own module on purpose: it composes operators.chunking without adding
weight to it; catalog entries built on it name both modules so the
gate fingerprint covers the whole dependency closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.chunking import (
    content_defined_chunks,
)


def chunk_dedup_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    boundary_prefix: str = "0",
) -> DataFrame:
    """Per-document duplicate-chunk statistics over content-defined
    chunks: (id, n_chunks, dup_chunks, dup_ratio), where a chunk
    occurrence is a duplicate unless it is the canonical (minimum
    (id, chunk_idx)) occurrence of its md5 hash corpus-wide --
    self-repeats within one document count too.

    Scale design: chunking is scan-local (zero shuffle); the
    canonical pick is a min-of-(id, idx)-struct over a window
    PARTITIONED BY the md5 chunk hash (uniformly distributed -- no
    skew) carrying only a 12-byte (id, idx) struct, never the chunk
    text; the final rollup shuffles by doc id. Chunk TEXT never rides
    through any shuffle. (r20: the window replaces the previous
    groupBy(hash) + join-back pair -- same values, but ONE exchange
    of the hashed stream instead of two and ONE chunking pass instead
    of two, since the join's probe side no longer re-derives the
    chunk subtree.)"""
    from pyspark.sql.window import Window as W

    chunks = content_defined_chunks(df, id_col, text_col, k, boundary_prefix)
    hashed = chunks.select(
        id_col,
        "chunk_idx",
        F.md5(F.col("chunk_text").cast("binary")).alias("chunk_hash"),
    )
    first = F.min(F.struct(F.col(id_col), F.col("chunk_idx"))).over(
        W.partitionBy("chunk_hash")
    )
    is_dup = (F.col(f"first.{id_col}") != F.col(id_col)) | (
        F.col("first.chunk_idx") != F.col("chunk_idx")
    )
    return (
        hashed.withColumn("first", first)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(is_dup.cast("long")).alias("dup_chunks"),
        )
        .withColumn(
            "dup_ratio", F.col("dup_chunks").cast("double") / F.col("n_chunks")
        )
    )
