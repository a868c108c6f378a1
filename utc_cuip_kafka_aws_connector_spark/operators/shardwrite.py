"""Training-shard materialization: write the curated, encoded corpus
as fixed-budget shard files WITH a verifiable manifest.

The last mile of the pipeline (normalize -> quality -> dedup ->
encode -> q98's shard ASSIGNMENT): trainers consume directories of
similarly-sized files plus a manifest they can trust for resumable,
checksummed streaming (the public WebDataset/Megatron data-shard
convention, re-expressed on parquet). This module takes the
(doc, token_ids, shard) assignment and makes it physical:

- ``write_shards``: one ``repartition(shard)`` so each shard's rows
  are written together (files track shards, not tasks — the same
  write-clustering rule as sinks.py's partitioned sink), emitted as
  ``shard=<n>/`` hive partitions of (id, token_ids).
- ``shard_manifest``: per shard — doc count, token count, min/max
  id, and an ORDER-INDEPENDENT content checksum (sum over docs of
  xxhash64(id, tokens-as-string) in unsigned 128-bit space via
  decimal(38,0) — commutative, so any task/partition order yields
  the same digest; the same trick as the driver gate's value hash).
- ``verify_shards``: recompute the manifest FROM THE WRITTEN FILES
  and diff against the stored manifest — the integrity check a
  training job runs before trusting a shard directory. Returns the
  mismatching shards (empty = clean).

Scale notes: manifest and verification are one partial-aggregating
groupBy each; the checksum never collects rows; re-verification
reads only (id, token_ids) columns.

Reference basis: public data-sharding practice (WebDataset,
Megatron-LM preprocessing); the reference repo's sink is a flat
to_csv (df_manager.py:82-84) with no manifest. SURVEY §2.D.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _digest(id_col: str, tokens_col: str) -> "F.Column":
    """Commutative per-shard content digest: unsigned per-row
    xxhash64 summed exactly in decimal(38,0)."""
    from decimal import Decimal

    row_hash = F.xxhash64(
        F.col(id_col), F.concat_ws(",", F.col(tokens_col).cast("array<string>"))
    )
    unsigned = row_hash.cast("decimal(38,0)") + F.lit(Decimal(2**63))
    return F.sum(unsigned).cast("decimal(38,0)")


def shard_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "token_ids",
    shard_col: str = "shard",
) -> DataFrame:
    """(shard, n_docs, n_tokens, min_id, max_id, digest) — one
    map-side-combining aggregation."""
    return (
        df.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens_col)).alias("n_tokens"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
            _digest(id_col, tokens_col).alias("digest"),
        )
        .orderBy(shard_col)
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    tokens_col: str = "token_ids",
    shard_col: str = "shard",
) -> DataFrame:
    """Write ``shard=<n>/`` hive partitions of (id, tokens) under
    ``path`` (shard-clustered: one repartition on the shard id so
    files track shards), write the manifest parquet beside them at
    ``<path>_manifest``, and return the manifest."""
    data = df.select(shard_col, id_col, tokens_col)
    (
        data.repartition(F.col(shard_col))
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(path)
    )
    manifest = shard_manifest(df, id_col, tokens_col, shard_col)
    manifest.write.mode("overwrite").parquet(path + "_manifest")
    return manifest


def verify_shards(
    spark,
    path: str,
    id_col: str = "doc_id",
    tokens_col: str = "token_ids",
    shard_col: str = "shard",
) -> DataFrame:
    """Recompute the manifest from the written shard files and return
    the rows that DISAGREE with the stored manifest (full outer join
    on shard; any null side or field mismatch is a corruption).
    Empty result = shard directory verified."""
    actual = shard_manifest(
        spark.read.parquet(path), id_col, tokens_col, shard_col
    ).select(
        F.col(shard_col),
        F.col("n_docs").alias("a_docs"),
        F.col("n_tokens").alias("a_tokens"),
        F.col("digest").alias("a_digest"),
    )
    stored = spark.read.parquet(path + "_manifest").select(
        F.col(shard_col),
        F.col("n_docs").alias("s_docs"),
        F.col("n_tokens").alias("s_tokens"),
        F.col("digest").alias("s_digest"),
    )
    return actual.join(stored, shard_col, "full_outer").filter(
        ~(
            (F.col("a_docs") == F.col("s_docs"))
            & (F.col("a_tokens") == F.col("s_tokens"))
            & (F.col("a_digest") == F.col("s_digest"))
        )
        | F.col("a_docs").isNull()
        | F.col("s_docs").isNull()
    )
