"""Packed-example materialization: encoder output (token id arrays)
-> fixed-context-window training rows, the last step before
``shardwrite``.

Why this exists: trainers consume rows of EXACTLY ``context_len``
ids — multiple documents concatenated (optionally EOS-separated),
padded at the tail, with the document start offsets kept so the
trainer can reset attention/position state at boundaries (the
public "sequence packing" recipe of the GPT-3/T5/Megatron data
pipelines). The repo already assigns documents to sequences under a
token budget (operators/packing.py::pack_sequences, the q87 gate
operator); this module adds the materialization it stops short of.

Spark-first shape: sequence ASSIGNMENT reuses pack_sequences
(grouped applyInPandas — the one Python stage, vocabulary of groups
sized by ``with_shard``); materialization is ONE groupBy(shard,
seq_id) whose aggregation is entirely JVM higher-order expressions —
ordered collect_list of (id, ids) structs, flatten, slice/pad to the
window, and an ``aggregate`` fold for the running doc-start offsets.
No second Python stage, no driver involvement; parallelism = number
of (shard, seq) groups.

Truncation contract: a multi-document sequence NEVER exceeds the
budget (pack_sequences starts a new sequence instead), so only a
single document longer than ``context_len`` truncates — flagged in
the ``truncated`` column, never silent. Chunk long documents first
(operators/chunking.py) if truncation is unacceptable.

Reference basis: SURVEY §2.D training-data-pipeline scope; composes
q87's packing with the q112/q118 encoder family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.packing import (
    pack_sequences,
    with_shard,
)


def pack_token_ids(
    df: DataFrame,
    context_len: int,
    pad_id: int,
    eos_id: int | None = None,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    hex_chars: int = 1,
) -> DataFrame:
    """``(shard, seq_id, input_ids, n_docs, n_tokens, doc_starts,
    truncated)`` with ``size(input_ids) == context_len`` on every
    row. Documents fill sequences in ``id_col`` order within each
    shard (``with_shard``'s deterministic hex split — layout-
    independent); ``eos_id`` (if given) is appended to every
    document BEFORE budgeting, so the separator never pushes a
    sequence over the window."""
    if context_len < 1:
        raise ValueError(f"context_len must be >= 1, got {context_len}")
    if eos_id is None:
        body = F.col("__ids")
    else:
        body = F.concat(
            F.col("__ids"), F.array(F.lit(int(eos_id)).cast("int"))
        )
    sized = with_shard(
        df.select(
            F.col(id_col),
            F.col(ids_col).cast("array<int>").alias("__ids"),
        ),
        id_col,
        hex_chars=hex_chars,
    ).select(
        "shard",
        id_col,
        body.alias("__ids"),
        F.size(body).alias("__n"),
    )
    assigned = pack_sequences(
        sized, ["shard"], id_col, "__n", budget=context_len
    )

    docs = F.array_sort(
        F.collect_list(F.struct(F.col(id_col).alias("k"), F.col("__ids")))
    )
    arrs = F.transform(docs, lambda s: s.getField("__ids"))
    flat = F.flatten(arrs)
    total = F.size(flat)
    pad_n = F.greatest(F.lit(context_len) - total, F.lit(0))
    starts = F.aggregate(
        arrs,
        F.struct(
            F.expr("CAST(array() AS array<int>)").alias("bs"),
            F.lit(0).cast("int").alias("off"),
        ),
        lambda acc, x: F.struct(
            F.concat(acc.getField("bs"), F.array(acc.getField("off"))).alias(
                "bs"
            ),
            (acc.getField("off") + F.size(x)).cast("int").alias("off"),
        ),
        lambda acc: acc.getField("bs"),
    )
    # A truncated sequence's tail documents can start AT or BEYOND the
    # window edge; a trainer resetting attention at doc_starts would
    # index outside input_ids. Offsets are only meaningful inside the
    # window, so clip them to < context_len (ADVICE r12).
    starts = F.filter(starts, lambda off: off < F.lit(context_len))
    return assigned.groupBy("shard", "seq_id").agg(
        F.concat(
            F.slice(flat, 1, context_len),
            F.array_repeat(F.lit(int(pad_id)).cast("int"), pad_n),
        ).alias("input_ids"),
        F.count(F.lit(1)).alias("n_docs"),
        F.least(total, F.lit(context_len)).alias("n_tokens"),
        starts.alias("doc_starts"),
        (total > F.lit(context_len)).alias("truncated"),
    )
