"""Greedy sequence packing: assemble documents into fixed-token-budget
training sequences (the "sample packing" step of an LLM data pipeline).

Packing is inherently sequential WITHIN a sequence stream -- each
document's placement depends on the running total before it -- so the
scale design is the one real pipelines use: shard the corpus into many
independent streams and pack each stream sequentially in parallel.
Shards here are (group, md5-prefix-of-id) so the layout is
deterministic and content-addressed: reshuffling the input, retrying a
task, or re-running on another engine yields byte-identical packing
(same reproducibility argument as operators/sampling.py). At 100 TB
you raise the shard fan-out (one hex char -> 16 shards per group; two
-> 256, ...) until every shard fits one task comfortably; the
`applyInPandas` runs one Arrow batch per shard with a tight numpy/
python loop over a few thousand ints -- negligible next to the scan.

The greedy rule (first-fit in id order, oversized doc gets its own
sequence) is deliberately simple and exactly reproducible in ANSI SQL
(a WITH RECURSIVE running-sum-with-reset), which is what makes the
operator oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def with_shard(df: DataFrame, id_col: str, hex_chars: int = 1) -> DataFrame:
    """Deterministic content-addressed shard key: first ``hex_chars``
    of md5(id) -- 16^hex_chars shards, engine-portable."""
    return df.withColumn(
        "shard", F.substring(F.md5(F.col(id_col).cast("string")), 1, hex_chars)
    )


def pack_sequences(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Assign each row a ``seq_id`` within its group: rows are taken in
    ``id_col`` order and appended to the current sequence until adding
    one would exceed ``budget`` tokens, which starts the next sequence.
    A single row larger than the budget occupies its own sequence.

    Output = input columns + seq_id. Parallelism = number of groups;
    pass a sharded group key (``with_shard``) to scale out.
    """
    out_schema = StructType(list(df.schema.fields) + [StructField("seq_id", LongType())])

    def pack(pdf):
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        seq = 0
        acc = 0
        seqs = []
        for t in pdf[token_col].astype("int64"):
            t = int(t)
            if acc > 0 and acc + t > budget:
                seq += 1
                acc = 0
            acc += t
            seqs.append(seq)
        return pdf.assign(seq_id=seqs)

    return df.groupBy(*group_cols).applyInPandas(pack, out_schema)
