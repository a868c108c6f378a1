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

import atexit
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

# Scratch dirs staged by distributed_prefix_sum's measured path. The
# returned DataFrame reads them LAZILY, so they must outlive the call;
# their natural lifetime is the process. One atexit sweep removes them
# instead of leaking one dir per call (ADVICE r10).
_PSUM_STAGES: list[str] = []


def _psum_stage_dir() -> str:
    import tempfile

    stage = tempfile.mkdtemp(prefix="psum_offsets_")
    if not _PSUM_STAGES:
        atexit.register(_cleanup_psum_stages)
    _PSUM_STAGES.append(stage)
    return stage


def _cleanup_psum_stages() -> None:
    while _PSUM_STAGES:
        shutil.rmtree(_PSUM_STAGES.pop(), ignore_errors=True)


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


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    bucket_width: int = 1000,
    max_window_rows: int = 100_000,
    n_buckets: int | None = None,
) -> DataFrame:
    """Inclusive running sum of ``value_col`` in ``order_col`` order,
    without ever serializing the corpus through one task (the naive
    global ``ORDER BY`` window).

    Levels: per-row cumsum WITHIN ``order_col // bucket_width``
    buckets (hash-partitioned window), per-bucket totals via a
    map-side-combining groupBy, then bucket offsets. When the bucket
    count fits ``max_window_rows`` the offsets come from one tiny
    unpartitioned window and join back BROADCAST (the classic
    two-level prefix sum). When it does not -- 10^9+ rows at small
    widths -- the function RECURSES on the per-bucket totals, so no
    level's window ever exceeds ``max_window_rows`` rows: depth grows
    log_width(n) (a 10^12-row corpus at width 1000 is three levels).

    ``n_buckets`` skips the one-job bucket count when the caller
    knows the corpus size; leave None to measure (the count is over
    the already-aggregated totals, one row per bucket). Bucket ids
    divide by ``bucket_width`` each level, so sparse id spaces still
    terminate. Integer/decimal math only -- no float accumulation."""
    if bucket_width < 2:
        raise ValueError(f"bucket_width must be >= 2, got {bucket_width}")
    from pyspark.sql.window import Window as W

    bdf = df.withColumn(
        "_psum_bucket", (F.col(order_col) / bucket_width).cast("long")
    )
    within = bdf.withColumn(
        "_psum_in",
        F.sum(value_col).over(
            W.partitionBy("_psum_bucket")
            .orderBy(order_col)
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    totals = bdf.groupBy("_psum_bucket").agg(F.sum(value_col).alias("_psum_tot"))
    spark = df.sparkSession
    measured = n_buckets is None
    if measured:
        # ADVICE r7 (persist leak): the old measuring path cached
        # totals, counted, and NEVER unpersisted — one stranded frame
        # per call for the session lifetime, and any lazily-returned
        # alternative (persist-until-later, localCheckpoint) pins its
        # blocks just the same once the plan has executed. Instead,
        # materialize the measuring job's output DIRECTLY: collect at
        # most max_window_rows + 1 aggregate rows (the same bound
        # that caps the offsets window, ~16 bytes each — driver-safe
        # by the same argument that makes the broadcast below safe).
        # One job, same corpus-scan count as the old cached design,
        # and nothing left registered in the block manager.
        head = totals.limit(max_window_rows + 1).collect()
        n_buckets = len(head)
    if n_buckets <= max_window_rows:
        if measured:
            # The collected totals ARE the offsets input: compute the
            # exclusive prefix sum driver-side (exact integer/decimal
            # math, <= max_window_rows rows) — the classic two-level
            # prefix sum with driver offsets, replacing the old
            # cache + one-task window job.
            head.sort(key=lambda r: r[0])
            rows, run = [], 0
            for r in head:
                rows.append((r[0], run))
                run += r[1]
            from pyspark.sql.types import StructField, StructType

            tschema = {f.name: f for f in totals.schema.fields}
            offsets = spark.createDataFrame(
                rows,
                StructType(
                    [
                        tschema["_psum_bucket"],
                        StructField(
                            "_psum_off", tschema["_psum_tot"].dataType
                        ),
                    ]
                ),
            )
        else:
            offsets = totals.withColumn(
                "_psum_off",
                F.coalesce(
                    F.sum("_psum_tot").over(
                        W.orderBy("_psum_bucket").rowsBetween(
                            W.unboundedPreceding, -1
                        )
                    ),
                    F.lit(0).cast("long"),
                ),
            ).select("_psum_bucket", "_psum_off")
        joined = within.join(F.broadcast(offsets), "_psum_bucket")
    else:
        if measured:
            # Recursion with an unknown bucket count: cache totals so
            # the recursive tower doesn't re-aggregate the corpus per
            # level, but RELEASE the cache before returning by
            # staging the recursion's offsets to scratch storage (at
            # cluster scale this is an object-store staging table;
            # offsets are one row per bucket, far smaller than the
            # input) and returning a plain scan of the staged result.
            totals = totals.persist()
        try:
            rec = distributed_prefix_sum(
                totals.select(
                    F.col("_psum_bucket").alias("_psum_key"),
                    F.col("_psum_tot").alias("_psum_val"),
                ),
                "_psum_key",
                "_psum_val",
                out_col="_psum_cum",
                bucket_width=bucket_width,
                max_window_rows=max_window_rows,
            )
            offsets = rec.select(
                F.col("_psum_key").alias("_psum_bucket"),
                (F.col("_psum_cum") - F.col("_psum_val")).alias("_psum_off"),
            )
            if measured:
                stage = _psum_stage_dir()  # swept at process exit
                offsets.write.mode("overwrite").parquet(stage)
                offsets = spark.read.parquet(stage)
        finally:
            if measured:
                totals.unpersist()
        joined = within.join(offsets, "_psum_bucket")  # too big to broadcast
    return joined.withColumn(
        out_col, F.col("_psum_off") + F.col("_psum_in")
    ).drop("_psum_bucket", "_psum_in", "_psum_off")
