"""Streaming quantile monitor: a txlog-backed KLL sketch store
maintained per micro-batch — "p50/p95/p99 of document length (or
quality score) over everything ingested so far, per source, always
current" without ever rescanning the corpus. The quantile twin of
the HLL sketch-store maintenance composition (tests/
test_sketch_txlog.py) and the third member of the streaming monitor
tier (driftmon: windowed PSI; pplmon: windowed reference-model
perplexity; quantmon: running distribution shape).

Design: each micro-batch is sketched (operators/kll.kll_sketch — one
pass over the batch) and the resulting GRID-SIZED sketch rows are
appended to a transaction-log table with ``txn_id = batch id``, so a
replayed batch after a crash commits nothing twice (the txlog
exactly-once discipline; sources/txlog.py:24-33). Reads merge the
accumulated rows (operators/kll.kll_merge — the bound survives merge
in any order) and query quantiles; ``compact_store`` collapses the
per-batch rows to one per group via ``txn_upsert`` on the group keys
(all same-key rows replaced by the merged row — the snapshot-
compaction discipline stream-curate uses for its seen-hash state).

Scale/state story: state = sketch rows only — O(groups x batches x
k log(n/k) doubles) between compactions, O(groups) after one; the
data itself is never retained. Every read is a metadata-scale scan
of the store, not the stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.kll import (
    kll_merge,
    kll_quantiles,
    kll_sketch,
)
from utc_cuip_kafka_aws_connector_spark.sources import txlog

#: batch_id stamped on rows produced by compaction (a real micro-batch
#: id is never negative)
_COMPACTED = -1


def kll_store_updater(
    store_path: str,
    keys: list[str],
    value_col: str,
    k: int = 256,
):
    """foreachBatch body maintaining the sketch store: sketch the
    micro-batch, append the sketch rows idempotently. Use as
    ``stream.writeStream.foreachBatch(kll_store_updater(...))``.
    An all-null (or empty) batch appends nothing — not even an empty
    commit, so replay detection never depends on empty manifests."""

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        sk = kll_sketch(batch_df, keys, value_col, k=k).withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        )
        rows = sk.persist()
        try:
            if rows.limit(1).count():
                txlog.txn_append(
                    rows,
                    store_path,
                    txn_id=f"quantmon-{value_col}-{batch_id}",
                )
        finally:
            rows.unpersist()

    return _update


def store_quantiles(
    spark: SparkSession,
    store_path: str,
    qs: list[float],
    keys: list[str] | None = None,
) -> DataFrame:
    """(keys..., q, value) from everything the store has absorbed:
    merge the accumulated sketch rows (any number of batches plus any
    number of compacted rows — merge order never changes the
    guarantee) and query."""
    rows = txlog.read_snapshot(spark, store_path).drop("batch_id")
    return kll_quantiles(rows, qs, keys=keys or [])


def store_sketches(
    spark: SparkSession,
    store_path: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """The merged per-group sketch rows themselves (n_rows, vmin,
    vmax, levels) — for data cards that want the exact surfaces."""
    rows = txlog.read_snapshot(spark, store_path).drop("batch_id")
    return kll_merge(rows, keys=keys or [])


def compact_store(
    spark: SparkSession,
    store_path: str,
    keys: list[str] | None = None,
    txn_id: str | None = None,
) -> int:
    """Collapse per-batch rows to ONE row per group (txn_upsert on
    the group keys: every same-key row is replaced by the merged
    row). Estimates before and after are the same sketch state —
    compaction only bounds the store's row count. Returns the
    committed version. Keyless stores compact to a single row."""
    keys = keys or []
    merged = store_sketches(spark, store_path, keys=keys).withColumn(
        "batch_id", F.lit(_COMPACTED).cast("long")
    )
    # keyless stores upsert on fmt_v — constant on every row by
    # construction (kll_merge refuses mixed formats), so the single
    # merged row atomically replaces the whole table; delete+append
    # would be two commits with a crash window between them
    return txlog.txn_upsert(
        merged, store_path, keys or ["fmt_v"], txn_id=txn_id
    )
