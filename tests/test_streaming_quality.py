"""Model-based quality filtering on a STREAM.

nb_log_odds aggregates per document (token explode -> groupBy), so
it cannot run as an unwatermarked append-mode streaming agg; the
production shape is the gate INSIDE ``foreachBatch`` — each
micro-batch is a plain DataFrame, the full batch operator applies
unchanged, and the filtered batch flows to the idempotent sink.
This test pins that deployment shape: a file-replayed stream gated
per micro-batch keeps exactly the docs the batch path keeps, across
multiple micro-batches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.nbquality import (
    nb_log_odds,
    nb_train,
)


def test_stream_quality_gate_matches_batch(spark, tmp_path):
    train = spark.createDataFrame(
        [(i, "clean prose sentence words " * 3, "keep") for i in range(20)]
        + [(20 + i, "junk spam garbled noise " * 3, "drop") for i in range(20)],
        "doc_id long, text string, lang string",
    )
    model = nb_train(train, label_col="lang")

    incoming = spark.createDataFrame(
        [(100, "clean prose sentence flowing"), (101, "junk spam mess"),
         (102, "words prose clean again"), (103, "garbled noise junk")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "incoming")
    incoming.write.parquet(src)

    batch_kept = {
        r.doc_id
        for r in nb_log_odds(incoming, model, "keep")
        .filter(F.col("log_odds") > 0)
        .collect()
    }
    assert batch_kept == {100, 102}

    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    kept: list[int] = []
    batches: list[int] = []

    def gate(batch_df, epoch_id):
        ok = nb_log_odds(batch_df, model, "keep").filter(F.col("log_odds") > 0)
        kept.extend(r.doc_id for r in ok.collect())
        batches.append(epoch_id)

    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert set(kept) == batch_kept and len(kept) == len(batch_kept)
