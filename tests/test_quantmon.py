"""streaming/quantmon.py: txlog-backed streaming KLL quantile store.

Evidence: a real file-stream end-to-end run (readStream ->
foreachBatch(kll_store_updater) -> availableNow) whose merged store
matches a one-shot batch sketch on the exact surfaces and stays
within the KLL bound on interior ranks, replay idempotence (same
batch id commits nothing twice — the txlog exactly-once discipline),
compaction (row count collapses to one per group, estimates carry
over unchanged state), keyless compaction atomicity via the fmt_v
upsert, and empty-batch no-commit behavior.
"""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.sources import txlog
from utc_cuip_kafka_aws_connector_spark.streaming.quantmon import (
    compact_store,
    kll_store_updater,
    store_quantiles,
    store_sketches,
)


def _batches(seed=7, n_batches=4, rows=3000):
    rng = np.random.default_rng(seed)
    out = []
    for b in range(n_batches):
        # distribution shifts across batches: the store must blend
        vals = rng.lognormal(b * 0.3, 1.0, rows)
        lang = rng.choice(["en", "de"], rows)
        out.append([(float(v), str(g)) for v, g in zip(vals, lang)])
    return out


def test_stream_end_to_end_matches_batch_sketch(spark, tmp_path):
    batches = _batches()
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    for b, rows in enumerate(batches):
        with open(incoming / f"b{b}.jsonl", "w") as f:
            for v, g in rows:
                f.write(json.dumps({"x": v, "lang": g}) + "\n")
    store = str(tmp_path / "store")
    src = (
        spark.readStream.schema("x double, lang string")
        .option("maxFilesPerTrigger", 1)
        .json(str(incoming))
    )
    q = (
        src.writeStream.foreachBatch(
            kll_store_updater(store, ["lang"], "x", k=256)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    all_rows = [r for b in batches for r in b]
    by_lang = {}
    for v, g in all_rows:
        by_lang.setdefault(g, []).append(v)

    sk = {r.lang: r for r in store_sketches(spark, store, keys=["lang"]).collect()}
    for g, vals in by_lang.items():
        assert sk[g].n_rows == len(vals)
        assert sk[g].vmin == min(vals) and sk[g].vmax == max(vals)
    est = {
        (r.lang, r.q): r.value
        for r in store_quantiles(spark, store, [0.1, 0.5, 0.9], keys=["lang"]).collect()
    }
    for g, vals in by_lang.items():
        srt = np.sort(vals)
        for q_ in (0.1, 0.5, 0.9):
            rank = np.searchsorted(srt, est[(g, q_)], side="right") / len(srt)
            assert abs(rank - q_) < 0.015, (g, q_, rank)

    # one commit per non-empty batch: 2 lang rows x 4 batches
    assert txlog.read_snapshot(spark, store).count() == len(batches) * 2


def test_replay_is_idempotent_and_empty_batch_commits_nothing(spark, tmp_path):
    store = str(tmp_path / "store")
    upd = kll_store_updater(store, [], "x", k=64)
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    upd(df, 0)
    v1 = txlog.read_snapshot(spark, store).collect()
    upd(df, 0)  # crash replay: same batch id
    v2 = txlog.read_snapshot(spark, store).collect()
    assert len(v1) == len(v2) == 1
    assert v1[0].n_rows == v2[0].n_rows == 3
    # a different batch id DOES commit
    upd(df, 1)
    assert txlog.read_snapshot(spark, store).count() == 2
    # all-null batch: nothing appended, no manifest written
    upd(spark.createDataFrame([(None,)], "x double"), 2)
    assert txlog.read_snapshot(spark, store).count() == 2
    [q] = store_quantiles(spark, store, [1.0]).collect()
    assert q.value == 3.0  # exact max across both commits


def test_compaction_keyed_and_keyless(spark, tmp_path):
    rng = np.random.default_rng(5)
    keyed = str(tmp_path / "keyed")
    upd = kll_store_updater(keyed, ["lang"], "x", k=64)
    data = {}
    for b in range(5):
        rows = [
            (float(v), g)
            for g in ("en", "de")
            for v in rng.normal(10 * (b + 1), 2, 500)
        ]
        for v, g in rows:
            data.setdefault(g, []).append(v)
        upd(spark.createDataFrame(rows, "x double, lang string"), b)
    assert txlog.read_snapshot(spark, keyed).count() == 10
    before = {
        (r.lang, r.q): r.value
        for r in store_quantiles(spark, keyed, [0.5], keys=["lang"]).collect()
    }
    compact_store(spark, keyed, keys=["lang"])
    snap = txlog.read_snapshot(spark, keyed)
    assert snap.count() == 2
    assert {r.batch_id for r in snap.collect()} == {-1}
    after = {
        (r.lang, r.q): r.value
        for r in store_quantiles(spark, keyed, [0.5], keys=["lang"]).collect()
    }
    assert before == after  # same sketch state, fewer rows
    # the compacted store keeps absorbing batches
    upd(spark.createDataFrame([(999.0, "en")], "x double, lang string"), 99)
    sk = {r.lang: r for r in store_sketches(spark, keyed, keys=["lang"]).collect()}
    assert sk["en"].vmax == 999.0
    assert sk["en"].n_rows == len(data["en"]) + 1

    keyless = str(tmp_path / "keyless")
    upd2 = kll_store_updater(keyless, [], "x", k=64)
    for b in range(3):
        upd2(spark.createDataFrame([(float(i + b),) for i in range(50)], "x double"), b)
    compact_store(spark, keyless)
    snap2 = txlog.read_snapshot(spark, keyless)
    assert snap2.count() == 1
    [r] = snap2.collect()
    assert r.n_rows == 150 and r.batch_id == -1
