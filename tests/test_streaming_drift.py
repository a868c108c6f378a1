"""streaming/driftmon.py: per-window PSI monitoring.

Replay-based evidence plus an exact cross-check: the windowed PSI
must equal operators/drift.py's batch psi() on the same data slices
(same floors, same absent-bin charging) — the monitor back-tests
identically to how it runs live.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.drift import psi
from utc_cuip_kafka_aws_connector_spark.streaming.driftmon import (
    reference_profile,
    streaming_bucket_counts,
    window_psi,
)

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _rows(shift, minute):
    # 300 values 0..99 (+shift), all inside one 10-minute window
    return [
        (T0 + datetime.timedelta(minutes=minute, seconds=i % 500), float(i % 100 + shift))
        for i in range(300)
    ]


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("driftmon")
    ref = spark.createDataFrame(
        [(float(i % 100),) for i in range(1000)], "v double"
    )
    profile = reference_profile(ref, "v", nbins=10)
    # window 1: same distribution; window 2: shifted far out of range;
    # a third sentinel file advances the watermark past window 2's end
    # (append mode only emits a window once the watermark passes it,
    # and the watermark advances BETWEEN micro-batches — hence one
    # file per trigger)
    src = str(tmp / "in")
    import os

    os.makedirs(src, exist_ok=True)
    batches = [
        _rows(0, minute=1),
        _rows(400, minute=11),
        [(T0 + datetime.timedelta(minutes=40), 0.0)],
    ]
    for i, b in enumerate(batches):
        spark.createDataFrame(b, "ts timestamp, v double").coalesce(
            1
        ).write.parquet(f"{src}/b{i}")
        os.utime(src + f"/b{i}", (1_000 + i, 1_000 + i))
    stream = (
        spark.readStream.schema("ts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        streaming_bucket_counts(stream, "v", profile, window="10 minutes")
        .writeStream.format("memory")
        .queryName("driftmon")
        .outputMode("append")
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    counts = spark.sql("SELECT * FROM driftmon")
    return profile, counts


def test_stable_and_shifted_windows(spark, world):
    profile, counts = world
    out = window_psi(counts, profile).collect()
    assert len(out) == 2
    w1, w2 = out
    assert w1.n_rows == 300 and w2.n_rows == 300
    assert w1.verdict == "stable" and w1.psi < 0.05
    assert w2.verdict == "major" and w2.psi > 1.0
    assert w1.window_start.minute == 0 and w2.window_start.minute == 10


def test_windowed_psi_equals_batch_psi(spark, world):
    """Exact agreement with drift.psi on the same slice: build the
    window's mass vector by hand and compare to the monitor."""
    profile, counts = world
    got = {r.window_start.minute: r.psi for r in window_psi(counts, profile).collect()}
    bins = list(range(-1, profile["nbins"] + 1))
    for start_min, shift in ((0, 0), (10, 400)):
        vals = [v for _, v in _rows(shift, minute=0)]
        lo, hi, nb = profile["lo"], profile["hi"], profile["nbins"]
        width = (hi - lo) / nb
        hist = {b: 0 for b in bins}
        for v in vals:
            b = -1 if v < lo else (nb if v >= hi else min(int((v - lo) // width), nb - 1))
            hist[b] += 1
        qm = [hist[b] / len(vals) for b in bins]
        assert got[start_min] == pytest.approx(psi(profile["masses"], qm), rel=1e-9)


def test_reference_profile_validation(spark):
    empty = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(ValueError, match="non-null"):
        reference_profile(empty, "v")
