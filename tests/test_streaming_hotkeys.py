"""streaming/hotkeys.py: always-current Misra-Gries hot-key sketch.

Replay-based evidence (the repo's streaming test idiom): file-source
micro-batches with AvailableNow, memory sink, then batch assertions
on the reduced snapshot table — every truly hot key present, bounds
bracket the true frequency, state bounded by k per bucket, and
cross-batch accumulation (a key hot only in aggregate) detected.
"""

from __future__ import annotations

import os
import shutil
from collections import Counter

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.streaming.hotkeys import (
    _mg_fold,
    current_hot_keys,
    streaming_hot_keys,
)


def _write_batch(spark, values, dest: str, mtime: int):
    tmp = dest + "_tmp"
    spark.createDataFrame(
        [(v,) for v in values], "k string"
    ).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.copy(os.path.join(tmp, part), dest)
    os.utime(dest, (mtime, mtime))  # file source orders by mtime
    shutil.rmtree(tmp)


def _run(spark, stream_dir, tmp_path, name, **kw):
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        streaming_hot_keys(stream, "k", **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


BATCHES = [
    ["hot"] * 120 + [f"u{i}" for i in range(80)],
    ["hot"] * 60 + ["warm"] * 50 + [f"v{i}" for i in range(60)],
    # "creeper" is never hot within one batch, only in aggregate
    ["creeper"] * 30 + [f"w{i}" for i in range(40)],
    ["creeper"] * 35 + ["warm"] * 25 + [f"x{i}" for i in range(40)],
]


@pytest.fixture(scope="module")
def replayed(spark, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("hotkeys")
    stream_dir = str(tmp_path / "in")
    for i, batch in enumerate(BATCHES):
        _write_batch(spark, batch, f"{stream_dir}/b{i}.parquet", 1_000 + i)
    snaps = _run(spark, stream_dir, tmp_path, "hk_main", k=8, n_buckets=4)
    return snaps, Counter(v for b in BATCHES for v in b)


def test_all_hot_keys_present_with_honest_brackets(replayed):
    snaps, exact = replayed
    rows = current_hot_keys(snaps).collect()
    got = {r.value: (r.freq_lo, r.freq_hi) for r in rows}
    n = sum(exact.values())
    # detection: every key above n/8 must be a candidate
    for v, f in exact.items():
        if f > n / 8:
            assert v in got, (v, f)
    # honesty: bracket contains the true frequency for every candidate
    for v, (lo, hi) in got.items():
        assert lo <= exact[v] <= hi, (v, lo, exact[v], hi)
    # the cross-batch accumulator is found even though no single batch
    # made it hot
    assert "creeper" in got
    assert got["hot"][0] >= 150  # weight survives near-exact for the top key


def test_state_is_k_bounded_per_bucket(replayed):
    snaps, _ = replayed
    from pyspark.sql.window import Window as W

    live = (
        snaps.withColumn("_m", F.max("seq").over(W.partitionBy("bucket")))
        .filter(F.col("seq") == F.col("_m"))
    )
    per_bucket = {
        r.bucket: r["count"] for r in live.groupBy("bucket").count().collect()
    }
    assert all(n <= 8 for n in per_bucket.values()), per_bucket


def test_min_fraction_is_one_sided(replayed):
    snaps, exact = replayed
    n = sum(exact.values())
    kept = {r.value for r in current_hot_keys(snaps, min_fraction=0.1).collect()}
    for v, f in exact.items():
        if f > 0.1 * n:
            assert v in kept  # never drops a truly-hot key
    # and everything kept is at least PLAUSIBLY hot (upper bound clears)
    brackets = {
        r.value: r.freq_hi for r in current_hot_keys(snaps).collect()
    }
    for v in kept:
        assert brackets[v] > 0.1 * n


def test_mg_fold_matches_batch_reference():
    """The incremental fold == operators/heavyhitters' batch compress
    semantics: weights never overestimate, underestimate bounded by
    the accumulated deficit."""
    import pandas as pd

    rng_values = (["a"] * 50 + ["b"] * 30 + [f"t{i}" for i in range(40)]) * 2
    counts: dict = {}
    deficit = 0
    for start in range(0, len(rng_values), 37):
        deficit = _mg_fold(
            counts, deficit, pd.Series(rng_values[start : start + 37]), 5
        )
    exact = Counter(rng_values)
    assert len(counts) <= 5 + 1
    for v, w in counts.items():
        assert w <= exact[v]
        assert w >= exact[v] - deficit


def test_k_validation(spark):
    with pytest.raises(ValueError, match="k must be"):
        streaming_hot_keys(spark.range(1).select(F.lit("a").alias("k")), "k", k=0)
