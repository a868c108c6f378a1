"""streaming/neardup.py: online MinHash-LSH near-duplicate matching.

Replay-based evidence (the repo's streaming test idiom): file-source
micro-batches with AvailableNow, memory sink, then batch assertions
on the collapsed match table — near-copies flagged against their
cross-batch originals, uniques untouched, same-batch siblings
caught, and state bounded by the bucket cap without losing matches.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.streaming.neardup import (
    banded_signatures,
    collapse_matches,
    near_dup_matches,
)

def _doc(seed: int, n: int = 30) -> str:
    """Deterministic per-seed word stream over a 200-word vocabulary:
    different seeds share words but (virtually) no 3-shingles."""
    import random

    rng = random.Random(seed)
    return " ".join(f"w{rng.randrange(200)}" for _ in range(n))


def _near_copy(seed: int) -> str:
    toks = _doc(seed).split()
    toks[5] = "changed"
    toks[20] = "tweaked"
    return " ".join(toks)


def _write_batch(spark, rows, dest: str, mtime: int):
    tmp = dest + "_tmp"
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.copy(os.path.join(tmp, part), dest)
    os.utime(dest, (mtime, mtime))  # file source orders by mtime
    shutil.rmtree(tmp)


def _run(spark, stream_dir, tmp_path, name, **kw):
    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        near_dup_matches(stream, **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def test_banded_signatures_shape_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, _doc(i)) for i in range(6)], "doc_id long, text string"
    )
    a = banded_signatures(df, bands=16).collect()
    assert len(a) == 6 * 16
    b = banded_signatures(df, bands=16).collect()
    assert sorted((r.band_key, r.doc) for r in a) == sorted(
        (r.band_key, r.doc) for r in b
    )
    with pytest.raises(ValueError, match="divide"):
        banded_signatures(df, bands=7)


def test_cross_batch_near_copies_are_flagged(spark, tmp_path):
    d = str(tmp_path / "stream")
    originals = [(i, _doc(i)) for i in range(8)]
    later = [(100 + i, _near_copy(i)) for i in range(4)] + [
        (200 + i, _doc(50 + i)) for i in range(4)
    ]
    _write_batch(spark, originals, f"{d}/a.parquet", 1_000_000_000)
    _write_batch(spark, later, f"{d}/b.parquet", 1_000_000_100)
    matches = _run(spark, d, tmp_path, "ndm1")
    verdict = {
        r.doc: (r.is_dup, r.dup_of)
        for r in collapse_matches(matches, sim_threshold=0.5).collect()
    }
    assert len(verdict) == 16
    for i in range(4):  # near-copies match their cross-batch original
        is_dup, dup_of = verdict[100 + i]
        assert is_dup and dup_of == i
    for i in range(8):  # first arrivals are never dups
        assert not verdict[i][0]
    for i in range(4):  # fresh docs in batch 2 are clean
        assert not verdict[200 + i][0]


def test_same_batch_sibling_matches_earlier_id(spark, tmp_path):
    d = str(tmp_path / "stream1b")
    rows = [(0, _doc(3)), (1, _doc(9)), (7, _doc(3))]  # 7 copies 0 exactly
    _write_batch(spark, rows, f"{d}/a.parquet", 1_000_000_000)
    matches = _run(spark, d, tmp_path, "ndm2")
    verdict = {
        r.doc: (r.is_dup, r.dup_of, r.sim)
        for r in collapse_matches(matches, sim_threshold=0.9).collect()
    }
    assert verdict[7] == (True, 0, 1.0)  # exact copy -> sim 1.0
    assert not verdict[0][0] and not verdict[1][0]


def test_bucket_cap_bounds_state_without_losing_matches(spark, tmp_path):
    d = str(tmp_path / "streamcap")
    rows = [(i, _doc(42)) for i in range(40)]  # 40 identical docs
    _write_batch(spark, rows[:20], f"{d}/a.parquet", 1_000_000_000)
    _write_batch(spark, rows[20:], f"{d}/b.parquet", 1_000_000_100)
    matches = _run(spark, d, tmp_path, "ndm3", bucket_cap=4)
    verdict = collapse_matches(matches, sim_threshold=0.9).collect()
    dups = [r for r in verdict if r.is_dup]
    assert len(dups) == 39  # everyone but doc 0
    # the capped bucket keeps early prototypes, so matches point at
    # one of the first 4 arrivals with perfect similarity
    assert all(r.dup_of < 4 and r.sim == 1.0 for r in dups)
