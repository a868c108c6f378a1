"""operators/audiodup.py: perceptual audio dedup."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.audiodup import (
    audio_ehash,
    audio_near_dups,
    energy_hash,
)


def _wav(samples: np.ndarray, bits=16, channels=1, rate=8000) -> bytes:
    if channels > 1:
        samples = np.repeat(samples[:, None], channels, axis=1).ravel()
    if bits == 16:
        raw = np.clip(samples, -32768, 32767).astype("<i2").tobytes()
    else:
        raw = (np.clip(samples / 256.0, -128, 127) + 128).astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
                      channels * bits // 8, bits)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )


def _clip(seed: int, n=16000) -> np.ndarray:
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    env = np.abs(np.sin(2 * np.pi * t / (n / (3 + seed % 4))))  # beats
    return (env * rng.randn(n) * 3000 + rng.randn(n) * 50)


@pytest.fixture(scope="module")
def tracks(spark):
    a = _clip(1)
    rows = [
        (0, bytearray(_wav(a))),
        (1, bytearray(_wav(a * 0.25))),         # quieter re-encode
        (2, bytearray(_wav(a, channels=2))),    # stereo duplicate
        (3, bytearray(_wav(_clip(2)))),         # different clip
        (4, bytearray(_wav(_clip(5)))),         # different clip
        (5, bytearray(b"OggS not supported here")),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_gain_invariance_and_error_isolation(spark, tracks):
    rows = {r.doc_id: r for r in audio_ehash(tracks).collect()}
    assert rows[5].ehash is None and "ValueError" in rows[5].error
    assert rows[0].ehash == rows[1].ehash  # exact gain invariance
    assert rows[0].ehash == rows[2].ehash  # stereo downmix of same signal
    d = bin((rows[0].ehash ^ rows[3].ehash) & ((1 << 64) - 1)).count("1")
    assert d > 10


def test_near_dups(spark, tracks):
    pairs = audio_near_dups(audio_ehash(tracks), max_distance=4)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(0, 1), (0, 2), (1, 2)}


def test_energy_hash_gain_property():
    s = _clip(9)
    for g in (0.1, 0.5, 2.0, 7.3):
        assert energy_hash(s) == energy_hash(s * g)


def test_validation(spark):
    df = spark.createDataFrame([(0, bytearray(b"RIFF"))], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="n_frames"):
        audio_ehash(df, n_frames=66)
    # unsupported codec inside a valid RIFF -> NotImplementedError row
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float PCM
    payload = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\0\0\0\0"
    )
    df2 = spark.createDataFrame([(0, bytearray(payload))], "doc_id long, payload binary")
    r = audio_ehash(df2).first()
    assert r.ehash is None and "NotImplementedError" in r.error
