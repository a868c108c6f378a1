"""Perceptual audio dedup: log-energy-envelope hash + the shared
banded Hamming join.

The audio counterpart of operators/imagedup.py, completing the
perceptual-dedup story across the multimodal payload columns. The
signature is the classic energy-envelope fingerprint (the simplest
member of the acoustic-fingerprint family — Wang 2003's spectral
landmarks being the heavyweight cousin): frame the PCM stream into
65 equal windows, take each frame's log energy, and emit one bit per
adjacent-frame comparison (energy rising or falling), 64 bits total.
Comparing LOG energies makes the hash exactly invariant to global
gain (volume-scaled re-encodes of the same clip hash identically,
the analogue of dHash's brightness invariance), and framing by
fraction-of-duration makes it sample-rate tolerant.

Decode is pure Python beside operators/multimodal.py's WAV header
walker: 8/16-bit PCM rasters, channel-downmixed; other codecs raise
NotImplementedError into the per-row error column (the multimodal
convention — plumbing real, exotic codecs gated). Matching reuses
``imagedup.hamming_near_dups`` verbatim: the banded equi-join and
JVM bit_count verify are hash-source-agnostic.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from utc_cuip_kafka_aws_connector_spark.operators.imagedup import (
    hamming_near_dups,
)


def _wav_samples(b: bytes) -> np.ndarray:
    """Mono float64 samples from a RIFF/WAVE payload (PCM 8/16-bit)."""
    b = bytes(b)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(b)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # word-aligned per RIFF
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, _rate = struct.unpack_from("<HHI", fmt, 0)
    (bits,) = struct.unpack_from("<H", fmt, 14)
    if audio_format != 1:
        raise NotImplementedError(f"only PCM WAV supported, format {audio_format}")
    if bits == 16:
        raw = np.frombuffer(data[: len(data) & ~1], dtype="<i2").astype(np.float64)
    elif bits == 8:
        raw = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    if channels > 1:
        frames = len(raw) // channels
        raw = raw[: frames * channels].reshape(frames, channels).mean(axis=1)
    if not len(raw):
        raise ValueError("empty PCM stream")
    return raw


def energy_hash(samples: np.ndarray, n_frames: int = 65) -> int:
    """64-bit envelope hash: log energy per equal-duration frame,
    one bit per adjacent comparison. Gain-invariant by construction
    (log(g^2 E) differences cancel the gain)."""
    n = len(samples)
    bounds = (np.arange(n_frames + 1) * n) // n_frames
    energies = np.empty(n_frames, dtype=np.float64)
    for i in range(n_frames):
        seg = samples[bounds[i] : max(bounds[i + 1], bounds[i] + 1)]
        energies[i] = np.log((seg * seg).mean() + 1e-12)
    bits = energies[1:] > energies[:-1]
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    return out


def audio_ehash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_frames: int = 65,
) -> DataFrame:
    """(id, ehash, error): the envelope hash per WAV payload, per-row
    error isolation (null hash + message)."""
    if n_frames - 1 > 64:
        raise ValueError("n_frames - 1 bits must fit 64 (n_frames <= 65)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, errors = [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(did)
                try:
                    h = energy_hash(_wav_samples(payload), n_frames)
                    hashes.append(np.uint64(h).astype(np.int64))
                    errors.append(None)
                except (ValueError, NotImplementedError) as e:
                    hashes.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {id_col: ids, "ehash": pd.array(hashes, dtype="Int64"),
                 "error": errors}
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, ehash long, error string"
    )


def audio_near_dups(
    hashed: DataFrame,
    max_distance: int = 6,
    bands: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """``hamming_near_dups`` over the ``audio_ehash`` output."""
    return hamming_near_dups(hashed, max_distance, bands, id_col, "ehash")
