"""Perceptual image dedup: difference-hash (dHash) + banded Hamming
join — the dedup family extended to the multimodal payload column.

Exact byte dedup misses re-encoded/brightness-shifted copies of the
same picture; the standard cheap answer is a perceptual hash. dHash
(the widely-documented difference hash: downscale to (hash+1) x hash
grayscale, compare horizontal neighbors, 64 bits at the default 8)
is gradient-based, so it is invariant to uniform brightness/contrast
shifts and tolerant of small recompression noise; near-duplicate
images differ in a few bits. Matching is then a Hamming-distance
join, made corpus-scale the same way every dedup in this repo is —
banded candidates, never all-pairs:

1. ``image_dhash`` — one Arrow pass: decode raster (pure-Python P6
   PPM and 24bpp BMP readers beside operators/multimodal.py's header
   parsers; PIL lights up other formats when present), area-pool to
   the tiny grid, gray-weight, threshold neighbors -> int64. Per-row
   error isolation: undecodable payloads yield a null hash + error
   string, never a failed task.
2. ``image_near_dups`` — split the 64-bit hash into ``bands``
   equal bit-bands; PIGEONHOLE: two hashes within Hamming distance
   d < bands must agree on at least one band, so an equi-join per
   band finds every pair up to distance bands-1 (default 8 bands =
   guarantee through distance 7, covering the default max_distance
   6 with margin). Verification is exact and JVM-side:
   ``bit_count(h_a ^ h_b) <= max_distance`` inside whole-stage
   codegen. Feed the pairs to ``dedup.dedup_clusters`` for
   components/survivors like any other dedup signal.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.multimodal import (
    _parse_ppm_header,
)

try:  # pragma: no cover - PIL absent from this environment
    from PIL import Image as _PILImage
except Exception:  # pragma: no cover
    _PILImage = None


def _ppm_rgb(b: bytes) -> np.ndarray:
    width, height, maxval, start = _parse_ppm_header(b)
    if b[:2] == b"P3":
        vals = np.array(b[start:].split(), dtype=np.int64)
        if len(vals) < width * height * 3:
            raise ValueError("truncated P3 raster")
        px = vals[: width * height * 3]
    else:
        if maxval > 255:
            raise NotImplementedError("16-bit PPM rasters not supported")
        need = width * height * 3
        raw = b[start : start + need]
        if len(raw) < need:
            raise ValueError("truncated P6 raster")
        px = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    return px.reshape(height, width, 3)


def _bmp_rgb(b: bytes) -> np.ndarray:
    if len(b) < 54:
        raise ValueError("truncated BMP header")
    (data_off,) = struct.unpack_from("<I", b, 10)
    width, height = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    if bpp != 24:
        raise NotImplementedError(f"only 24bpp BMP supported, got {bpp}")
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    need = data_off + row_bytes * height
    if len(b) < need:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(
        b[data_off : data_off + row_bytes * height], dtype=np.uint8
    ).reshape(height, row_bytes)[:, : width * 3]
    img = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return img.astype(np.int64)


def _rgb_pixels(payload: bytes) -> np.ndarray:
    magic = bytes(payload[:2])
    if magic in (b"P3", b"P6"):
        return _ppm_rgb(bytes(payload))
    if magic == b"BM":
        return _bmp_rgb(bytes(payload))
    if _PILImage is None:
        raise NotImplementedError(
            "raster decode for this format requires PIL (absent); "
            "PPM/BMP decode natively"
        )
    import io

    with _PILImage.open(io.BytesIO(bytes(payload))) as img:
        return np.asarray(img.convert("RGB"), dtype=np.int64)


def _pool(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style pooling to (out_h, out_w) via index-sliced means —
    no imaging library needed, deterministic."""
    h, w = gray.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            block = gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                         xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i, j] = block.mean()
    return out


def dhash(pixels: np.ndarray, hash_size: int = 8) -> int:
    """The difference hash of an (H, W, 3) RGB array: grayscale,
    pool to hash_size x (hash_size + 1), threshold each horizontal
    neighbor pair; bits packed row-major into an int."""
    gray = (
        0.299 * pixels[:, :, 0]
        + 0.587 * pixels[:, :, 1]
        + 0.114 * pixels[:, :, 2]
    )
    small = _pool(gray, hash_size, hash_size + 1)
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    return out


def image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    hash_size: int = 8,
) -> DataFrame:
    """(id, dhash, error): the perceptual hash per payload row, with
    per-row error isolation (null hash + message, the multimodal
    convention). dhash is bit-reinterpreted into a signed long."""
    if hash_size * (hash_size) > 64:
        raise ValueError("hash_size^2 must fit 64 bits (hash_size <= 8)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, errors = [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(did)
                try:
                    h = dhash(_rgb_pixels(payload), hash_size)
                    hashes.append(np.uint64(h).astype(np.int64))
                    errors.append(None)
                except (ValueError, NotImplementedError) as e:
                    hashes.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {id_col: ids, "dhash": pd.array(hashes, dtype="Int64"),
                 "error": errors}
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, dhash long, error string"
    )


def hamming_near_dups(
    hashed: DataFrame,
    max_distance: int = 6,
    bands: int = 8,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """(id_a, id_b, distance), id_a < id_b, every pair of 64-bit
    hashes within ``max_distance`` Hamming bits — generic over the
    hash source (image dHash here, audio energy hash in
    operators/audiodup.py, any future 64-bit perceptual signature).
    Complete for max_distance <= bands - 1 (pigeonhole over the band
    split); candidates come from per-band equi-joins, verification is
    exact JVM ``bit_count``."""
    if not 1 <= bands <= 64 or 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    if max_distance > bands - 1:
        raise ValueError(
            f"completeness needs max_distance <= bands - 1 "
            f"({max_distance} > {bands - 1}); raise bands"
        )
    width = 64 // bands
    h = hashed.filter(F.col(hash_col).isNotNull()).select(
        id_col, F.col(hash_col).alias("dhash")
    )
    banded = h.select(
        id_col,
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("dhash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "dhash", "bk.band", "bk.key")
    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("dhash").alias("h_a"), "band", "key"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("dhash").alias("h_b"), "band", "key"
    )
    dist = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("distance"))
        .filter(F.col("distance") <= max_distance)
        .distinct()
    )


def image_near_dups(
    hashed: DataFrame,
    max_distance: int = 6,
    bands: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """``hamming_near_dups`` over the ``image_dhash`` output (kept as
    the image-named entry point)."""
    return hamming_near_dups(hashed, max_distance, bands, id_col, "dhash")
