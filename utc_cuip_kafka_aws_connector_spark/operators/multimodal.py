"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched Pandas functions.

The Spark-side plumbing is real and tested: binary columns ride
through relational operators untouched; decode/feature-extraction run
as ``mapInPandas`` (per-partition Arrow batches -- the only sane shape
for multi-MB payloads at 100 TB, since row-at-a-time Python UDFs
would serialize each blob individually).

The general media codecs (PIL/ffmpeg/torchaudio) are NOT in this
image; ``decode_image`` carries its own pure-Python parsers for the
two trivially-specified raster formats (PPM P3/P6 and BMP), so the
decode path EXECUTES in this environment, and it lights up for every
other format automatically when PIL is present (module-scope
import-try), raising NotImplementedError only for a format it truly
cannot handle. ``extract_byte_features`` is the deterministic fake
used by tests -- same schema, same batch shape.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # decode lights up without a code change when PIL lands
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - image libs absent by design
    _PILImage = None

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, mean_byte double, first_byte int"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary payload column + typed metadata
    struct (mime, declared size) -- the carrier format every multimodal
    operator consumes. Real pipelines read the bytes from object
    storage; the schema contract is identical."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("media_meta"),
    )


def _decode_ppm(b: bytes) -> dict:
    """Netpbm PPM header parse (P6 binary / P3 ascii): magic, then
    whitespace/comment-separated width, height, maxval. Validates the
    P6 raster length so a truncated payload errors instead of lying."""
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(b) and b[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
            continue
        start = pos
        while pos < len(b) and b[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("malformed PPM header")
        fields.append(int(b[start:pos]))
    width, height, maxval = fields
    if b[:2] == b"P6":
        raster = len(b) - (pos + 1)  # single whitespace after maxval
        need = width * height * 3 * (2 if maxval > 255 else 1)
        if raster < need:
            raise ValueError(f"truncated PPM raster: {raster} < {need} bytes")
    return {"width": width, "height": height, "mode": "RGB"}


def _decode_bmp(b: bytes) -> dict:
    """BMP header parse: 14-byte file header then BITMAPINFOHEADER
    (width i32 @18, height i32 @22, bpp u16 @28) or the ancient
    BITMAPCOREHEADER (u16 fields). Height may be negative (top-down
    DIB); mode from bits-per-pixel."""
    import struct

    if len(b) < 26:
        raise ValueError("truncated BMP header")
    (hdr_size,) = struct.unpack_from("<I", b, 14)
    if hdr_size >= 40:
        width, height = struct.unpack_from("<ii", b, 18)
        (bpp,) = struct.unpack_from("<H", b, 28)
    else:  # BITMAPCOREHEADER
        width, height = struct.unpack_from("<HH", b, 18)
        (bpp,) = struct.unpack_from("<H", b, 24)
    mode = {32: "RGBA", 24: "RGB", 8: "L", 1: "1"}.get(bpp, f"{bpp}bpp")
    return {"width": width, "height": abs(height), "mode": mode}


def decode_image(payload_bytes: bytes):
    """Decode an image payload to (width, height, mode): pure-Python
    parsers for PPM (P3/P6) and BMP -- runnable in this codec-free
    image -- and PIL for everything else when available.
    NotImplementedError only for a format this environment truly
    cannot handle. The mapInPandas plumbing around it is real either
    way."""
    magic = bytes(payload_bytes[:2])
    if magic in (b"P3", b"P6"):
        return _decode_ppm(bytes(payload_bytes))
    if magic == b"BM":
        return _decode_bmp(bytes(payload_bytes))
    if _PILImage is None:
        raise NotImplementedError(
            "decode for this format requires PIL (absent from this environment); "
            "PPM/BMP decode natively"
        )
    with _PILImage.open(io.BytesIO(payload_bytes)) as img:
        return {"width": img.width, "height": img.height, "mode": img.mode}


IMAGE_META_SCHEMA = "doc_id long, width int, height int, mode string, err string"


def extract_image_meta(df: DataFrame) -> DataFrame:
    """Image decode as a real distributed operator: mapInPandas over
    (doc_id, payload) Arrow batches, one decode per blob, per-row
    error isolation (a corrupt payload yields an err row, it cannot
    fail the partition -- at 100 TB some payloads ARE corrupt)."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "mode": [], "err": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    m = decode_image(payload)
                    out["width"].append(m["width"])
                    out["height"].append(m["height"])
                    out["mode"].append(m["mode"])
                    out["err"].append(None)
                except Exception as exc:  # noqa: BLE001 -- per-row isolation
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mode"].append(None)
                    out["err"].append(f"{type(exc).__name__}: {exc}"[:200])
            yield pd.DataFrame(out)

    return df.mapInPandas(meta, schema=IMAGE_META_SCHEMA)


def extract_byte_features(df: DataFrame) -> DataFrame:
    """Deterministic feature extraction over binary payloads via
    mapInPandas: one Arrow batch in, one feature frame out. Stands in
    for decode+resize+embed with identical partitioning, signature,
    and batch shape."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["media_meta"]],
                    "n_bytes": raw.map(len).astype("int64"),
                    "mean_byte": raw.map(lambda b: (sum(b) / len(b)) if len(b) else 0.0),
                    "first_byte": raw.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                }
            )

    return df.mapInPandas(feats, schema=FEATURE_SCHEMA)
