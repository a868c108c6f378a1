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


def _parse_ppm_header(b: bytes, pos: int = 0) -> tuple[int, int, int, int]:
    """Parse one PPM header starting at ``pos`` (magic already
    validated by the caller): returns (width, height, maxval,
    raster_start). Handles whitespace and # comments per the netpbm
    spec."""
    pos += 2  # past the P6/P3 magic
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
    return width, height, maxval, pos + 1  # single whitespace after maxval


def _decode_ppm(b: bytes) -> dict:
    """Netpbm PPM header parse (P6 binary / P3 ascii): magic, then
    whitespace/comment-separated width, height, maxval. Validates the
    P6 raster length so a truncated payload errors instead of lying."""
    width, height, maxval, raster_start = _parse_ppm_header(b)
    if b[:2] == b"P6":
        raster = len(b) - raster_start
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


def decode_wav(payload_bytes: bytes) -> dict:
    """WAV (RIFF) header decode, pure Python: walks the chunk list
    (word-aligned per the RIFF spec), reads the fmt chunk's channel
    count / sample rate / bit depth and the data chunk's size, and
    derives frame count + duration. The audio analog of
    ``decode_image`` -- no codec library needed for PCM containers;
    compressed formats (MP3/OGG/...) raise NotImplementedError."""
    import struct

    b = bytes(payload_bytes)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError(
            "not a RIFF/WAVE payload; compressed audio decode requires a codec "
            "library absent from this environment"
        )
    pos = 12
    fmt = None
    data_size = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", b, pos + 4)
        pos += 8
        if cid == b"fmt " and sz >= 16:
            _, ch, sr, _, block_align, bits = struct.unpack_from("<HHIIHH", b, pos)
            fmt = (ch, sr, block_align, bits)
        elif cid == b"data":
            # Validate the declared extent against the actual payload
            # (the image path's truncated-raster check, for audio): a
            # truncated clip must error, not report full duration.
            if pos + sz > len(b):
                raise ValueError(
                    f"truncated WAV: data chunk declares {sz} bytes, "
                    f"{len(b) - pos} present"
                )
            data_size = sz
        pos += sz + (sz & 1)  # RIFF chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("truncated WAV: missing fmt or data chunk")
    ch, sr, block_align, bits = fmt
    n_frames = data_size // block_align if block_align else 0
    return {
        "channels": ch,
        "sample_rate": sr,
        "bits": bits,
        "n_frames": n_frames,
        "duration_s": (n_frames / sr) if sr else 0.0,
    }


def iter_video_frames(payload_bytes: bytes):
    """Iterate the frames of a netpbm PPM STREAM (concatenated P6
    images -- the standard output of `ffmpeg -f image2pipe` and
    friends): yields (frame_idx, width, height) while seeking past
    each raster. The toy-but-real container for the video modality:
    sequential parse, O(1) memory per frame."""
    b = bytes(payload_bytes)
    pos = 0
    idx = 0
    while pos < len(b):
        if b[pos : pos + 2] != b"P6":
            raise ValueError(f"frame {idx}: expected P6 magic at offset {pos}")
        width, height, maxval, raster_start = _parse_ppm_header(b, pos)
        size = width * height * 3 * (2 if maxval > 255 else 1)
        if raster_start + size > len(b):
            raise ValueError(f"frame {idx}: truncated raster")
        yield idx, width, height
        pos = raster_start + size
        idx += 1


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


AUDIO_META_SCHEMA = (
    "doc_id long, channels int, sample_rate int, bits int, n_frames long, err string"
)


def extract_audio_meta(df: DataFrame) -> DataFrame:
    """Audio decode as a distributed operator: mapInPandas over
    (doc_id, payload) Arrow batches, one RIFF parse per blob, per-row
    error isolation (same contract as ``extract_image_meta``)."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "channels": [], "sample_rate": [],
                "bits": [], "n_frames": [], "err": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    m = decode_wav(payload)
                    out["channels"].append(m["channels"])
                    out["sample_rate"].append(m["sample_rate"])
                    out["bits"].append(m["bits"])
                    out["n_frames"].append(m["n_frames"])
                    out["err"].append(None)
                except Exception as exc:  # noqa: BLE001 -- per-row isolation
                    for k in ("channels", "sample_rate", "bits", "n_frames"):
                        out[k].append(None)
                    out["err"].append(f"{type(exc).__name__}: {exc}"[:200])
            yield pd.DataFrame(out)

    return df.mapInPandas(meta, schema=AUDIO_META_SCHEMA)


VIDEO_FRAME_SCHEMA = "doc_id long, frame_idx int, width int, height int, err string"


def sample_video_frames(df: DataFrame, stride: int = 1) -> DataFrame:
    """Frame sampling over a PPM-stream video payload: one input row
    fans out to one output row per kept frame (indices 0, stride,
    2*stride, ...) -- the explode-shaped mapInPandas the north-star
    frame-sample stage needs. The sequential container parse runs
    once per blob regardless of stride (headers must be walked to
    find frame boundaries).

    Error contract: a container that is corrupt ANYWHERE yields
    exactly one err row and NO frame rows (frames parsed before the
    corruption are discarded -- a partially-readable container must
    not masquerade as a shorter valid one). An EMPTY payload yields
    an err row too, so every input doc_id appears in the output."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "width": [], "height": [], "err": []}

            def err_row(doc_id, msg):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(None)
                out["width"].append(None)
                out["height"].append(None)
                out["err"].append(msg[:200])

            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    err_row(doc_id, "ValueError: empty video payload")
                    continue
                kept: list[tuple] = []
                try:
                    for idx, w, h in iter_video_frames(payload):
                        if idx % stride == 0:
                            kept.append((idx, w, h))
                except Exception as exc:  # noqa: BLE001 -- per-row isolation
                    err_row(doc_id, f"{type(exc).__name__}: {exc}")
                    continue
                for idx, w, h in kept:
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["err"].append(None)
            yield pd.DataFrame(out)

    return df.mapInPandas(frames, schema=VIDEO_FRAME_SCHEMA)


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
