"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched Pandas functions.

The Spark-side plumbing is real and tested: binary columns ride
through relational operators untouched; decode/feature-extraction run
as ``mapInPandas`` (per-partition Arrow batches -- the only sane shape
for multi-MB payloads at 100 TB, since row-at-a-time Python UDFs
would serialize each blob individually).

The actual media codecs (PIL/ffmpeg/torchaudio) are NOT in this
image; ``decode_image`` lights up automatically when PIL is present
(module-scope import-try) and raises NotImplementedError only when it
is absent. ``extract_byte_features`` is the deterministic fake used
by tests -- same schema, same batch shape.
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


def decode_image(payload_bytes: bytes):
    """Decode an image payload to (width, height, mode) via PIL when
    available; NotImplementedError only when the codec truly is absent
    from the environment. The mapInPandas plumbing around it is real
    either way."""
    if _PILImage is None:
        raise NotImplementedError(
            "image decode requires PIL; stubbed in this environment"
        )
    with _PILImage.open(io.BytesIO(payload_bytes)) as img:
        return {"width": img.width, "height": img.height, "mode": img.mode}


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
