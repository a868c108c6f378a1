"""Scalar (int8) quantization of embedding columns — the memory
side of the similarity stack.

At 100 TB the embedding table's float payload dominates ANN cost:
a 1024-dim float32 vector is 4 KB/row; its 8-bit scalar-quantized
code is 1 KB — the classic 4x storage/shuffle/cache reduction of
FAISS's ScalarQuantizer (public technique; also Pinecone/Milvus SQ8)
at a recall cost small enough that SQ8 is the default compressed
tier in practice. This module implements the fit/encode/decode/
search cycle DataFrame-native:

- ``sq_fit``: per-dimension (min, max) over the corpus. posexplode
  to (dim, value) then groupBy(dim) min/max — map-side partial
  aggregation means the shuffle carries at most 2d values per
  partition, and only d rows reach the driver.
- ``sq_encode``: code_i = round(255 * (x_i - min_i) / range_i),
  clamped to [0, 255], emitted as array<smallint> — pure JVM
  ``zip_with`` chains, scan-local, codegen'd.
- ``sq_decode_col``: midpoint reconstruction x̂_i = min_i +
  (code_i + 0.5) * range_i / 256 … actually the standard affine
  inverse min_i + code_i * range_i / 255, whose worst-case per-dim
  error is range_i / (2 * 255) (test-pinned bound).
- ``sq_cosine_topk``: brute-force cosine top-k over DECODED codes —
  same plan shape as similarity.cosine_topk but scanning the 4x
  smaller code column; the recall-vs-exact tradeoff is test-pinned
  on the fixture embeddings.

Degenerate dimensions (constant value, range 0) encode to 0 and
decode exactly to the constant.

Reference basis: public FAISS ScalarQuantizer design; the reference
repo has no vector surface (389 lines, Kafka->csv). SURVEY §2.D.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.functions import dot


def sq_fit(df: DataFrame, vec_col: str = "embedding") -> dict:
    """Per-dimension corpus (min, max). Returns
    {"mins": [...], "maxs": [...], "d": d}."""
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("dim", "v"))
        .groupBy("dim")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .orderBy("dim")
        .collect()
    )
    if not rows:
        raise ValueError("sq_fit: empty input")
    if [r.dim for r in rows] != list(range(len(rows))):
        raise ValueError("sq_fit: ragged vectors (inconsistent dimensions)")
    return {
        "mins": [float(r.lo) for r in rows],
        "maxs": [float(r.hi) for r in rows],
        "d": len(rows),
    }


def _ranges(model: dict) -> list[float]:
    return [hi - lo for lo, hi in zip(model["mins"], model["maxs"])]


def sq_encode(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Append ``out_col`` array<smallint> codes in [0, 255]; the
    float column can then be dropped from the hot path."""
    mins = F.array(*[F.lit(m) for m in model["mins"]])
    rng = F.array(*[F.lit(r) for r in _ranges(model)])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), mins, lambda x, m: x - m
    )
    codes = F.zip_with(
        centered,
        rng,
        lambda c, r: F.when(r > 0, F.round(F.lit(255.0) * c / r))
        .otherwise(F.lit(0.0))
        .cast("double"),
    )
    clamped = F.transform(
        codes,
        lambda v: F.greatest(F.lit(0.0), F.least(F.lit(255.0), v)).cast(
            "smallint"
        ),
    )
    return df.withColumn(out_col, clamped)


def sq_decode_col(codes: Column, model: dict) -> Column:
    """array<double> reconstruction of a codes column (JVM
    expression): x̂_i = min_i + code_i * range_i / 255."""
    mins = F.array(*[F.lit(m) for m in model["mins"]])
    scale = F.array(*[F.lit(r / 255.0) for r in _ranges(model)])
    scaled = F.zip_with(codes, scale, lambda c, s: c.cast("double") * s)
    return F.zip_with(scaled, mins, lambda v, m: v + m)


def sq_cosine_topk(
    df: DataFrame,
    model: dict,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Brute-force cosine top-k over the compressed table: decode is
    an inline expression, so the scan reads only (id, codes) — the
    4x-smaller payload — and everything stays in codegen. Returns
    (id, sim) ordered desc, ties broken by id asc."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = sq_decode_col(F.col(codes_col), model)
    sim = dot(v, q) / (F.sqrt(dot(v, v)) * F.sqrt(dot(q, q)))
    return (
        df.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
