"""Length-bucketed batch assembly for PADDED training — the
fixed-shape complement of operators/packing.py (packing concatenates
documents into full sequences; encoder-style and contrastive
training instead pads every example in a batch to a common length,
and grouping similar lengths into the same batch is the standard
padding-waste fix — the "bucketing" of seq2seq training since
Sutskever et al. 2014's sorted batches, TensorFlow's
bucket_by_sequence_length, and dynamic padding in every modern
trainer).

Semantics: each example lands in a LENGTH BUCKET (floor-log2 by
default — lengths within 2x of each other share a bucket — or
explicit boundaries), buckets split into deterministic hash SHARDS
(the ``pack_sequences``/``with_shard`` parallelism contract:
parallelism = bucket x shard groups, scale out by raising
``shard_hex``), and each (bucket, shard) group is chunked into
batches of ``batch_size`` in (length, id) order. ``pad_to`` is the
batch's own max length (dynamic padding, not the bucket bound), and
``pad`` the per-row waste — so ``padding_report`` folds to exact
corpus-level padding economics, the number that decides whether
bucketing is worth a data-order constraint at all.

``order="hash"`` replaces the WITHIN-BUCKET length sort with a
deterministic md5 order inside the same machinery — rows are still
length-bucketed (the bucket key is computed regardless), so diffing
the two reports prices the within-bucket sort alone. The true
UNBUCKETED random-batching baseline is ``order="hash"`` with a
single catch-all bucket (``boundaries=[<max length>]``); diff
against THAT to price what bucketing as a whole buys (ADVICE r17 —
the earlier phrasing overclaimed the first diff).

Scale shape: one codegen projection (bucket/shard/order keys — no
UDF), one applyInPandas per (bucket, shard) group (each group sorts
only its own rows — the global sort is never materialized), and the
report is one map-side-combined aggregation. Remainder batches
(fewer than ``batch_size`` rows at a shard's tail) are emitted and
FLAGGED, not silently padded or dropped: at shard_hex=1 a bucket has
at most 16 remainders; trainers decide their fate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _bucket_expr(len_col, boundaries: list[int] | None):
    """Integer bucket id: with ``boundaries`` (ascending upper
    bounds, inclusive) the index of the first bound >= len, lengths
    past the last bound taking their own top bucket; without, the
    floor-log2 bucket (len in [2^b, 2^(b+1)) -> b), computed from
    ``bin(len)``'s digit count — exact integer logic, no float log2
    near power-of-two edges."""
    l = F.col(len_col).cast("long")
    if boundaries is None:
        return (F.length(F.bin(l)) - 1).cast("long")
    expr = F.lit(len(boundaries)).cast("long")  # overflow bucket
    for i in range(len(boundaries) - 1, -1, -1):
        expr = F.when(l <= boundaries[i], F.lit(i).cast("long")).otherwise(
            expr
        )
    return expr


def bucketed_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    batch_size: int = 32,
    boundaries: list[int] | None = None,
    shard_hex: int = 1,
    order: str = "length",
) -> DataFrame:
    """Input columns + (bucket, shard, batch_idx, pad_to, pad,
    is_remainder): deterministic batch assembly (see module
    docstring). Rows with NULL ids, or NULL/non-positive lengths,
    are dropped (an unmeasured example cannot be padded against).

    ``shard_hex=0`` disables sharding (one group per bucket — exact
    minimal padding for that bucket, verification grade);
    ``shard_hex=1`` gives 16 shards per bucket (the default scale
    knob, <= 16 remainder batches per bucket); each further hex
    digit multiplies by 16. ``order="length"`` sorts (len, id) —
    minimizes total padding whenever a group's batches fill evenly
    (consecutive sorted chunks minimize the sum of batch maxima);
    with a tail remainder it is the standard heuristic, and a rare
    adversarial order can pad slightly less (hypothesis found one:
    sorted leaves the single largest row as the remainder instead of
    pairing the two largest). ``order="hash"`` sorts by md5(id) —
    the random-batch baseline for pricing the sort."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if shard_hex < 0:
        raise ValueError(f"shard_hex must be >= 0, got {shard_hex}")
    if order not in ("length", "hash"):
        raise ValueError(f"order must be length|hash, got {order!r}")
    if boundaries is not None:
        if not boundaries or any(
            b2 <= b1 for b1, b2 in zip(boundaries, boundaries[1:])
        ):
            raise ValueError(
                f"boundaries must be non-empty strictly ascending, got {boundaries}"
            )
    # this operator GENERATES fixed column names; an input already
    # carrying one would be silently clobbered (bucket/shard/_ord) or
    # duplicated in the applyInPandas schema (batch_idx/pad_to/pad/
    # is_remainder) -- refuse loudly (the cli._require_cols_absent
    # doctrine)
    clash = [
        c
        for c in (
            "bucket", "shard", "batch_idx", "pad_to", "pad",
            "is_remainder", "_ord",
        )
        if c in df.columns
    ]
    if clash:
        raise ValueError(
            f"bucketed_batches generates column(s) {clash} which the "
            "input already has -- rename or drop them first"
        )

    l = F.col(len_col).cast("long")
    base = df.filter(
        F.col(id_col).isNotNull() & l.isNotNull() & (l > 0)
    ).withColumn("bucket", _bucket_expr(len_col, boundaries))
    if shard_hex > 0:
        shard = F.substring(F.md5(F.col(id_col).cast("string")), 1, shard_hex)
    else:
        shard = F.lit("")
    base = base.withColumn("shard", shard)
    if order == "hash":
        # the baseline's sort key; NOT computed on the length path --
        # a 32-char column riding the shuffle for nothing
        base = base.withColumn(
            "_ord",
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":batch"))),
        )

    from pyspark.sql.types import BooleanType

    out_schema = StructType(
        [f for f in base.schema.fields if f.name != "_ord"]
        + [
            StructField("batch_idx", LongType()),
            StructField("pad_to", LongType()),
            StructField("pad", LongType()),
            StructField("is_remainder", BooleanType()),
        ]
    )
    by_length = order == "length"
    bs = int(batch_size)

    def assemble(pdf):
        sort_keys = [len_col, id_col] if by_length else ["_ord", id_col]
        pdf = pdf.sort_values(sort_keys, kind="mergesort").reset_index(
            drop=True
        )
        if not by_length:
            pdf = pdf.drop(columns=["_ord"])
        idx = pdf.index.to_numpy() // bs
        lens = pdf[len_col].astype("int64")
        pad_to = lens.groupby(idx).transform("max")
        # only the group's LAST batch can be short, and it is short
        # iff the group size is not a batch_size multiple
        short_last = len(pdf) % bs != 0
        return pdf.assign(
            batch_idx=idx,
            pad_to=pad_to,
            pad=pad_to - lens,
            is_remainder=short_last & (idx == idx[-1] if len(pdf) else False),
        )

    return base.groupBy("bucket", "shard").applyInPandas(assemble, out_schema)


def padding_report(
    batches: DataFrame,
    len_col: str = "n_tokens",
    by_bucket: bool = False,
) -> DataFrame:
    """(bucket?, n_rows, n_batches, n_remainder_batches, real_tokens,
    pad_tokens, waste_frac): exact padding economics of a
    ``bucketed_batches`` output — waste_frac = pad / (real + pad),
    the fraction of every padded-batch tensor that is padding. One
    aggregation (batch identity is already a column; no re-sort)."""
    keys = ["bucket"] if by_bucket else []
    # batch identity is ALWAYS (bucket, shard, batch_idx); the report
    # key only controls the final fold
    per_batch = batches.groupBy("bucket", "shard", "batch_idx").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(len_col).cast("long")).alias("_real"),
        F.sum("pad").alias("_pad"),
        F.max(F.col("is_remainder").cast("int")).alias("_rem"),
    )
    return (
        per_batch.groupBy(*keys)  # *[] == the global aggregate
        .agg(
            F.sum("_n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("_rem").cast("long").alias("n_remainder_batches"),
            F.sum("_real").alias("real_tokens"),
            F.sum("_pad").alias("pad_tokens"),
            (
                F.sum("_pad")
                / (F.sum("_real") + F.sum("_pad")).cast("double")
            ).alias("waste_frac"),
        )
    )
