"""Span corruption — seq2seq denoising training examples (the T5
objective, Raffel et al. 2020: replace token spans with sentinel
markers; the model reconstructs the spans). Completes the
training-example manufacturing tier: packing/packout build LM
examples, crops.py builds contrastive pairs, prefpairs.py builds
preference pairs — this builds the encoder-decoder pair
``(inputs with <extra_id_k>, targets)``.

Block-local corruption (stated deviation from the paper): T5 samples
span starts sequentially over the whole document, which is
inherently serial per document. Here the token stream is cut into
fixed BLOCKS of ``round(mean_span / corruption_rate)`` tokens and
each block masks ONE hash-drawn span of hash-drawn length (1 ..
2*mean_span-1, uniform — mean = mean_span), giving the same expected
corruption rate and mean span length with every block independent —
a pure column computation. Spans never cross blocks, so spacing is
slightly more regular than T5's; for corpus manufacturing that
difference is immaterial and the parallel form is the point.

Determinism (the sampling.py / crops.py doctrine): span geometry per
(doc, block) is md5 content-hash arithmetic — 13 hex chars < 2^53 —
so the same (id, seed) corrupts identically across partitioning,
retries, and engines, and the tests replicate the whole construction
in pure Python.

Scale shape: one scan-local projection — zero UDFs, shuffles, or
joins. The whole example builds inside ONE outer lambda whose
element is the token array (the text.py single-element-array idiom),
so the per-block inner lambdas reference a BOUND VARIABLE — the
tokenize chain is evaluated once per row, not once per block (the
arrayops re-evaluation trap, measured 10-20x when tripped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.arrayops import (
    ws_tokens,
)
from utc_cuip_kafka_aws_connector_spark.operators.hashdraw import (
    md5_uniform_key,
)


def _draw(id_col: Column, block: Column, seed: int, leg: str) -> Column:
    # the block index is a COLUMN, so the raw-key hashdraw form
    return md5_uniform_key(
        F.concat(
            id_col.cast("string"),
            F.lit(f":{int(seed)}:{leg}:"),
            block.cast("string"),
        )
    )


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    corruption_rate: float = 0.15,
    mean_span: int = 3,
    seed: int = 0,
    sentinel: str = "<extra_id_%d>",
) -> DataFrame:
    """(id, inputs, targets): per document, token spans replaced by
    sentinel 0, 1, ... in reading order; ``targets`` is each sentinel
    followed by the tokens it hides, terminated by the next unused
    sentinel (the exact T5 target format). Documents with at most
    ``mean_span`` tokens are dropped (nothing worth reconstructing);
    NULL ids/texts are dropped. Whitespace tokenization,
    single-space re-join (stated, as in crops.py). ``sentinel`` is a
    printf pattern receiving the span index."""
    if not (0 < corruption_rate < 1):
        raise ValueError(
            f"corruption_rate must be in (0,1), got {corruption_rate}"
        )
    if mean_span < 1:
        raise ValueError(f"mean_span must be >= 1, got {mean_span}")
    if "%d" not in sentinel:
        raise ValueError(f"sentinel must contain %d, got {sentinel!r}")

    block_size = max(int(round(mean_span / corruption_rate)), mean_span + 1)
    i = F.col("id")
    toks = ws_tokens(F.col(text_col))
    base = df.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(F.col(id_col).alias("id"), toks.alias("__t"))
    base = base.filter(F.size("__t") > mean_span)

    def example(arr: Column) -> Column:
        n = F.size(arr)
        n_blocks = F.ceil(n / F.lit(block_size)).cast("int")

        def block_parts(b: Column) -> Column:
            """struct(before, masked, after) for 0-based block b:
            tokens [b*B+1, min((b+1)*B, n)] in 1-based slice terms,
            with one hash-drawn span masked."""
            blk_start = b * block_size + 1
            blk_len = F.least(n - blk_start + 1, F.lit(block_size))
            span_len = F.least(
                F.lit(1)
                + F.floor(
                    _draw(i, b, seed, "len") * F.lit(2 * mean_span - 1)
                ).cast("int"),
                blk_len,
            )
            span_off = F.floor(
                _draw(i, b, seed, "start") * (blk_len - span_len + 1)
            ).cast("int")
            return F.struct(
                F.slice(arr, blk_start, span_off).alias("before"),
                F.slice(arr, blk_start + span_off, span_len).alias(
                    "masked"
                ),
                F.slice(
                    arr,
                    blk_start + span_off + span_len,
                    blk_len - span_off - span_len,
                ).alias("after"),
            )

        parts = F.transform(
            F.sequence(F.lit(0), n_blocks - 1), block_parts
        )
        mark = lambda k: F.array(F.format_string(sentinel, k))  # noqa: E731
        inputs = F.array_join(
            F.flatten(
                F.transform(
                    parts,
                    lambda p, k: F.concat(p.before, mark(k), p.after),
                )
            ),
            " ",
        )
        targets = F.concat(
            F.array_join(
                F.flatten(
                    F.transform(
                        parts, lambda p, k: F.concat(mark(k), p.masked)
                    )
                ),
                " ",
            ),
            F.lit(" "),
            F.format_string(sentinel, n_blocks),
        )
        return F.struct(inputs.alias("inputs"), targets.alias("targets"))

    # single-element-array idiom: the outer lambda's ELEMENT is the
    # token array, so every inner reference is a bound variable — the
    # tokenize chain evaluates once per row
    ex = F.element_at(
        F.transform(F.array(F.col("__t")), example), 1
    )
    return base.select(
        F.col("id").alias(id_col),
        ex["inputs"].alias("inputs"),
        ex["targets"].alias("targets"),
    )
