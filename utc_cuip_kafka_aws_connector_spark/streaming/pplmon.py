"""Streaming perplexity drift monitor: per-event-time-window corpus
perplexity under a static Kneser-Ney reference model — the LM twin
of streaming/driftmon.py's windowed PSI.

Why this exists: distribution drift that PSI over scalar features
misses (topic shift at stable lengths/ratios, a new spam campaign in
fluent language) moves LM perplexity immediately; CCNet-style
pipelines watch reference-model perplexity for exactly this. The
monitor scores an incoming document stream continuously and emits
one row per window: a rising window perplexity = the corpus is
drifting away from the reference domain.

Structured-Streaming shape: token events are built by
``ngramlm.kn_token_logprobs`` (posexplode + per-order STREAM-STATIC
left joins — the model side is static, so no state), then ONE
watermarked event-time window aggregation. That single aggregation
is the whole state story — which is why the monitor uses the
``map_oov=False`` scoring path (mapping OOV tokens to ``<unk>``
costs a groupBy, and streaming allows one aggregation per query);
for ``min_count=1`` models that path is score-IDENTICAL (pinned in
tests/test_streaming_ppl.py), and the monitor refuses open-vocab
models rather than silently scoring them differently than batch.

Scale: per micro-batch work = the batch scoring plan on that batch;
state = one (window) row per open window. Late data handled by the
watermark like every windowed monitor in streaming/.

Reference basis: SURVEY §2.D streaming scope; composes the r12 KN
model with the driftmon windowing discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
    kn_token_logprobs,
    ppl_aggs,
)


def streaming_window_ppl(
    stream: DataFrame,
    model: dict,
    text_col: str = "text",
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    broadcast_model: bool = True,
) -> DataFrame:
    """``(window_start, window_end, n_tokens, log10_prob, ppl)`` per
    event-time window, append-mode-ready (rows finalize when the
    watermark passes the window end)."""
    if model.get("min_count", 1) != 1:
        raise ValueError(
            "streaming_window_ppl requires a min_count=1 model: the "
            "streaming path cannot run the <unk> mapping aggregation, "
            "and only min_count=1 makes the unmapped path "
            "score-identical to batch kn_score"
        )
    lp = kn_token_logprobs(
        stream.select(ts_col, text_col),
        model,
        text_col=text_col,
        carry_cols=[ts_col],
        broadcast_model=broadcast_model,
        map_oov=False,
    )
    agg = (
        lp.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(*ppl_aggs())
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_tokens",
        "log10_prob",
        "ppl",
    )
