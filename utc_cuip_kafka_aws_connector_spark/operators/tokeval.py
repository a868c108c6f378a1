"""Vocabulary utilization report — the tokenizer diagnostic
``tokenio.tokenizer_report_spec`` does NOT cover. The fitness report
answers "how well does this vocab compress each slice" (oov_rate,
chars_per_token, tokens_per_word — per-slice scalars over token
COUNTS); this module answers "how much of the vocab is the corpus
actually using, and how is the usage distributed" — the
embedding-table economics question: a 100k vocab whose corpus
exercises 9k ids pays memory and softmax width for nothing, and a
vocab whose token mass concentrates in a tiny head (degenerate
Zipf) signals merges tuned to the wrong domain. Standard vocabulary
pruning (the sentencepiece --vocab_size sweep, tokenizer distillation)
starts from exactly this table.

Per group: ``distinct_ids`` / ``vocab_coverage`` (exercised fraction
of the MODEL vocab — added/control tokens excluded), ``top_decile_
mass`` (fraction of all token occurrences carried by the most
frequent 10% of exercised ids — Zipf concentration), ``singleton_
ids`` (ids seen exactly once: pruning candidates), ``n_tokens``, and
``bytes_per_token`` (UTF-8 compression — the byte-based complement
to the fitness report's chars_per_token, which undercounts CJK where
a char is 3 bytes).

Scale shape: one Arrow-batched encode pass (``tokenio.encode_for_
spec``'s family dispatch),
one explode into the per-(group, id) frequency table — partial
aggregation collapses each partition to at most vocab-size rows
before the shuffle, so the exchanged data is O(groups x vocab),
never O(corpus tokens) — then windows and aggregates over that
vocab-sized table only. Byte totals ride a second, trivially small
aggregate joined on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
    encode_for_spec,
)


def vocab_utilization(
    df: DataFrame,
    spec,
    group_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_cap: int = 1_000_000,
) -> DataFrame:
    """(group?, n_docs, n_bytes, n_tokens, distinct_ids,
    vocab_coverage, top_decile_mass, singleton_ids, bytes_per_token)
    — one row per group (one row total when ``group_col`` is None).

    ``top_decile_mass`` uses ceil(distinct/10) head ids ranked by
    (count desc, id asc) — deterministic under ties; a group with
    fewer than 10 exercised ids degenerates to its single most
    frequent id's share. NULL texts count as zero-length docs; NULL
    groups are dropped; a group with zero tokens reports NULL
    bytes_per_token and zero everything else."""
    keys = [group_col] if group_col else []
    base = df
    if group_col:
        base = base.filter(F.col(group_col).isNotNull())

    text = F.coalesce(F.col(text_col), F.lit(""))
    meta = base.select(
        F.col(id_col).alias("__id"),
        *keys,
        F.octet_length(text).cast("long").alias("__bytes"),
    )
    # encode leg: tokenio.encode_for_spec's family dispatch (r19:
    # load_tokenizer_spec may hand callers a WordPieceSpec); both
    # kernels share the (id_col, token_ids) contract this report
    # consumes, and the cache_cap knob applies where a cache exists
    enc = encode_for_spec(
        base.select(F.col(id_col), text.alias(text_col)),
        spec,
        id_col=id_col,
        text_col=text_col,
        cache_cap=cache_cap,
    ).select(F.col(id_col).alias("__id"), "token_ids")
    j = meta.join(enc, "__id")

    sizes = (j.groupBy(*keys) if keys else j.groupBy()).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__bytes").alias("n_bytes"),
    )

    # the per-(group, id) frequency table: vocab-bounded post-shuffle
    freq = (
        j.select(*keys, F.explode("token_ids").alias("__tid"))
        .groupBy(*keys, "__tid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    w_rank = W.partitionBy(*keys).orderBy(
        F.col("__cnt").desc(), F.col("__tid").asc()
    )
    w_all = W.partitionBy(*keys).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    ranked = (
        freq.withColumn("__rk", F.row_number().over(w_rank))
        # distinct-id count as a window column so the head predicate
        # is a plain expression inside ONE aggregate (a window cannot
        # nest inside agg); both windows share the group partitioning
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
    )
    head = F.col("__rk") <= F.ceil(F.col("__n") / 10)
    util = (ranked.groupBy(*keys) if keys else ranked.groupBy()).agg(
        F.count(F.lit(1)).alias("distinct_ids"),
        F.sum("__cnt").alias("n_tokens"),
        F.count_if(F.col("__cnt") == 1).alias("singleton_ids"),
        F.sum(
            F.when(head, F.col("__cnt")).otherwise(F.lit(0))
        ).alias("__head_mass"),
    )

    out = sizes.join(util, keys, "left") if keys else sizes.crossJoin(util)
    # MODEL vocab only, per the documented definition: tokenio folds
    # added_tokens into spec.vocab on load, so len(spec.vocab) would
    # silently include added/control tokens and understate coverage.
    # Exclude by KEY (not by count) -- an added token whose content was
    # already a learned vocab entry folds without growing the dict, so
    # a plain len-subtraction would over-subtract there.
    added = getattr(spec, "added_tokens", None) or {}
    vocab_size = sum(1 for t in spec.vocab if t not in added)
    if vocab_size == 0:
        # every vocab key is an added/control token: there is no
        # model vocab to measure coverage against -- Spark's null
        # division would otherwise emit a silently-NULL column
        raise ValueError(
            "vocab_utilization: the spec has no model vocabulary "
            "(every entry is an added/control token)"
        )
    zero = F.coalesce(F.col("n_tokens"), F.lit(0)) == 0
    return out.select(
        *keys,
        "n_docs",
        "n_bytes",
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce("distinct_ids", F.lit(0).cast("long")).alias(
            "distinct_ids"
        ),
        (
            F.coalesce("distinct_ids", F.lit(0)) / F.lit(float(vocab_size))
        ).alias("vocab_coverage"),
        F.when(zero, F.lit(None)).otherwise(
            F.col("__head_mass") / F.col("n_tokens")
        ).alias("top_decile_mass"),
        F.coalesce("singleton_ids", F.lit(0).cast("long")).alias(
            "singleton_ids"
        ),
        F.when(zero, F.lit(None)).otherwise(
            F.col("n_bytes") / F.col("n_tokens")
        ).alias("bytes_per_token"),
    )
