"""Model-based quality / domain classification: multinomial Naive
Bayes over hashed token features, trained and scored distributed.

Why this exists: production training-data pipelines filter with a
LEARNED classifier, not only heuristics — the public pattern is
fastText-style linear models over n-gram features (Joulin et al.
2016; CCNet, GPT-3's Common-Crawl-vs-curated quality filter, CCNet's
wiki-vs-crawl discriminator). Multinomial NB over hashed unigrams is
the simplest member of that family whose training is EXACTLY one
distributed count aggregation — no SGD, no iterations, no
nondeterministic order-of-updates — which makes it the right first
model for a 100 TB corpus: both training and scoring are single
shuffle-bounded DataFrame plans.

Scale story:
- ``nb_train``: explode tokens -> hash to ``n_features`` buckets
  (xxhash64+pmod, the hashing trick — vocabulary never collected) ->
  ``groupBy(label, feature).count`` (map-side partial aggregation
  does the heavy lifting) -> per-label totals joined back broadcast.
  The model stays a DATAFRAME of (label, feature, log_lik) — at
  n_features=2^18 and a handful of labels it is MBs, but nothing
  requires it to fit on the driver.
- ``nb_score``: tokens explode once, each token LEFT-joins the model
  per label (labels are broadcast-small by construction; unseen
  features fall back to the smoothing term log(alpha) - log(denom)
  via coalesce), then one groupBy(doc) re-aggregation sums log
  probabilities and argmaxes the label. All JVM expressions —
  codegen'd, no Python in either path.

Float caveat (documented, mirroring operators/projection.py): log
likelihoods are doubles summed in shuffle order, so scores are
tolerance-stable rather than bit-stable across layouts; the
differential test pins scores to a pure-Python reference at 1e-9
relative tolerance and label argmax on a margin.

Reference basis: the reference repo (389 lines, Kafka->csv/S3,
run.py:27-56) has no classifier surface; this module is SURVEY §2.D
training-data-pipeline scope, built from the public algorithm.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.text import words


def _features(text_col: str, n_features: int) -> Column:
    """Non-empty tokens hashed onto [0, n_features) — the hashing
    trick; collisions are part of the model, identical in train and
    score because both use this one expression."""
    toks = F.filter(words(text_col), lambda w: w != F.lit(""))
    return F.transform(
        toks, lambda w: F.pmod(F.xxhash64(w), F.lit(n_features))
    )


def nb_train(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    n_features: int = 1 << 18,
    alpha: float = 1.0,
    featurizer=None,
    persist_counts: bool = False,
) -> dict:
    """One count-aggregation pass; returns the model as
    ``{"likelihood": DataFrame(label, feature, log_lik),
       "priors": DataFrame(label, log_prior, log_unseen), ...}``
    where ``log_lik = log(count + alpha) - log(total_label +
    alpha*n_features)`` and ``log_unseen`` is the same expression at
    count=0 (the per-label fallback every unseen feature scores).

    ``persist_counts`` caches the (label, feature, c) table so every
    downstream broadcast build reads it instead of re-running the
    corpus token explode — the right call when the training corpus is
    huge (the cached table is bounded by labels x n_features rows
    regardless of corpus size). Default off: at bench scale the
    materialization stall measures ~25% SLOWER than recomputing
    (r20 A/B, med 2.45 s vs 1.92 s), the same lesson as bm25's
    postings persist."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    featurizer = featurizer or _features
    feats = df.select(
        F.col(label_col).alias("label"),
        F.explode(featurizer(text_col, n_features)).alias("feature"),
    )
    counts = feats.groupBy("label", "feature").agg(
        F.count(F.lit(1)).alias("c")
    )
    if persist_counts:
        from pyspark import StorageLevel

        counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
    # Per-label token totals straight from the exploded frame (not
    # counts.groupBy: same integer — sum over feature buckets of c —
    # but the likelihood broadcast build then re-runs ONE aggregate
    # from the scan, not the counts aggregate NESTED under a second
    # one; r20 A/B med 1.92 s vs old 1.93 s, and the scale shape is
    # one map-side-combined pass either way).
    totals = feats.groupBy("label").agg(F.count(F.lit(1)).alias("total"))
    denom = F.log(F.col("total") + F.lit(float(alpha) * n_features))
    likelihood = counts.join(F.broadcast(totals), "label").select(
        "label",
        "feature",
        (F.log(F.col("c") + F.lit(float(alpha))) - denom).alias("log_lik"),
    )
    docs_per_label = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    n_total = df.count()
    priors = docs_per_label.join(F.broadcast(totals), "label").select(
        "label",
        (F.log("n_docs") - F.lit(math.log(n_total))).alias(
            "log_prior"
        ),
        (F.log(F.lit(float(alpha))) - denom).alias("log_unseen"),
    )
    return {
        "likelihood": likelihood,
        "priors": priors,
        "n_features": n_features,
        "alpha": float(alpha),
        "text_col": text_col,
        # the one expression train and score must share (hashed-
        # feature models are meaningless under a different map);
        # alternative feature spaces (operators/langid.py's char
        # n-grams) plug in here
        "featurizer": featurizer,
    }


def nb_score(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document (id, label, score) log-joint table — every doc
    scored under every label (labels broadcast-small), unseen
    features falling back to the label's smoothing term. Zero-token
    docs never reach the explode, but their log-joint is simply the
    prior (an empty product of likelihoods), so they are joined back
    with prior-only scores — every input id appears under every
    label, and downstream scorers (predict / log_odds) keep the full
    corpus row count (ADVICE r8: they used to silently drop empty
    docs)."""
    text_col = text_col or model["text_col"]
    featurizer = model.get("featurizer") or _features
    # the likelihood table is (labels x occupied feature buckets) —
    # MBs at the default 2^18 buckets — while the probe side is the
    # exploded corpus; broadcasting it removes the corpus-sized
    # exchange entirely (the sb_score/kn_score knob, r14: measured
    # 6x on the lang-id shape). broadcast_model=False restores the
    # shuffle join for models too large to replicate.
    hint = F.broadcast if broadcast_model else (lambda d: d)
    toks = df.select(
        F.col(id_col),
        F.explode(featurizer(text_col, model["n_features"])).alias("feature"),
    )
    pri = model["priors"]
    scored_tokens = (
        toks.crossJoin(F.broadcast(pri.select("label", "log_unseen")))
        .join(hint(model["likelihood"]), ["label", "feature"], "left")
        .select(
            id_col,
            "label",
            F.coalesce(F.col("log_lik"), F.col("log_unseen")).alias("ll"),
        )
    )
    sums = scored_tokens.groupBy(id_col, "label").agg(
        F.sum("ll").alias("ll_sum")
    )
    grid = df.select(id_col).crossJoin(
        F.broadcast(pri.select("label", "log_prior"))
    )
    return grid.join(sums, [id_col, "label"], "left").select(
        id_col,
        "label",
        (F.coalesce(F.col("ll_sum"), F.lit(0.0)) + F.col("log_prior")).alias(
            "score"
        ),
    )


def nb_predict(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """(id, predicted label, score): argmax over ``nb_score`` with a
    deterministic tie-break on label (max_by is order-unstable under
    exact float ties; sorting (score desc, label asc) is not)."""
    from pyspark.sql.window import Window as W

    scores = nb_score(df, model, id_col, text_col, broadcast_model)
    top = W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
    return (
        scores.withColumn("_rn", F.row_number().over(top))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("label").alias("predicted"), "score")
    )


def nb_log_odds(
    df: DataFrame,
    model: dict,
    keep_label: str,
    id_col: str = "doc_id",
    text_col: str | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """Binary quality filtering (id, log_odds): log-joint of
    ``keep_label`` minus the best other label; threshold at 0.0 for
    argmax-keep, higher for precision. The GPT-3/CCNet-style corpus
    filter shape."""
    scores = nb_score(df, model, id_col, text_col, broadcast_model)
    keep = scores.filter(F.col("label") == keep_label).select(
        id_col, F.col("score").alias("_keep")
    )
    rest = (
        scores.filter(F.col("label") != keep_label)
        .groupBy(id_col)
        .agg(F.max("score").alias("_rest"))
    )
    return keep.join(rest, id_col).select(
        id_col, (F.col("_keep") - F.col("_rest")).alias("log_odds")
    )


def nb_token_logprob(
    df: DataFrame,
    model: dict,
    label: str,
    id_col: str = "doc_id",
    text_col: str | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """(id, n_tokens, logprob_per_token): each document's mean token
    log-likelihood under ONE label's unigram model — the
    perplexity-proxy quality score (CCNet's "score against a
    reference-domain LM and filter the tail" shape, with the hashed
    unigram model standing in for the n-gram LM). Unlike
    ``nb_log_odds`` this needs no contrast class: train on the
    reference corpus only (single label) and threshold on
    logprob_per_token. Length-normalized, so long docs are not
    penalized; empty docs score null."""
    text_col = text_col or model["text_col"]
    featurizer = model.get("featurizer") or _features
    toks = df.select(
        F.col(id_col),
        F.explode(featurizer(text_col, model["n_features"])).alias("feature"),
    )
    hint = F.broadcast if broadcast_model else (lambda d: d)
    pri = model["priors"].filter(F.col("label") == label)
    scored = (
        toks.crossJoin(F.broadcast(pri.select("label", "log_unseen")))
        .join(hint(model["likelihood"]), ["label", "feature"], "left")
        .select(
            id_col,
            F.coalesce(F.col("log_lik"), F.col("log_unseen")).alias("ll"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum("ll") / F.count(F.lit(1))).alias("logprob_per_token"),
    )
    # docs with zero tokens never reach the explode -- join them back
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "logprob_per_token",
        )
    )
