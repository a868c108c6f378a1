r"""Discriminative quality classifier: logistic regression over
hashed unigram+bigram features — the fastText shape (Joulin et al.
2016) that public LLM data recipes actually deploy as "the quality
classifier" (GPT-3's curated-vs-CommonCrawl filter, the
Llama-recipe Wikipedia-reference classifiers, CCNet's
discriminator).

Why this exists next to ``operators/nbquality.py``: NB is the
zero-iteration generative member of the linear-classifier family —
the right FIRST model at 100 TB because training is one count
aggregation. This module is the discriminative member: trained
weights directly optimize keep-vs-drop log-loss, which is what the
published filters use. Both share the hashing-trick feature space;
choose NB when training data is huge and label noise high, LR when
you have a curated positive set and want calibrated probabilities.

Spark-first shape — every stage is a compiled Scala kernel, no
Python in train or score:

- features: ``text.words`` (the repo-wide regex-\s+ tokenizer) ->
  ``pyspark.ml.feature.NGram`` (bigrams) -> two ``HashingTF``
  (the hashing trick, vocabulary never collected) ->
  ``VectorAssembler``. Sparse vectors end-to-end.
- train: ``pyspark.ml.classification.LogisticRegression`` — MLlib's
  L-BFGS, gradient aggregation via treeAggregate (map-side partial
  gradients, the same combine discipline as every aggregation in
  this repo). Iterations are model-sized driver state (one weight
  vector), corpus-sized work stays in executors.
- score: the fitted pipeline's ``transform`` + one ``vector_to_array``
  projection to a ``p_keep`` double.

Float caveat (the repo-wide tolerance contract): L-BFGS sums
gradients in shuffle order, so coefficients are tolerance-stable
rather than bit-stable across layouts; the suite pins
layout-independence of PREDICTIONS at 1e-6 and internal consistency
(p_keep == sigmoid(w.x + b) recomputed from the published
coefficients) at 1e-9.

Scale story at 100 TB: each L-BFGS iteration is one pass over the
feature frame (persist it); n_features=2^18 keeps the weight vector
at 2 MB — broadcast-trivial. Label skew does not matter (no join);
the only shuffle is treeAggregate's tree reduction. For web-scale
positives-vs-crawl training the standard move is to downsample the
negative class to O(positives) first (``df.sample``) — the
classifier needs contrast, not the whole crawl.

Reference basis: the reference repo (389 lines, Kafka->csv/S3) has
no classifier surface; SURVEY §2.D training-data-pipeline scope,
built on public MLlib APIs and the published fastText recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKENS_COL = "__toks"
FEATURES_COL = "features"


def _feature_pipeline(n_features: int, bigrams: bool):
    """The fastText feature map as an MLlib Pipeline: hashed unigram
    (+ bigram) term-frequency sparse vectors over TOKENS_COL (the
    tokenization itself happens in ``_with_tokens``)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import HashingTF, NGram, VectorAssembler

    uni_tf = HashingTF(
        inputCol=TOKENS_COL, outputCol="__uni", numFeatures=n_features
    )
    stages = [uni_tf]
    assemble_in = ["__uni"]
    if bigrams:
        stages.append(NGram(n=2, inputCol=TOKENS_COL, outputCol="__bi_toks"))
        stages.append(
            HashingTF(
                inputCol="__bi_toks", outputCol="__bi", numFeatures=n_features
            )
        )
        assemble_in.append("__bi")
    stages.append(
        VectorAssembler(inputCols=assemble_in, outputCol=FEATURES_COL)
    )
    return Pipeline(stages=stages)


def _with_tokens(df: DataFrame, text_col: str) -> DataFrame:
    # THE repo-wide tokenizer (operators/text.words: regex \s+ split)
    # so the LR feature space genuinely shares the NB/ngram token
    # contract on multi-line and tabbed text, not just on the
    # single-space fixture shape; empties dropped, null text = empty
    from utc_cuip_kafka_aws_connector_spark.operators.text import words

    return df.withColumn(
        TOKENS_COL,
        F.filter(
            words(F.coalesce(F.col(text_col), F.lit(""))),
            lambda t: t != F.lit(""),
        ),
    )


def lr_train(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 2**18,
    bigrams: bool = True,
    max_iter: int = 100,
    reg_param: float = 1e-6,
    elastic_net: float = 0.0,
):
    """Fit the classifier on a frame with a BINARY ``label_col``
    (1 = keep/target, 0 = drop/background). Returns a fitted
    ``PipelineModel`` whose last stage is the LogisticRegressionModel
    (save with ``model.write().overwrite().save(path)``, load with
    ``lr_load``)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    labels = [r[0] for r in df.select(label_col).distinct().collect()]
    if not set(labels) <= {0, 1}:
        # sorted() would TypeError on a None among ints — report the
        # offending values (nulls included) instead of crashing
        shown = sorted((str(v) for v in labels), key=str)
        raise ValueError(
            f"label_col must be binary 0/1, found values {shown}"
        )
    feats = _feature_pipeline(n_features, bigrams)
    lr = LogisticRegression(
        featuresCol=FEATURES_COL,
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        elasticNetParam=elastic_net,
        standardization=False,  # sparse TF counts: keep raw scale
    )
    pipe = Pipeline(stages=feats.getStages() + [lr])
    base = _with_tokens(
        df.select(F.col(label_col).cast("double").alias(label_col), text_col),
        text_col,
    )
    # Right-size the training partitions before the fit (guide §2.6 /
    # §5): every L-BFGS iteration is one job over the instances frame,
    # and each TASK ships a dense n_features-dim gradient back to the
    # driver (2 MB at the 2^18 default) — partitions far in excess of
    # the row count multiply that traffic and the per-task overhead by
    # max_iter for nothing. Down-coalesce (narrow, no shuffle) toward
    # ~5k rows per partition; corpora big enough to need parallelism
    # keep it. Measured: an 80-row train at 32 scan partitions fit in
    # 257 s, coalesced 49 s, with identical scores.
    cur = base.rdd.getNumPartitions()
    target = max(1, min(cur, base.count() // 5000))
    if target < cur:
        base = base.coalesce(target)
    return pipe.fit(base)


def lr_score(
    df: DataFrame,
    model,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document keep probability ``(id_col, p_keep)`` — the
    probability of label 1 under the fitted model. One compiled
    transform chain; no Python."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(
        _with_tokens(df.select(id_col, text_col), text_col)
    )
    return scored.select(
        F.col(id_col),
        vector_to_array(F.col("probability")).getItem(1).alias("p_keep"),
    )


def lr_filter(
    df: DataFrame,
    model,
    min_p_keep: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep the rows the classifier accepts: semi-join on scored ids
    with ``p_keep >= min_p_keep`` (rows pass through unchanged —
    mirror of the nb_log_odds filter contract)."""
    keep = lr_score(df, model, id_col=id_col, text_col=text_col).where(
        F.col("p_keep") >= F.lit(float(min_p_keep))
    )
    return df.join(keep.select(id_col), id_col, "left_semi")


def lr_save(model, path: str) -> None:
    model.write().overwrite().save(path)


def lr_load(path: str):
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)
