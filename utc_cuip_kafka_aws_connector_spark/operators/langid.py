"""Model-based language identification: multinomial Naive Bayes over
hashed CHARACTER n-gram features.

Why this exists: the catalog's ``text.language_id`` is a marker-word
heuristic — deterministic and SQL-expressible (its gate oracle needs
that), but a handful of function words per language is exactly what
real pipelines outgrow first. The public production answer is a
learned classifier over character n-grams: Cavnar & Trenkle 1994
("N-Gram-Based Text Categorization", the canonical char-n-gram
lang-id result), and fastText's language-identification models
(Joulin et al. 2016) which ship char-n-gram buckets for 176
languages. This module trains that family's simplest member on YOUR
labeled corpus, with the same hashed-feature Naive Bayes machinery
the quality tier already runs (operators/nbquality.py — the r13
VERDICT's "infrastructure sits ready" item, closed r14).

Char n-grams, not words, because language identity lives below the
word level (morphology: "-tion"/"-ción"/"-zione"), needs no
tokenizer agreement across scripts, and is robust to OOV words —
every reason the published systems use them.

Scale shape: inherited unchanged from nbquality — training is ONE
map-side-combined count aggregation over exploded hashed n-grams
(vocabulary never collected; the model is a DataFrame of
(label, feature, log_lik) + a label-sized prior table), scoring is
one explode + one broadcast-ish join per doc batch + one groupBy.
The char-n-gram expression is a JVM ``transform`` over substring
offsets — no Python anywhere. Persistence is two parquet tables + a
JSON sidecar, so a model trained once scores any number of
curate-full runs (``cli.py curate-full --langid-model``).

Reference basis: the reference repo (389 lines, Kafka->csv/S3) has
no classifier surface; SURVEY §2.D training-data-pipeline scope,
public algorithms only.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.arrayops import (
    sliding_grams,
)
from utc_cuip_kafka_aws_connector_spark.operators.nbquality import (
    nb_predict,
    nb_train,
)


def char_ngram_features(
    text_col: str | Column, n: int = 3, n_features: int = 1 << 18
) -> Column:
    """All character n-grams of the normalized text, hashed onto
    [0, n_features): lowercase, whitespace runs collapsed to one
    space, one leading/trailing space so word boundaries contribute
    boundary-grams (the Cavnar-Trenkle padding). Null text maps to
    no features.

    Shape note (measured, r14): grams come from
    ``arrayops.sliding_grams`` — arrays_zip of n shifted slices —
    NOT from a ``transform`` whose lambda indexes back into the
    normalized string; see that module's re-evaluation note (this
    call site is where the 74 s -> 7.5 s sf0.1 measurement was
    taken)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), r"\s+", " ")),
        F.lit(" "),
    )
    chars = F.split(norm, "")
    grams = sliding_grams(chars, n, sep="")
    # empty text normalizes to "  " (two pad spaces): all-blank grams
    # carry no language signal and would otherwise dominate priors
    grams = F.filter(grams, lambda g: F.trim(g) != F.lit(""))
    return F.transform(
        grams, lambda g: F.pmod(F.xxhash64(g), F.lit(n_features))
    )


def langid_train(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
    n_features: int = 1 << 18,
    alpha: float = 1.0,
) -> dict:
    """Train the char-n-gram NB language identifier on a labeled
    corpus: nbquality's one-aggregation training with the character
    featurizer plugged in. Returns the nb model dict plus the
    ``char_n`` it must be scored with."""
    model = nb_train(
        df,
        text_col=text_col,
        label_col=label_col,
        n_features=n_features,
        alpha=alpha,
        featurizer=lambda col, nf: char_ngram_features(col, n, nf),
    )
    model["char_n"] = int(n)
    return model


def langid_predict(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """(id, predicted, score): argmax language per document, the
    deterministic tie-break inherited from nb_predict. Every input
    id appears (empty docs score prior-only). ``broadcast_model``
    passes through to the nb scorers: at a handful of languages the
    likelihood table is MBs and broadcasting removes the
    corpus-sized exchange. Crossover, MEASURED (r16 sf1 probe,
    BENCH_NOTES: 5 labels x 2^18 buckets = ~1.3M likelihood rows,
    15M exploded feature rows, local[32] -- 8.89 s broadcast vs
    5.73 s shuffle): switch to False once the likelihood table
    reaches ~1M rows, an order of magnitude EARLIER than the old
    "fastText scale, ~40M rows" guidance; a fastText-scale model
    (176 languages x 2^18 buckets) is far past it and would OOM the
    forced broadcast outright. Caveat: measured on a single JVM,
    which if anything flatters broadcast -- re-measure before
    pinning multi-executor cluster guidance. Same knob family as
    kn_score's crossover table (r13)."""
    return nb_predict(
        df, model, id_col=id_col, text_col=text_col,
        broadcast_model=broadcast_model,
    )


def langid_relabel(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    broadcast_model: bool = True,
) -> DataFrame:
    """Overwrite (or create) ``lang_col`` with the model's predicted
    language — THE shared relabel step behind both
    ``curate-full --langid-model`` and
    ``stream-curate --langid-model`` (one definition, so batch and
    streaming relabel semantics can never drift apart).
    Row-preserving: every input id gets a prediction (empty docs on
    priors alone); one equi-join on the id, no other data motion."""
    pred = langid_predict(
        df, model, id_col=id_col, text_col=text_col,
        broadcast_model=broadcast_model,
    )
    base = df.drop(lang_col) if lang_col in df.columns else df
    return base.join(
        pred.select(id_col, F.col("predicted").alias(lang_col)), id_col
    )


def langid_save(model: dict, path: str) -> None:
    """Persist as two parquet tables + a JSON sidecar, so one trained
    identifier serves every later curation run (the lrquality
    save/load contract, NB-shaped)."""
    model["likelihood"].write.mode("overwrite").parquet(
        os.path.join(path, "likelihood")
    )
    model["priors"].write.mode("overwrite").parquet(
        os.path.join(path, "priors")
    )
    meta = {
        "n_features": model["n_features"],
        "alpha": model["alpha"],
        "text_col": model["text_col"],
        "char_n": model["char_n"],
    }
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)


def langid_load(spark: SparkSession, path: str) -> dict:
    """Inverse of langid_save; the featurizer is reconstructed from
    the sidecar's char_n, so score-time hashing is bit-identical to
    training."""
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    n = int(meta["char_n"])
    return {
        "likelihood": spark.read.parquet(os.path.join(path, "likelihood")),
        "priors": spark.read.parquet(os.path.join(path, "priors")),
        "n_features": int(meta["n_features"]),
        "alpha": float(meta["alpha"]),
        "text_col": meta["text_col"],
        "char_n": n,
        "featurizer": lambda col, nf: char_ngram_features(col, n, nf),
    }
