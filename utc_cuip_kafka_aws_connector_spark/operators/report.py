"""Corpus data-card report: one call summarizing a document corpus
with the signals this repo already computes — the "data card" a
training-data build publishes next to its shards (public practice:
Datasheets for Datasets, Gebru et al. 2021; the stats blocks of
C4/RefinedWeb/Dolma dataset papers).

Pure composition — imports the existing operators, adds no new
semantics of its own (each metric's correctness is pinned by its
own module's suite; the tests here pin that composition equals
calling the parts directly):

  rows            total docs
  lang/source     top distribution slices (with everything-else mass)
  length          n_chars min / p50 / p95 / max
  quality         mean heuristic quality (text.quality_score)
  entropy         mean char entropy + zlib ratio (entropy module)
  exact_dup_ratio 1 - distinct(md5(text))/rows (dedup.exact_dedup)

Everything is aggregation-only (no collect of row data); the result
is a small long-format (metric, value) frame so it prints, writes,
and diffs uniformly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.entropy import entropy_stats
from utc_cuip_kafka_aws_connector_spark.operators.text import quality_score


def corpus_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    slice_cols: tuple[str, ...] = ("lang", "source"),
    top_n: int = 5,
) -> DataFrame:
    """(metric string, value double) summary rows. ``slice_cols``
    that are absent from the frame are skipped silently (the report
    adapts to the schema)."""
    spark = df.sparkSession
    n = df.count()
    out: list[tuple[str, float]] = [("rows", float(n))]
    if n == 0:
        return spark.createDataFrame(out, "metric string, value double")

    length = df.select(F.length(text_col).alias("L")).agg(
        F.min("L"), F.expr("percentile(L, 0.5)"), F.expr("percentile(L, 0.95)"), F.max("L")
    ).first()
    out += [
        ("len_min", float(length[0])),
        ("len_p50", float(length[1])),
        ("len_p95", float(length[2])),
        ("len_max", float(length[3])),
    ]

    q = quality_score(df, text_col=text_col).agg(F.avg("quality")).first()[0]
    out.append(("quality_mean", float(q)))

    ent = entropy_stats(df, id_col=id_col, text_col=text_col).agg(
        F.avg("char_entropy"), F.avg("zlib_ratio")
    ).first()
    out += [
        ("char_entropy_mean", float(ent[0])),
        ("zlib_ratio_mean", float(ent[1])),
    ]

    distinct = df.select(F.md5(F.col(text_col))).distinct().count()
    out.append(("exact_dup_ratio", float(n - distinct) / n))

    for col in slice_cols:
        if col not in df.columns:
            continue
        top = (
            df.groupBy(col)
            .count()
            .orderBy(F.desc("count"), F.asc(col))
            .limit(top_n)
            .collect()
        )
        covered = 0
        for r in top:
            out.append((f"{col}:{r[col]}", r["count"] / n))
            covered += r["count"]
        if covered < n:
            out.append((f"{col}:<other>", (n - covered) / n))

    return spark.createDataFrame(out, "metric string, value double")


def release_report(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    drift_cols: tuple[str, ...] = ("n_chars",),
    nbins: int = 20,
) -> DataFrame:
    """Release notes between two corpus versions, as one
    (metric, value) frame — the diff the data card of version N+1
    publishes against version N (public practice: the changelog
    blocks of versioned corpus releases). Pure composition:

      docs_added / docs_removed / docs_changed   membership by id,
                    change = same id, different md5(text)
      <metric>_delta   every scalar metric of ``corpus_report``,
                    new minus old (slices included, absent = 0)
      drift:<col>_psi  numeric drift of ``drift_cols`` (old side =
                    reference bins, the operators/drift.py contract)
    """
    from utc_cuip_kafka_aws_connector_spark.operators.drift import (
        numeric_drift,
    )

    spark = old.sparkSession
    o = old.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h_old"))
    nw = new.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h_new"))
    joined = o.join(nw, id_col, "full")
    membership = joined.agg(
        F.sum(F.col("_h_old").isNull().cast("long")).alias("added"),
        F.sum(F.col("_h_new").isNull().cast("long")).alias("removed"),
        F.sum(
            (
                F.col("_h_old").isNotNull()
                & F.col("_h_new").isNotNull()
                & (F.col("_h_old") != F.col("_h_new"))
            ).cast("long")
        ).alias("changed"),
    ).first()
    out = [
        ("docs_added", float(membership.added or 0)),
        ("docs_removed", float(membership.removed or 0)),
        ("docs_changed", float(membership.changed or 0)),
    ]

    old_m = {r.metric: r.value for r in corpus_report(old, id_col, text_col).collect()}
    new_m = {r.metric: r.value for r in corpus_report(new, id_col, text_col).collect()}
    for metric in sorted(set(old_m) | set(new_m)):
        out.append(
            (f"{metric}_delta", new_m.get(metric, 0.0) - old_m.get(metric, 0.0))
        )

    cols = [c for c in drift_cols if c in old.columns and c in new.columns]
    if cols:
        for r in numeric_drift(old, new, list(cols), nbins=nbins).collect():
            out.append((f"drift:{r.column}_psi", float(r.psi)))
            out.append((f"drift:{r.column}_null_rate_delta",
                        float(r.null_rate_cur - r.null_rate_ref)))

    return spark.createDataFrame(out, "metric string, value double")
