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

Model-based signal blocks (r13, the stamped follow-up — each appears
only when its model/eval input is passed, so the report still runs
on a bare corpus):

  ppl_*           mean perplexity under a reference Kneser-Ney LM +
                  the CCNet head/middle/tail bucket cut thresholds
                  (ngramlm.kn_score / perplexity_buckets)
  dsir_*          mean per-document DSIR log importance weight vs a
                  target domain (dsir.dsir_weights) — how in-domain
                  the corpus is, as one number
  semdecontam_*   eval-set semantic contamination: mean/max of
                  max_cosine and the fraction at or above the
                  contamination threshold (semdecontam.
                  embedding_decontaminate)

Everything is aggregation-only (no collect of row data); the result
is a small long-format (metric, value) frame so it prints, writes,
and diffs uniformly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.entropy import (
    with_entropy_cols,
)
from utc_cuip_kafka_aws_connector_spark.operators.text import quality_score


def _core_aggregate(df: DataFrame, text_col: str) -> DataFrame:
    """The data card's base block as ONE corpus pass (VERDICT r13
    What's-wrong #3 — it used to be ~5: count, length agg, quality
    agg, entropy agg, distinct-hash count). One projection stacks
    every per-document signal (length, heuristic quality, the Arrow
    entropy kernel appended column-preservingly, the md5 dup hash),
    then one multi-aggregate computes all the card rows; Spark plans
    count-distinct alongside the plain aggregates via Expand, still
    a single scan of the input (plan-pinned in tests/test_report.py).
    Exposed at module level so the plan test can explain exactly the
    frame corpus_report executes."""
    proj = with_entropy_cols(
        quality_score(df.select(text_col), text_col=text_col),
        text_col=text_col,
    ).select(
        F.length(text_col).alias("L"),
        "quality",
        "char_entropy",
        "zlib_ratio",
        F.md5(F.col(text_col)).alias("h"),
    )
    return proj.agg(
        F.count(F.lit(1)).alias("rows"),
        F.min("L").alias("len_min"),
        F.expr("percentile(L, 0.5)").alias("len_p50"),
        F.expr("percentile(L, 0.95)").alias("len_p95"),
        F.max("L").alias("len_max"),
        F.avg("quality").alias("quality_mean"),
        F.avg("char_entropy").alias("char_entropy_mean"),
        F.avg("zlib_ratio").alias("zlib_ratio_mean"),
        # count_distinct skips NULL; the pre-r14 distinct().count()
        # counted the null-text group as one distinct value, so add
        # it back explicitly — a refactor must not move a published
        # card metric (review r14)
        (
            F.count_distinct(F.col("h"))
            + F.max(F.col("h").isNull().cast("long"))
        ).alias("distinct_hashes"),
    )


def corpus_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    slice_cols: tuple[str, ...] = ("lang", "source"),
    top_n: int = 5,
    ppl_lm: dict | None = None,
    ppl_buckets: int = 3,
    ppl_buckets_method: str = "exact",
    dsir_model: DataFrame | None = None,
    dsir_buckets: int = 10_000,
    dsir_n_max: int = 2,
    eval_embeddings: DataFrame | None = None,
    embedding_col: str = "embedding",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
    decontam_cosine: float = 0.95,
    diversity_ns: tuple[int, ...] | None = None,
) -> DataFrame:
    """(metric string, value double) summary rows. ``slice_cols``
    that are absent from the frame are skipped silently (the report
    adapts to the schema). ``ppl_lm`` (a loaded kn model dict),
    ``dsir_model`` (a dsir_fit frame — buckets/n_max MUST match the
    fit, the dsir feature-space contract) and ``eval_embeddings``
    each switch on their model-based block; all remain
    aggregation-only compositions of the underlying operators.

    ``ppl_buckets_method`` forwards to ngramlm.perplexity_buckets:
    "exact" (default — deterministic global-window cut, the form the
    published card numbers should rest on) or "approx" (the
    corpus-scale choice: approxQuantile thresholds, no global sort;
    bucket populations equal only to the operator's rel_err, so
    cut rows become approximate quantiles)."""
    spark = df.sparkSession
    core = _core_aggregate(df, text_col)
    row = core.first()
    n = int(row["rows"])
    out: list[tuple[str, float]] = [("rows", float(n))]
    if n == 0:
        return spark.createDataFrame(out, "metric string, value double")
    out += [
        ("len_min", float(row["len_min"])),
        ("len_p50", float(row["len_p50"])),
        ("len_p95", float(row["len_p95"])),
        ("len_max", float(row["len_max"])),
        ("quality_mean", float(row["quality_mean"])),
        ("char_entropy_mean", float(row["char_entropy_mean"])),
        ("zlib_ratio_mean", float(row["zlib_ratio_mean"])),
        ("exact_dup_ratio", float(n - int(row["distinct_hashes"])) / n),
    ]

    if ppl_lm is not None:
        from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
            kn_score,
            perplexity_buckets,
        )

        scored = kn_score(
            df.select(id_col, text_col), ppl_lm,
            text_col=text_col, id_col=id_col,
        ).persist()  # one scoring pass feeds mean + bucket cuts
        if ppl_buckets_method == "approx":
            # The approx bucket assignment can leave a bucket EMPTY
            # under heavy ties (a documented perplexity_buckets
            # property), so deriving cut rows from per-bucket maxima
            # would silently drop card rows — and release_report
            # treats an absent metric as 0, fabricating a delta
            # (review r16). The card's cuts come straight from the
            # quantile summary instead (the same Greenwald-Khanna
            # pass perplexity_buckets(method="approx") runs, at the
            # OPERATOR'S OWN rel_err default — read off its
            # signature, so the two call sites cannot drift apart),
            # and ppl_max rides the mean's aggregation (one corpus
            # pass, not two — this path exists for scales where
            # extra passes over `scored` hurt). Every ppl row is
            # always present on both paths.
            import inspect

            rel_err = inspect.signature(
                perplexity_buckets
            ).parameters["rel_err"].default
            stats = scored.agg(
                F.avg("ppl").alias("mean"), F.max("ppl").alias("max")
            ).first()
            out.append(("ppl_mean", float(stats["mean"])))
            qs = [k / ppl_buckets for k in range(1, ppl_buckets)]
            for k, c in enumerate(
                scored.stat.approxQuantile("ppl", qs, rel_err), 1
            ):
                out.append((f"ppl_bucket_cut:{k}", float(c)))
            out.append(("ppl_max", float(stats["max"])))
        else:
            out.append(
                ("ppl_mean", float(scored.agg(F.avg("ppl")).first()[0]))
            )
            cuts = (
                perplexity_buckets(
                    scored, n_buckets=ppl_buckets, id_col=id_col,
                    method=ppl_buckets_method,
                )
                .groupBy("bucket")
                .agg(F.max("ppl").alias("cut"))
                .collect()
            )
            for r in sorted(cuts, key=lambda r: r.bucket):
                # bucket k's max ppl is the k/n_buckets quantile cut;
                # the last bucket's is just the corpus max — publish
                # it too (the card's worst-document headline)
                name = (
                    f"ppl_bucket_cut:{r.bucket}"
                    if r.bucket < ppl_buckets
                    else "ppl_max"
                )
                out.append((name, float(r.cut)))
        scored.unpersist()

    if dsir_model is not None:
        from utc_cuip_kafka_aws_connector_spark.operators.dsir import (
            dsir_weights,
        )

        w = dsir_weights(
            df.select(id_col, text_col), dsir_model,
            text_col=text_col, id_col=id_col,
            n_buckets=dsir_buckets, n_max=dsir_n_max,
        ).agg(F.avg("log_weight")).first()[0]
        out.append(("dsir_logweight_mean", float(w)))

    if eval_embeddings is not None:
        from utc_cuip_kafka_aws_connector_spark.operators.semdecontam import (
            embedding_decontaminate,
        )

        sc = embedding_decontaminate(
            df.select(id_col, embedding_col), eval_embeddings,
            id_col=id_col, vec_col=embedding_col,
            eval_id_col=eval_id_col, eval_vec_col=eval_vec_col,
        )
        agg = sc.agg(
            F.avg("max_cosine"),
            F.max("max_cosine"),
            F.sum(
                (F.col("max_cosine") >= F.lit(decontam_cosine)).cast("long")
            ),
        ).first()
        # null/zero-embedding rows score null: they carry no semantic
        # evidence, so mean/max skip them and the ratio counts them
        # clean (denominator stays the full corpus)
        out += [
            ("semdecontam_max_cosine_mean",
             float(agg[0]) if agg[0] is not None else 0.0),
            ("semdecontam_max_cosine_max",
             float(agg[1]) if agg[1] is not None else 0.0),
            ("semdecontam_contaminated_ratio", float(agg[2] or 0) / n),
        ]

    if diversity_ns:
        from utc_cuip_kafka_aws_connector_spark.operators.diversity import (
            ngram_diversity,
        )

        # the mode-collapse block (distinct-n, approx HLL counting —
        # its own explode pass, which is why it is opt-in rather
        # than part of the one-pass core)
        for r in sorted(
            ngram_diversity(
                df.select(text_col), ns=diversity_ns, text_col=text_col
            ).collect(),
            key=lambda r: r.n,
        ):
            out.append((f"distinct_ratio:n={r.n}", float(r.distinct_ratio)))

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
    **report_kwargs,
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

    ``report_kwargs`` forward to ``corpus_report`` on BOTH sides, so
    the model-based signal blocks (ppl_lm / dsir_model /
    eval_embeddings — scored against the SAME model/eval set for old
    and new) show up as ``*_delta`` rows: the release notes say not
    just "docs changed" but "perplexity under the reference LM moved
    by X, the corpus drifted Y closer to the target domain, eval
    contamination moved Z".
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

    old_m = {
        r.metric: r.value
        for r in corpus_report(old, id_col, text_col, **report_kwargs).collect()
    }
    new_m = {
        r.metric: r.value
        for r in corpus_report(new, id_col, text_col, **report_kwargs).collect()
    }
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
