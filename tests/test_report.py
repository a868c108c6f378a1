"""operators/report.py: the corpus data-card.

Evidence: composition equals calling the component operators
directly on the real fixture corpus, slice distributions sum to 1,
missing slice columns are skipped, and planted duplicates move the
dup ratio exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.entropy import entropy_stats
from utc_cuip_kafka_aws_connector_spark.operators.report import corpus_report
from utc_cuip_kafka_aws_connector_spark.operators.text import quality_score

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def card(docs):
    return {r.metric: r.value for r in corpus_report(docs).collect()}


def test_matches_component_operators(docs, card):
    n = docs.count()
    assert card["rows"] == n
    assert card["quality_mean"] == pytest.approx(
        quality_score(docs).agg(F.avg("quality")).first()[0]
    )
    ent = entropy_stats(docs).agg(
        F.avg("char_entropy"), F.avg("zlib_ratio")
    ).first()
    assert card["char_entropy_mean"] == pytest.approx(float(ent[0]))
    assert card["zlib_ratio_mean"] == pytest.approx(float(ent[1]))
    distinct = docs.select(F.md5("text")).distinct().count()
    assert card["exact_dup_ratio"] == pytest.approx((n - distinct) / n)
    assert card["len_min"] <= card["len_p50"] <= card["len_p95"] <= card["len_max"]


def test_slices_sum_to_one(card):
    for col in ("lang", "source"):
        mass = sum(v for k, v in card.items() if k.startswith(f"{col}:"))
        assert mass == pytest.approx(1.0)


def test_missing_slice_columns_are_skipped(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "other text")], "doc_id long, text string"
    )
    got = {r.metric for r in corpus_report(df).collect()}
    assert not any(m.startswith(("lang:", "source:")) for m in got)
    assert "rows" in got and "quality_mean" in got


def test_planted_duplicates_move_dup_ratio(spark):
    df = spark.createDataFrame(
        [(i, "same text") for i in range(8)] + [(8, "unique one"), (9, "unique two")],
        "doc_id long, text string",
    )
    card = {r.metric: r.value for r in corpus_report(df).collect()}
    assert card["exact_dup_ratio"] == pytest.approx(0.7)  # 10 rows, 3 distinct


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    card = {r.metric: r.value for r in corpus_report(df).collect()}
    assert card == {"rows": 0.0}


def test_release_report_between_versions(spark):
    from utc_cuip_kafka_aws_connector_spark.operators.report import (
        release_report,
    )

    old = spark.createDataFrame(
        [(i, f"document body {i} words here", "en", "s0", 25 + (i % 5))
         for i in range(100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    new = (
        old.filter(F.col("doc_id") >= 10)  # 10 removed
        .withColumn(
            "text",
            F.when(F.col("doc_id") < 15, F.concat(F.col("text"), F.lit(" edited")))
            .otherwise(F.col("text")),
        )
        .unionByName(
            spark.createDataFrame(
                [(1000 + i, f"fresh doc {i} text", "de", "s1", 300 + i)
                 for i in range(20)],
                "doc_id long, text string, lang string, source string, n_chars long",
            )
        )
    )
    rep = {r.metric: r.value for r in release_report(old, new).collect()}
    assert rep["docs_added"] == 20
    assert rep["docs_removed"] == 10
    assert rep["docs_changed"] == 5
    assert rep["rows_delta"] == 10  # 100 -> 110
    assert rep["drift:n_chars_psi"] > 0.1  # the fresh docs sit out of range
    assert rep["drift:n_chars_null_rate_delta"] == pytest.approx(0.0)
    # slice mass moved toward de/s1
    assert rep.get("lang:de_delta", 0) > 0.1


def test_release_report_identity(spark):
    from utc_cuip_kafka_aws_connector_spark.operators.report import (
        release_report,
    )

    df = spark.createDataFrame(
        [(i, f"same doc {i}", 10) for i in range(50)],
        "doc_id long, text string, n_chars long",
    )
    rep = {r.metric: r.value for r in release_report(df, df).collect()}
    assert rep["docs_added"] == rep["docs_removed"] == rep["docs_changed"] == 0
    assert all(v == pytest.approx(0.0, abs=1e-9) for m, v in rep.items()
               if m.endswith("_delta") or m.endswith("_psi"))


def test_model_signal_blocks_match_component_operators(spark, docs):
    """r13 stamped follow-up: the ppl / DSIR / semdecontam blocks are
    pure compositions — each card row equals calling the component
    operator directly, and release_report carries them as deltas."""
    from utc_cuip_kafka_aws_connector_spark.operators.dsir import (
        dsir_fit,
        dsir_weights,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
        kn_score,
        kn_train,
        kn_unpersist,
        perplexity_buckets,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.report import (
        corpus_report,
        release_report,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.semdecontam import (
        embedding_decontaminate,
    )

    corpus = docs.select("doc_id", "text").limit(120)
    ref = docs.select("text").limit(60)
    lm = kn_train(ref, order=2, min_count=2)
    dmodel = dsir_fit(ref, corpus, n_buckets=512).persist()
    emb = docs.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.lit(4)),
            lambda i: (F.col("doc_id") % i + F.lit(1.0)).cast("double"),
        ).alias("embedding"),
    ).limit(120)
    evals = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0, 1.0]), (1, [0.0, 1.0, 0.0, -1.0])],
        "vec_id long, embedding array<double>",
    )
    with_emb = corpus.join(emb, "doc_id")

    card = {
        r.metric: r.value
        for r in corpus_report(
            with_emb, ppl_lm=lm, ppl_buckets=3,
            dsir_model=dmodel, dsir_buckets=512,
            eval_embeddings=evals, decontam_cosine=0.9,
        ).collect()
    }

    scored = kn_score(with_emb.select("doc_id", "text"), lm)
    assert card["ppl_mean"] == pytest.approx(
        scored.agg(F.avg("ppl")).first()[0]
    )
    cuts = {
        r.bucket: r.cut
        for r in perplexity_buckets(scored, n_buckets=3)
        .groupBy("bucket").agg(F.max("ppl").alias("cut")).collect()
    }
    assert card["ppl_bucket_cut:1"] == pytest.approx(cuts[1])
    assert card["ppl_bucket_cut:2"] == pytest.approx(cuts[2])
    assert card["ppl_max"] == pytest.approx(cuts[3])

    assert card["dsir_logweight_mean"] == pytest.approx(
        dsir_weights(
            with_emb.select("doc_id", "text"), dmodel, n_buckets=512
        ).agg(F.avg("log_weight")).first()[0]
    )

    sc = embedding_decontaminate(
        with_emb.select("doc_id", "embedding"), evals
    )
    direct = sc.agg(
        F.avg("max_cosine"),
        F.max("max_cosine"),
        F.sum((F.col("max_cosine") >= 0.9).cast("long")),
    ).first()
    n = with_emb.count()
    assert card["semdecontam_max_cosine_mean"] == pytest.approx(float(direct[0]))
    assert card["semdecontam_max_cosine_max"] == pytest.approx(float(direct[1]))
    assert card["semdecontam_contaminated_ratio"] == pytest.approx(
        float(direct[2]) / n
    )

    # identity through release_report: same corpus both sides -> the
    # model-signal deltas are zero (and present)
    rep = {
        r.metric: r.value
        for r in release_report(
            with_emb, with_emb, ppl_lm=lm, ppl_buckets=3,
            dsir_model=dmodel, dsir_buckets=512,
            eval_embeddings=evals, decontam_cosine=0.9,
        ).collect()
    }
    for m in (
        "ppl_mean_delta", "dsir_logweight_mean_delta",
        "semdecontam_contaminated_ratio_delta",
    ):
        assert rep[m] == pytest.approx(0.0, abs=1e-9), m
    kn_unpersist(lm)
    dmodel.unpersist()


def test_cli_release_report(spark, tmp_path, capsys):
    """release-report verb: membership + deltas + drift out of the
    CLI, with the ppl signal block riding along."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    old_p, new_p = str(tmp_path / "v1"), str(tmp_path / "v2")
    rows = [
        (i, f"document number {i} body words here", 30 + i % 7)
        for i in range(60)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long"
    ).write.parquet(old_p)
    spark.createDataFrame(
        rows[10:] + [(900, "fresh new doc body", 18)],
        "doc_id long, text string, n_chars long",
    ).write.parquet(new_p)
    ref = str(tmp_path / "ref")
    spark.createDataFrame(
        [(f"document number {i} body words here",) for i in range(30)],
        "text string",
    ).write.parquet(ref)
    lm_dir = str(tmp_path / "lm")
    assert cli.main(
        ["lm", "--op", "train", "--model", lm_dir, "--input", ref,
         "--order", "2"]
    ) == 0
    capsys.readouterr()
    assert cli.main(
        ["release-report", "--old", old_p, "--new", new_p,
         "--ppl-lm", lm_dir]
    ) == 0
    out = capsys.readouterr().out
    assert "docs_added" in out and "docs_removed" in out
    assert "ppl_mean_delta" in out
    assert "drift:n_chars_psi" in out


def test_core_block_is_single_scan(spark):
    """VERDICT r13 #3: the base card block (length/quality/entropy/
    dup-hash) runs as ONE pass — the aggregate's physical plan scans
    the parquet input exactly once (count-distinct planned via
    Expand, not a second scan)."""
    from tests.plan_utils import formatted_plan
    from utc_cuip_kafka_aws_connector_spark.operators.report import (
        _core_aggregate,
    )

    import re

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = formatted_plan(_core_aggregate(docs, "text"))
    # count scan NODES (each appears once in the tree and once in the
    # detail section; the detail header is "(n) Scan parquet")
    scans = re.findall(r"\n\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, plan


def test_null_text_counts_as_one_distinct_group(spark):
    """Review r14: count_distinct skips NULL where the pre-refactor
    distinct().count() counted the null-text group — the card metric
    must not move. 10 rows: 3 null, 7 distinct -> 8 distinct groups
    -> dup ratio 0.2."""
    df = spark.createDataFrame(
        [(i, None) for i in range(3)]
        + [(10 + i, f"unique text number {i}") for i in range(7)],
        "doc_id long, text string",
    )
    card = {r.metric: r.value for r in corpus_report(df).collect()}
    assert card["exact_dup_ratio"] == pytest.approx(0.2)


def test_approx_buckets_card_rows_survive_heavy_ties(spark, docs):
    """Review r16: under ppl_buckets_method='approx' the bucket
    assignment can leave the TOP bucket empty when >= 1/n_buckets of
    documents tie at the maximum perplexity (approxQuantile returns
    the max as a cut and the strictly-greater comparison strands
    bucket n) — deriving card rows from per-bucket maxima then
    silently dropped ppl_max, and release_report fabricated a delta
    (absent metric reads as 0). The card now takes approx cuts from
    the quantile summary and ppl_max from a plain max, so every ppl
    row must be present, tie flood or not, and ppl_max must equal
    the true corpus max."""
    from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
        kn_score,
        kn_train,
        kn_unpersist,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.report import (
        corpus_report,
    )

    base = docs.select("doc_id", "text").limit(30)
    # plant the tie flood: > 1/3 of the corpus is ONE repeated
    # OOV-heavy document, so its (identical, unk-floored) ppl value
    # owns the MAXIMUM of the distribution — the precondition that
    # strands the top approx bucket, asserted below rather than hoped
    flood = spark.range(20).select(
        (F.col("id") + 500).alias("doc_id"),
        F.lit("zzqx wvvk qqjj xxoz kkvv zzqx wvvk qqjj").alias("text"),
    )
    corpus = base.unionByName(flood)
    lm = kn_train(docs.select("text").limit(60), order=2, min_count=2)
    try:
        scored = kn_score(corpus, lm).persist()
        true_max = scored.agg(F.max("ppl")).first()[0]
        flood_ppl = scored.where("doc_id = 500").first()["ppl"]
        assert flood_ppl == true_max, (
            "precondition lost: the planted flood must hold the "
            "corpus-max perplexity for the top bucket to strand"
        )
        card = {
            r.metric: r.value
            for r in corpus_report(
                corpus, ppl_lm=lm, ppl_buckets=3,
                ppl_buckets_method="approx",
            ).collect()
        }
        scored.unpersist()
    finally:
        kn_unpersist(lm)
    for row in ("ppl_mean", "ppl_bucket_cut:1", "ppl_bucket_cut:2", "ppl_max"):
        assert row in card, f"{row} missing under approx + ties"
    assert card["ppl_max"] == pytest.approx(true_max)


def test_corpus_report_diversity_block(spark, capsys):
    from utc_cuip_kafka_aws_connector_spark.operators.report import (
        corpus_report,
    )

    df = spark.createDataFrame(
        [(i, "the same line again and again", 0.5) for i in range(20)]
        + [(100 + i, f"unique words number {i} here now", 0.5) for i in range(20)],
        "doc_id long, text string, quality double",
    )
    rows = {
        r.metric: r.value
        for r in corpus_report(df, diversity_ns=(1, 2)).collect()
    }
    assert "distinct_ratio:n=1" in rows and "distinct_ratio:n=2" in rows
    assert 0 < rows["distinct_ratio:n=2"] < 1
    # off by default: no diversity rows, no extra pass
    base = {
        r.metric for r in corpus_report(df).collect()
    }
    assert not any(m.startswith("distinct_ratio") for m in base)
