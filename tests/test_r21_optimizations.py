"""Focused pins for the round-21 operator-internals optimizations:
the count-based Jaccard scorer, the one-job-per-round connected-
components loop, and the scale-conditional fan-outs in the sketch /
LSH / IVF kernels. Each pin covers the path the sf-fixture gates
cannot reach (common-shingle correction, job budget, wide-scan
passthrough)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _array_reference_pairs(spark, df, max_df, threshold=0.5):
    """The pre-r21 array-materializing scorer, kept here as the
    differential reference: candidates from the (df-capped) inverted
    index, Jaccard from full shingle arrays re-joined onto the pairs.
    The count-based rewrite must reproduce it bit-for-bit."""
    from utc_cuip_kafka_aws_connector_spark.operators.dedup import (
        sketch_documents,
    )

    docs = (
        sketch_documents(df, "doc_id", "text", 3, num_hashes=0)
        .select("doc", "sh")
        .cache()
    )
    inv = docs.select("doc", F.explode("sh").alias("s"))
    if max_df is not None:
        rare = (
            inv.groupBy("s")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
        )
        inv = inv.join(rare.select("s"), "s", "left_semi")
    co = (
        inv.alias("x")
        .join(inv.alias("y"), "s")
        .filter(F.col("x.doc") < F.col("y.doc"))
        .groupBy(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .agg(F.count("*").alias("n_common_indexed"))
    )
    sh_a = docs.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    jacc = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        co.select("doc_a", "doc_b")
        .join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _boilerplate_corpus(spark):
    """Docs sharing a ubiquitous 6-word boilerplate prefix (its
    shingles exceed a small max_df) plus per-pair tails that differ in
    the last word — so near-dup Jaccard depends on counting the SHARED
    COMMON shingles exactly, not just the rare co-count."""
    bp = "alpha beta gamma delta epsilon zeta"
    rows = []
    for i in range(8):
        rows.append((2 * i, f"{bp} u{i} v{i} w{i} x{i}"))
        rows.append((2 * i + 1, f"{bp} u{i} v{i} w{i} y{i}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_jaccard_count_scorer_matches_array_reference(spark):
    from utc_cuip_kafka_aws_connector_spark.operators.dedup import (
        ngram_jaccard_pairs,
        sketch_documents,
    )

    df = _boilerplate_corpus(spark)
    max_df = 5

    # precondition: the common-correction path is actually exercised —
    # the boilerplate shingles exceed max_df
    inv = (
        sketch_documents(df, "doc_id", "text", 3, num_hashes=0)
        .select("doc", F.explode("sh").alias("s"))
    )
    n_common_shingles = (
        inv.groupBy("s").agg(F.count("*").alias("df")).filter(F.col("df") > max_df).count()
    )
    assert n_common_shingles > 0

    for cap in (max_df, None):
        got = sorted(
            map(tuple, ngram_jaccard_pairs(df, id_col="doc_id", max_df=cap).collect())
        )
        want = sorted(map(tuple, _array_reference_pairs(spark, df, cap).collect()))
        assert got == want  # exact, including the IEEE jaccard doubles
        assert len(got) >= 8  # every planted (2i, 2i+1) pair survives

    # and the correction is load-bearing: scoring the rare co-count
    # alone (no common correction) would lose planted pairs
    rare_only = (
        ngram_jaccard_pairs(df, id_col="doc_id", max_df=max_df)
        .count()
    )
    dropped_corpus = spark.createDataFrame(
        [(i, t.split(" ", 6)[-1]) for i, t in _boilerplate_corpus(spark).collect()],
        "doc_id long, text string",
    )
    without_bp = ngram_jaccard_pairs(
        dropped_corpus, id_col="doc_id", max_df=max_df
    ).count()
    assert without_bp < rare_only


def test_connected_components_pair_graph_job_budget(spark):
    """The r21 loop checkpoints only the neighbor-min step (the jump
    is lazy, round 1 needs no seed frame, the change count is a block
    scan of the checkpointed step). A 50-pair graph converges in two
    rounds; with AQE stage-materialization jobs included the whole
    build took 18 jobs before the rewrite and 13 after — pin a
    ceiling between the two so a regression to the
    eager-jump-plus-init-checkpoint shape fails loudly."""
    from utc_cuip_kafka_aws_connector_spark.operators.dedup import (
        connected_components,
    )

    sc = spark.sparkContext
    edges = spark.range(50).select(
        (F.col("id") * 2).alias("doc_a"), (F.col("id") * 2 + 1).alias("doc_b")
    )
    edges.collect()  # warm the input plan outside the counted group
    sc.setJobGroup("cc_job_budget", "r21 job-budget pin")
    try:
        out = connected_components(edges)
        n_jobs = len(sc.statusTracker().getJobIdsForGroup("cc_job_budget"))
    finally:
        sc.setJobGroup(None, None)
    assert {r["component"] for r in out.collect()} == {2 * i for i in range(50)}
    assert n_jobs <= 15, f"CC build ran {n_jobs} jobs (pre-r21 loop: 18)"


def test_cli_runners_release_operator_persists(spark, tmp_path):
    """Composed-pipeline block hygiene (VERDICT r20 #7): the setjoin
    and retrieval operators persist internal frames and leave the
    release to the terminal caller; the CLI runners are that caller,
    so after each runner completes NO persisted block it created may
    survive — a daemon chaining simjoin -> retrieve must not
    accumulate MEMORY_AND_DISK blocks across stages."""
    from utc_cuip_kafka_aws_connector_spark.cli import run_retrieve, run_simjoin

    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, f"alpha beta gamma w{i} x{i} y{i} z{i % 3}") for i in range(40)],
        "doc_id long, text string",
    ).write.parquet(corpus)

    jsc = spark.sparkContext._jsc
    # compare NEW blocks only: blocks left by earlier tests in the
    # shared session can be reaped by the ContextCleaner mid-test, so
    # full set equality would flake
    before = set(jsc.getPersistentRDDs().keys())

    out = run_simjoin(spark, corpus, str(tmp_path / "pairs"), threshold=0.5)
    assert out["read"] == 40
    assert not set(jsc.getPersistentRDDs().keys()) - before, (
        "run_simjoin leaked persisted blocks"
    )

    rows = run_retrieve(spark, corpus, "alpha w3", k=5)
    assert len(rows) == 5
    assert not set(jsc.getPersistentRDDs().keys()) - before, (
        "run_retrieve leaked persisted blocks"
    )


def test_fanouts_are_scale_conditional(spark):
    """sketch_documents / lsh_buckets / ivf_assign fan a NARROW scan
    out to the default parallelism but leave an already-parallel
    source untouched (the corpus-payload shuffle the guard removes at
    scale)."""
    import numpy as np

    from utc_cuip_kafka_aws_connector_spark.operators.dedup import (
        sketch_documents,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.similarity import (
        ivf_assign,
        lsh_buckets,
    )

    par = spark.sparkContext.defaultParallelism
    wide_n = par + 8

    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i}") for i in range(64)], "doc_id long, text string"
    )
    narrow = docs.coalesce(1)
    wide = docs.repartition(wide_n)
    assert sketch_documents(narrow, "doc_id").rdd.getNumPartitions() == par
    assert sketch_documents(wide, "doc_id").rdd.getNumPartitions() == wide_n

    vecs = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, -1.0, 0.5]) for i in range(64)],
        "vec_id long, embedding array<float>",
    )
    cents = np.random.RandomState(0).normal(size=(4, 4))
    for op in (
        lambda d: lsh_buckets(d, dim=4, num_tables=2, planes_per_table=4),
        lambda d: ivf_assign(d, cents),
    ):
        assert op(vecs.coalesce(1)).rdd.getNumPartitions() == par
        assert op(vecs.repartition(wide_n)).rdd.getNumPartitions() == wide_n
