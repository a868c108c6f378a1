"""Physical-plan regression tests (SURVEY §4 discipline): the point is
not that queries return right answers (the oracle gate does that) but
that they keep the *plans* a 100 TB deployment needs -- pushdown,
broadcast, no nested-loop joins, top-k without global sort.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        CATALOG[name].builder(spark, SF).explain("formatted")
    return buf.getvalue()


def test_q01_pushes_filter_and_prunes_columns(spark):
    p = plan_of(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # 7-column projection reaches the scan: the untouched columns don't
    assert "l_orderkey" not in p.split("ReadSchema")[1].splitlines()[0]


def test_q02_star_join_has_no_nested_loop(spark):
    p = plan_of(spark, "q02_revenue_by_region")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_q08_interval_join_is_equi_join(spark):
    """The bucketized interval join must plan as a hash/sort-merge
    equi-join -- a raw inequality join would be BroadcastNestedLoop."""
    p = plan_of(spark, "q08_interval_join")
    assert "BroadcastNestedLoopJoin" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or ("BroadcastHashJoin" in p)


def test_q09_asof_join_has_no_join_at_all(spark):
    """The union-trick as-of join is windows-only: no join operator,
    hence no possibility of an O(n^2) blow-up."""
    p = plan_of(spark, "q09_asof_join")
    assert "Join" not in p


def test_topk_uses_take_ordered(spark):
    for name in ("q19_global_topk", "q48_cosine_topk"):
        assert "TakeOrderedAndProject" in plan_of(spark, name), name


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """bucketBy co-location: a join between two tables bucketed on the
    join key needs no Exchange on either side."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
            "li_bucketed"
        )
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
            "orders_bucketed"
        )
        j = spark.table("li_bucketed").join(
            spark.table("orders_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, "bucketed join still shuffles"
        assert j.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_q11_multidim_scans_lineitem_once(spark):
    """q11 computes rollup+cube+grouping-sets from ONE lineitem scan:
    the pre-aggregate is localCheckpointed, so the final union-of-three
    plan must contain zero parquet scans (the single scan ran at
    checkpoint time) and three reads of the materialized RDD."""
    p = plan_of(spark, "q11_multidim_agg")
    assert "Scan parquet" not in p, "a multidim branch re-scans lineitem"
    assert p.count("ExistingRDD") >= 3, "branches don't share the checkpoint"


def test_text_quality_ops_are_scan_only(spark):
    """q90/q91 are projection-only passes: no Exchange (shuffle), no
    Python evaluation -- at 100 TB they must run entirely inside the
    scan stage."""
    for name in ("q90_pii_redaction", "q91_repetition_stats"):
        p = plan_of(spark, name)
        assert "Exchange" not in p, f"{name} shuffles"
        assert "Python" not in p, f"{name} leaves the JVM"
    # q90 (plain regexp expressions) must stay whole-stage-codegen'd;
    # q91's higher-order lambdas are interpreted by Spark design (HOF
    # expressions are excluded from codegen), so no assertion there.
    assert "codegen id" in plan_of(spark, "q90_pii_redaction")


def test_q100_end_to_end_shuffle_free(spark):
    """q100: bucketed layout must carry through the WHOLE query -- the
    SMJ needs no Exchange on either side AND the groupBy on the bucket
    key reuses the same distribution, so the executed plan contains
    zero Exchange nodes of any kind."""
    p = plan_of(spark, "q100_bucketed_join")
    assert "SortMergeJoin" in p, "q100 lost its sort-merge join"
    assert "Exchange" not in p, "q100 shuffles despite bucketing"


def test_q94_broadcasts_eval_index(spark):
    """Decontamination must join the corpus against a BROADCAST eval
    index -- shuffling the train side on gram would move the whole
    exploded corpus."""
    p = plan_of(spark, "q94_decontamination")
    assert "BroadcastHashJoin" in p, "eval index not broadcast"
    assert "SortMergeJoin" not in p, "train side shuffled on gram"


def test_q97_window_is_partitioned(spark):
    """Budget selection sorts per-stratum, never globally: the window
    spec must partition by lang (windowspecdefinition(lang, ...)), and
    the pre-window exchange must be a hashpartitioning on lang -- not
    a SinglePartition collapse, which would serialize the corpus
    through one task."""
    p = plan_of(spark, "q97_budget_selection")
    assert "Window" in p
    import re

    assert re.search(r"windowspecdefinition\(lang#\d+,", p), "window not partitioned by lang"
    assert re.search(r"hashpartitioning\(lang#\d+", p), "no hash partitioning on lang"
    assert "SinglePartition" not in p


def test_q98_no_global_row_window(spark):
    """The shard assigner's ROW-data cumsum must be partitioned by
    doc_id bucket with the offsets coming back BROADCAST. Since the r9
    leak fix, the measuring path computes the bucket offsets on the
    DRIVER from the bounded totals collect (no persist, nothing
    cached), so the lazy plan has ZERO unpartitioned windows anywhere
    -- strictly stronger than the old two-level shape, whose one
    unpartitioned window ran over the bucket totals."""
    from tests.plan_utils import window_arguments

    p = plan_of(spark, "q98_token_shards")
    assert "BroadcastHashJoin" in p, "offsets not broadcast back"
    unpartitioned, partitioned = window_arguments(p)
    assert len(unpartitioned) == 0, (
        f"unpartitioned window crept back into the row path\n{p}"
    )
    assert any("_psum_bucket" in a for a in partitioned), (
        "row cumsum not bucket-partitioned"
    )
    assert "Scan ExistingRDD" in p, "driver-computed offsets missing"


def test_q106_chunking_is_scan_local(spark):
    """Chunking must stay inside the scan stage: tokenize + window
    transform + posexplode are all narrow -- any Exchange here would
    mean a 100 TB corpus shuffles just to split strings."""
    p = plan_of(spark, "q106_document_chunking")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p  # no Python in the path
    assert "Generate" in p  # the posexplode


def test_q103_band_join_not_cartesian(spark):
    """Full-table near-dup candidate generation must be the band-bucket
    equi-join -- a nested-loop/cartesian here is the O(n^2) failure the
    operator exists to avoid."""
    p = plan_of(spark, "q103_near_dup_full_table")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_q102_q104_q105_decode_paths_are_single_pass(spark):
    """Multimodal decode queries: payload synthesis is JVM expressions,
    decode is exactly one Arrow-batched Python stage, and nothing
    shuffles -- blob pipelines must stream scan -> decode -> out."""
    for name in ("q102_image_decode", "q104_audio_decode", "q105_video_frame_sample"):
        p = plan_of(spark, name)
        assert "Exchange" not in p, name
        # tree node renders as "MapInPandas (<id>)"; the detail section
        # repeats the name, so count tree occurrences only
        assert p.count("MapInPandas (") == 1, name


def test_q107_vocab_is_broadcast(spark):
    """Token-rarity's join back to the vocabulary must BROADCAST the
    histogram: shuffling the exploded token stream by token would
    hot-spot reducers on Zipf-heavy tokens at scale."""
    p = plan_of(spark, "q107_token_rarity")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_q109_cdc_chunking_is_scan_local(spark):
    """Content-defined chunking must also stay inside the scan stage:
    boundary hashing and chunk slicing are all array expressions."""
    p = plan_of(spark, "q109_content_defined_chunks")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_q113_prefix_join_is_equi_join_no_python(spark):
    """Prefix-filter similarity join: candidate generation and the
    verify joins must all be hash equi-joins on token/id -- a
    cartesian or nested-loop here is the all-pairs blowup prefix
    filtering exists to avoid -- and the whole path is JVM-side."""
    p = plan_of(spark, "q113_prefix_jaccard_join")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_q114_bm25_broadcasts_probes_topk_pushed(spark):
    """BM25: the probe query set must reach the postings stream as a
    BROADCAST (never shuffling the corpus by term for a 9-term probe
    set), the whole score path stays JVM-side, and the per-query
    top-k must trigger WindowGroupLimit pushdown so no full ranking
    materializes."""
    p = plan_of(spark, "q114_bm25_retrieval")
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "WindowGroupLimit" in p


def test_q115_zorder_two_pruned_scans_no_python(spark):
    """Z-order layout profile: exactly two parquet scans -- the
    min/max stats pass and the keying pass, both pruned to the two
    dimension columns -- the 1-row stats broadcast back as a
    BroadcastNestedLoopJoin (the legitimate scalar-broadcast use),
    and zero Python: the curve key is pure expression work."""
    p = plan_of(spark, "q115_zorder_layout")
    # each scan renders once in the tree and once as a "(n) Scan
    # parquet" detail header; count the headers
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2
    for schema in re.findall(r"ReadSchema: (\S+)", p):
        assert schema == "struct<o_custkey:bigint,o_orderdate:timestamp_ntz>"
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_q116_hilbert_same_shape_as_zorder(spark):
    """Hilbert layout profile must keep q115's plan shape: two
    column-pruned scans (stats pass + keying pass), zero Python --
    the reflect-and-swap walk is one aggregate() fold, so the curve
    math stays expression work inside the scan stage."""
    p = plan_of(spark, "q116_hilbert_layout")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2
    for schema in re.findall(r"ReadSchema: (\S+)", p):
        assert schema == "struct<o_custkey:bigint,o_orderdate:timestamp_ntz>"
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p
    # same as q115's pin: the 1-row stats frame must come back as a
    # broadcast, never a shuffled join
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_q120_strip_is_scan_local(spark):
    """Driver-mode boilerplate strip: the returned frame's plan must
    be scan -> line synthesis (JVM expressions) -> ONE Arrow stage
    (the hot-set probe) with NO Exchange -- the corpus is never
    shuffled to be cleaned. The hot-set detection aggregate runs
    separately and is bounded by total_lines/min_docs."""
    p = plan_of(spark, "q120_boilerplate_strip")
    assert "Exchange" not in p
    assert len(re.findall(r"\(\d+\) MapInPandas", p)) == 1
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_q121_cap_window_group_limit_and_arrow_psl(spark):
    """Per-domain cap under the bundled COMPLETE PSL (r12): the
    rank<=N filter still compiles to WindowGroupLimit on BOTH sides
    of the domain Exchange (mega-domains prune map-side), and PSL
    resolution is the documented large-table path — ONE
    Arrow-vectorized eval, never a row-at-a-time BatchEvalPython.
    (Small custom tables still compile to the pure-JVM when-chain;
    tests/test_urlops.py pins that mode.)"""
    p = plan_of(spark, "q121_per_domain_cap")
    assert p.count("WindowGroupLimit") >= 2, p  # partial + final
    assert "ArrowEvalPython" in p
    assert "BatchEvalPython" not in p
    assert "MapInPandas" not in p
