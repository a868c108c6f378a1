"""Edge-case tests for the curation operators (sampling, diff,
connected-components durability) -- the round-2 advisor findings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_hash_sample_full_rate_keeps_everything(spark):
    """fraction=1.0 must be exact: the hex-threshold space tops out at
    'ffffffff', so a plain `<` would drop rows whose md5 prefix is
    exactly that. The 100% path skips the filter."""
    from utc_cuip_kafka_aws_connector_spark.operators.sampling import hash_sample

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    assert hash_sample(df, "doc_id", 1.0).count() == 2000
    assert hash_sample(df, "doc_id", 0.0).count() == 0


def test_hash_sample_thresholds_nest(spark):
    """The 5% sample is a strict subset of the 20% sample (nested
    thresholds) -- the mixture-ablation reproducibility property."""
    from utc_cuip_kafka_aws_connector_spark.operators.sampling import hash_sample

    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    small = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.05).collect()}
    big = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.2).collect()}
    assert small <= big
    assert 0 < len(small) < len(big) < 5000


def test_stratified_sample_full_rate_stratum_exact(spark):
    """A rate-1.0 stratum keeps every one of its rows; other strata
    still sample; default rate applies to unlisted strata."""
    from utc_cuip_kafka_aws_connector_spark.operators.sampling import stratified_sample

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    got = stratified_sample(df, "doc_id", "lang", {"en": 1.0, "de": 0.5}, default_rate=0.0)
    counts = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("en") == 1000  # every en row, exactly
    assert 300 < counts.get("de", 0) < 700
    assert "fr" not in counts  # default 0.0 -> none


def test_snapshot_diff_key_only(spark):
    """Empty compare_cols = membership diff: added/removed classify,
    'changed' never fires, and no TypeError from the reduce."""
    from utc_cuip_kafka_aws_connector_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"], []).collect()}
    assert got == {1: "removed", 3: "added"}
    both = snapshot_diff(old, new, ["k"], [], include_unchanged=True)
    assert {r["k"]: r["change_type"] for r in both.collect()}[2] == "unchanged"


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """reliable_checkpoint=True (fault-tolerant dir-backed lineage cut
    for executor-loss survival on long runs) must produce the same
    components as the fast localCheckpoint default."""
    from utc_cuip_kafka_aws_connector_spark.operators.dedup import connected_components

    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (20, 21)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    want = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            pairs, reliable_checkpoint=True, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert got == want == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_reliable_needs_dir(spark):
    """Explicit error (not a mid-job Spark failure) when the reliable
    mode is requested with no checkpoint dir configured anywhere."""
    from utc_cuip_kafka_aws_connector_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    if not spark.sparkContext._jsc.sc().checkpointDir().isEmpty():
        pytest.skip("a checkpoint dir is already set in this session")
    with pytest.raises(ValueError, match="checkpoint dir"):
        connected_components(pairs, reliable_checkpoint=True)


def test_lsh_ann_pairs_explicit_dim_matches_probe(spark):
    """Passing dim= skips the driver-side head() probe and must yield
    the identical pair set."""
    from utc_cuip_kafka_aws_connector_spark.operators.similarity import lsh_ann_pairs

    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.normal(size=(20, 16))
    rows = [(i, [float(x) for x in base[i % 20]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(
        (r["id_a"], r["id_b"]) for r in lsh_ann_pairs(df, cos_threshold=0.99).collect()
    )
    b = sorted(
        (r["id_a"], r["id_b"])
        for r in lsh_ann_pairs(df, cos_threshold=0.99, dim=16).collect()
    )
    assert a == b and len(a) == 20  # each planted copy pairs with its original


def test_cli_committer_flag_applies_conf(monkeypatch, tmp_path):
    """--committer s3a-magic wires cloud_committer_conf into the
    session factory (the object-store contract is one flag away)."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    captured = {}

    class FakeSpark:
        class read:  # noqa: N801 - mimic attribute shape
            pass

    def fake_get_spark(app_name=None, extra_conf=None, **kw):
        captured["extra_conf"] = extra_conf
        raise SystemExit(0)  # stop before any Spark work

    monkeypatch.setattr("utc_cuip_kafka_aws_connector_spark.session.get_spark", fake_get_spark)
    with pytest.raises(SystemExit):
        cli.main(
            [
                "--committer",
                "s3a-magic",
                "ingest",
                "--topic",
                "t",
                "--input",
                str(tmp_path / "x.jsonl"),
                "--output",
                str(tmp_path / "lake"),
            ]
        )
    assert captured["extra_conf"]["spark.hadoop.fs.s3a.committer.name"] == "magic"


def test_redact_pii_rewrites_all_three_categories(spark):
    """Each PII category is replaced by its placeholder; counts match;
    the phone pattern never claims an IP (dots break its char class)
    and email redaction runs first so its digits are off the table."""
    from utc_cuip_kafka_aws_connector_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call +1 (555) 010-0042 today"),
            (3, "host 192.168.1.4 is up"),
            (4, "none here"),
            (5, "a@b.io and 10.0.0.1 and +44 20 7946 0958 end"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert rows[1]["redacted"] == "mail [EMAIL] now"
    assert rows[2]["redacted"] == "call [PHONE] today"
    assert rows[3]["redacted"] == "host [IP] is up"
    assert rows[4]["redacted"] == "none here"
    assert rows[5]["redacted"] == "[EMAIL] and [IP] and [PHONE] end"
    assert (rows[5]["n_emails"], rows[5]["n_phones"], rows[5]["n_ips"]) == (1, 1, 1)
    assert (rows[4]["n_emails"], rows[4]["n_phones"], rows[4]["n_ips"]) == (0, 0, 0)


def test_repetition_stats_known_values(spark):
    """'a b a b c': 5 words, 3 distinct -> dup_word 0.4; bigrams
    [a b, b a, a b, b c]: 4 total, 3 distinct -> dup_bigram 0.25."""
    from utc_cuip_kafka_aws_connector_spark.operators.text import repetition_stats

    df = spark.createDataFrame([(1, "a b a b c")], "doc_id long, text string")
    r = repetition_stats(df).collect()[0]
    assert r["n_words"] == 5
    assert r["dup_word_ratio"] == pytest.approx(1 - 3 / 5)
    assert r["dup_bigram_ratio"] == pytest.approx(1 - 3 / 4)


def test_connected_components_frees_round_blocks(spark):
    """The CC loop unpersists each round's checkpoint blocks once the
    next round materializes: after the result is consumed, at most the
    final labels RDD survives in the block registry (not one per
    round + edges)."""
    from utc_cuip_kafka_aws_connector_spark.operators.dedup import connected_components

    before = set(spark.sparkContext._jsc.getPersistentRDDs().keys())
    # a 64-node path graph forces several pointer-jump rounds
    edges = spark.range(63).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    out = connected_components(edges)
    assert out.filter(F.col("component") != 0).count() == 0
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keys())
    assert len(after - before) <= 1  # final labels only


def test_redact_pii_property_no_survivors(spark):
    """Property: after redaction no '@'-bearing token, no 7+-digit
    run, and no dotted quad survives, for texts built from a
    PII-generating grammar."""
    import random

    from utc_cuip_kafka_aws_connector_spark.operators.text import redact_pii

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "x9", "no"]
    rows = []
    for i in range(200):
        parts = [rng.choice(words) for _ in range(rng.randint(1, 8))]
        kind = i % 4
        if kind == 0:
            parts.insert(rng.randint(0, len(parts)), f"user{i}@mail{i % 9}.example.com")
        elif kind == 1:
            parts.insert(rng.randint(0, len(parts)), f"+{rng.randint(1, 99)} ({rng.randint(100, 999)}) {rng.randint(100, 999)}-{rng.randint(1000, 9999)}")
        elif kind == 2:
            parts.insert(rng.randint(0, len(parts)), f"{rng.randint(1, 255)}.{rng.randint(0, 255)}.{rng.randint(0, 255)}.{rng.randint(1, 255)}")
        rows.append((i, " ".join(parts)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import re as _re

    for r in redact_pii(df).collect():
        red = r["redacted"]
        assert "@" not in red, red
        assert not _re.search(r"\d{7,}", red), red
        assert not _re.search(r"\d+\.\d+\.\d+\.\d+", red), red
        if r["doc_id"] % 4 != 3:
            assert "[" in red, red


def test_decontam_gram_paths_agree(spark):
    """The compiled NGram kernel the operator runs (operators/
    decontam.py::_gram_sets) and the pure-expression word_ngrams HOF
    must produce identical distinct-gram sets -- including the
    short-doc guard (docs with < n words yield [] on both paths)."""
    from utc_cuip_kafka_aws_connector_spark.operators.decontam import (
        _gram_sets,
        word_ngrams,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "one two"),  # shorter than n=3 -> []
        (2, "a a a a a"),  # duplicate grams collapse
        (3, "  padded   spaces   collapse  "),
        (4, "exactly three words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast = {
        r["doc_id"]: sorted(r["grams"])
        for r in _gram_sets(df, "doc_id", "text", 3, n_parts=2).collect()
    }
    hof = {
        r["doc_id"]: sorted(r["g"])
        for r in df.select("doc_id", word_ngrams("text", 3).alias("g")).collect()
    }
    assert fast == hof
    assert fast[1] == []
    assert fast[2] == ["a a a"]
    assert fast[4] == ["exactly three words"]


def test_decontaminate_flags_planted_overlap(spark):
    """Planted contamination: a train doc sharing a full sentence with
    an eval doc must be flagged with the right counts; a disjoint doc
    must not appear."""
    from utc_cuip_kafka_aws_connector_spark.operators.decontam import ngram_decontaminate

    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "prefix words alpha beta gamma delta suffix words"),
            (2, "completely different content here nothing shared"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_decontaminate(train, eval_df, n=3).collect()}
    assert 2 not in out
    r = out[1]
    # "alpha beta gamma" and "beta gamma delta" are the shared 3-grams
    assert r["n_contaminated"] == 2
    assert r["n_eval_docs"] == 1
    assert abs(r["contamination"] - 2 / r["n_ngrams"]) < 1e-12


def test_connected_components_chain_convergence_and_nonconvergence(spark):
    """Adversarial long-chain graph (path 0-1-2-...-n): the worst case
    for label propagation. With pointer jumping the min label crosses
    ~2^k hops after k rounds, so a 400-node chain converges well
    within the default max_iter=25 -- and with max_iter=2 it CANNOT,
    which must raise (round-5 finding: exhaustion used to return
    silently-partial labels that under-merge dedup clusters)."""
    import pytest as _pytest

    from utc_cuip_kafka_aws_connector_spark.operators.dedup import connected_components

    n = 400
    chain = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )

    got = {r["node"]: r["component"] for r in connected_components(chain).collect()}
    assert got == {i: 0 for i in range(n)}  # one component, min label 0

    with _pytest.raises(RuntimeError, match="did not converge in max_iter=2"):
        connected_components(chain, max_iter=2)

    with _pytest.warns(RuntimeWarning, match="did not converge"):
        partial = connected_components(chain, max_iter=2, on_nonconvergence="warn")
        labels = {r["component"] for r in partial.collect()}
        assert len(labels) > 1  # visibly partial, but surfaced loudly


def test_chunk_documents_window_semantics(spark):
    """Sliding-window chunking: tail-covering window count, exact
    overlap, short-doc passthrough, and lossless disjoint mode."""
    import pytest as _pytest

    from utc_cuip_kafka_aws_connector_spark.operators.chunking import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text), (2, "a b")], "doc_id long, text string")

    got = chunk_documents(df, chunk_size=4, stride=3).collect()
    one = sorted((r["chunk_idx"], r["n_tokens"], r["chunk_text"]) for r in got if r["doc_id"] == 1)
    # n=10, size=4, stride=3 -> 1 + ceil(6/3) = 3 chunks; last covers the tail
    assert one == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t6 t7 t8 t9"),
    ]
    short = [(r["chunk_idx"], r["n_tokens"], r["chunk_text"]) for r in got if r["doc_id"] == 2]
    assert short == [(0, 2, "a b")]

    # disjoint default (stride == chunk_size) reconstructs the doc exactly
    dis = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in chunk_documents(df, chunk_size=4).collect()
        if r["doc_id"] == 1
    )
    assert " ".join(t for _, t in dis) == text

    with _pytest.raises(ValueError, match="stride 5 > chunk_size 4"):
        chunk_documents(df, chunk_size=4, stride=5)
    with _pytest.raises(ValueError, match=">= 1"):
        chunk_documents(df, chunk_size=0)


def test_chunk_documents_matches_python_reference(spark):
    """Randomized differential check: the Catalyst chunking must equal
    a direct Python sliding-window reference across many doc lengths
    and (chunk_size, stride) combinations (seeded RNG)."""
    import math
    import random

    from utc_cuip_kafka_aws_connector_spark.operators.chunking import chunk_documents

    rng = random.Random(20260813)
    docs = [
        (i, " ".join(f"w{rng.randint(0, 9)}" for _ in range(rng.randint(1, 120))))
        for i in range(80)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def reference(text, size, stride):
        ws = text.split(" ")
        n = len(ws)
        n_chunks = 1 if n <= size else math.ceil((n - size) / stride) + 1
        return [
            (i, min(size, n - i * stride), " ".join(ws[i * stride : i * stride + size]))
            for i in range(n_chunks)
        ]

    for size, stride in [(16, 16), (16, 12), (32, 8), (7, 1)]:
        got = {}
        for r in chunk_documents(df, chunk_size=size, stride=stride).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
            )
        for i, t in docs:
            assert sorted(got[i]) == reference(t, size, stride), (i, size, stride)


def test_temperature_weights_semantics(spark):
    """tau=1 keeps natural proportions; tau=0.5 upsamples the small
    group; targets split the budget; weights always sum to ~1."""
    from utc_cuip_kafka_aws_connector_spark.operators.sampling import temperature_weights

    df = spark.createDataFrame([("en", 900), ("sw", 100)], "lang string, n_tokens long")

    nat = {r["lang"]: r["weight"] for r in temperature_weights(df, tau=1.0).collect()}
    assert abs(nat["en"] - 0.9) < 1e-12 and abs(nat["sw"] - 0.1) < 1e-12

    cool = {r["lang"]: r for r in temperature_weights(df, tau=0.5, budget=1000).collect()}
    assert cool["sw"]["weight"] > 0.1  # low-resource upsampled
    assert abs(cool["en"]["weight"] + cool["sw"]["weight"] - 1.0) < 1e-12
    assert cool["en"]["target"] + cool["sw"]["target"] == 1000
    assert cool["en"]["weight"] == 0.75 and cool["sw"]["weight"] == 0.25  # sqrt(900):sqrt(100)=3:1

    # arbitrary tau runs through pow() (operational path, not oracle-exact)
    hot = {r["lang"]: r["weight"] for r in temperature_weights(df, tau=0.7).collect()}
    assert nat["sw"] < hot["sw"] < cool["sw"]["weight"]


def test_chunk_documents_literal_separator(spark):
    """sep is a LITERAL: regex metacharacters like '.' must separate
    on the actual character, and chunks re-join with the same one."""
    from utc_cuip_kafka_aws_connector_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([(1, "a.b.c.d.e")], "doc_id long, text string")
    got = sorted(
        (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk_size=2, stride=2, sep=".").collect()
    )
    assert got == [(0, 2, "a.b"), (1, 2, "c.d"), (2, 1, "e")]


def test_token_rarity_ignores_empty_tokens(spark):
    """Leading/trailing whitespace must not create a phantom ''
    token in the vocabulary (the oracle filters w <> '' identically)."""
    from utc_cuip_kafka_aws_connector_spark.operators.text import token_rarity

    df = spark.createDataFrame(
        [(1, "  x y  "), (2, "x")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in token_rarity(df).collect()}
    assert got[1]["n_tokens"] == 2  # x, y -- no '' token
    assert got[1]["min_token_count"] == 1  # y count, not a phantom ''
    assert got[2]["n_tokens"] == 1 and got[2]["min_token_count"] == 2  # x appears twice corpus-wide


def test_content_defined_chunks_edit_stability(spark):
    """The CDC property: inserting a sentence mid-document only
    re-cuts chunks that overlap the edit -- chunks cut from content
    far after the insertion are IDENTICAL strings (fixed-stride
    windows would shift every one of them). Also checks losslessness:
    chunks re-join to the normalized document."""
    import random

    from utc_cuip_kafka_aws_connector_spark.operators.chunking import (
        content_defined_chunks,
    )

    rng = random.Random(42)
    base_tokens = [f"w{rng.randint(0, 500)}" for _ in range(400)]
    edited = base_tokens[:200] + ["INSERTED", "SENTENCE", "HERE"] + base_tokens[200:]
    df = spark.createDataFrame(
        [(1, " ".join(base_tokens)), (2, " ".join(edited))],
        "doc_id long, text string",
    )
    got = {1: [], 2: []}
    for r in content_defined_chunks(df).collect():
        got[r["doc_id"]].append((r["chunk_idx"], r["chunk_text"]))
    for d in got.values():
        d.sort()

    # lossless: chunks re-join to the (lowercased) document
    assert " ".join(t for _, t in got[1]) == " ".join(base_tokens).lower()
    assert " ".join(t for _, t in got[2]) == " ".join(edited).lower()

    # edit stability: chunk SETS share most members -- every chunk cut
    # entirely from the unedited suffix/prefix is byte-identical
    set1, set2 = {t for _, t in got[1]}, {t for _, t in got[2]}
    shared = set1 & set2
    assert len(shared) >= len(set1) - 3, (len(set1), len(set2), len(shared))
    assert len(set1) > 10  # the doc really was cut into many chunks


def test_distributed_prefix_sum_matches_bruteforce_all_levels(spark):
    """Exactness across level shapes: the same 120-row input must
    produce the identical inclusive prefix sum whether the bucket
    count fits one offsets window (two-level), or max_window_rows
    forces ONE recursion (three-level), or a tiny width forces TWO
    (four-level). Ids are sparse (stride 7) so the recursion also
    exercises non-dense bucket ids."""
    from utc_cuip_kafka_aws_connector_spark.operators.packing import (
        distributed_prefix_sum,
    )

    rows = [(i * 7, (i * 37) % 11 + 1) for i in range(120)]
    expected = {}
    run = 0
    for oid, v in rows:  # already ordered by id
        run += v
        expected[oid] = run
    df = spark.createDataFrame(rows, "oid long, val long")

    for kwargs in (
        {"bucket_width": 1000},                       # 1 bucket: two-level
        {"bucket_width": 4, "max_window_rows": 4},    # forced recursion
        {"bucket_width": 3, "max_window_rows": 2},    # depth >= 4
        {"bucket_width": 4, "max_window_rows": 4, "n_buckets": 210},  # hint path
    ):
        got = {
            r["oid"]: r["cum"]
            for r in distributed_prefix_sum(df, "oid", "val", **kwargs).collect()
        }
        assert got == expected, kwargs

    with pytest.raises(ValueError, match="bucket_width"):
        distributed_prefix_sum(df, "oid", "val", bucket_width=1)


def test_distributed_prefix_sum_window_shapes(spark):
    """Plan-shape checks. HINT path (caller supplies n_buckets; no
    measuring job, fully lazy): the corpus-level window is
    PARTITIONED and the single unpartitioned window only ever sees
    the <= max_window_rows offsets frame. MEASURED small path: the
    offsets are driver-computed from the bounded measuring collect
    (ADVICE r7 leak fix -- nothing persists), so the lazy plan is one
    partitioned window joined BROADCAST to a local offsets table.
    MEASURED recursion path: the tower materializes to scratch
    storage at build time and the returned plan scans it -- again one
    partitioned window, no unpartitioned window over anything; depth
    exactness stays pinned by the brute-force tests above."""
    from tests.plan_utils import formatted_plan, window_arguments
    from utc_cuip_kafka_aws_connector_spark.operators.packing import (
        distributed_prefix_sum,
    )

    df = spark.range(64).select(
        F.col("id").alias("oid"), F.lit(1).cast("long").alias("val")
    )
    hinted = distributed_prefix_sum(
        df, "oid", "val", bucket_width=1000, n_buckets=1
    )
    plan = formatted_plan(hinted)
    unpartitioned, partitioned = window_arguments(plan)
    assert len(unpartitioned) == 1, plan
    assert len(partitioned) == 1, plan

    small = distributed_prefix_sum(df, "oid", "val", bucket_width=1000)
    plan = formatted_plan(small)
    unpartitioned, partitioned = window_arguments(plan)
    assert len(unpartitioned) == 0, plan
    assert len(partitioned) == 1, plan
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan  # driver offsets
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan

    out = distributed_prefix_sum(
        df, "oid", "val", bucket_width=4, max_window_rows=4
    )
    plan = formatted_plan(out)
    unpartitioned, partitioned = window_arguments(plan)
    assert len(unpartitioned) == 0, plan
    assert len(partitioned) == 1, plan
    assert "Scan parquet" in plan  # the staged recursion offsets
    [last] = out.orderBy(F.col("oid").desc()).limit(1).collect()
    assert last["cum"] == 64


def test_prefix_sum_staging_dirs_are_tracked_and_swept(spark):
    """ADVICE r10: the measured recursion path staged one
    psum_offsets_* scratch dir per call and never removed it. Staged
    dirs now register for an atexit sweep (they must outlive the
    lazily-read plan, so process exit is their natural lifetime)."""
    import os

    from utc_cuip_kafka_aws_connector_spark.operators import packing

    df = spark.range(40).select(
        F.col("id").alias("oid"), F.lit(1).cast("long").alias("val")
    )
    before = list(packing._PSUM_STAGES)
    out = packing.distributed_prefix_sum(
        df, "oid", "val", bucket_width=4, max_window_rows=4
    )
    new = [d for d in packing._PSUM_STAGES if d not in before]
    assert new and all(os.path.isdir(d) for d in new)
    [last] = out.orderBy(F.col("oid").desc()).limit(1).collect()
    assert last["cum"] == 40
    packing._cleanup_psum_stages()
    assert not packing._PSUM_STAGES
    assert all(not os.path.exists(d) for d in new)


def test_distributed_prefix_sum_measuring_path_releases_its_cache(spark):
    """ADVICE r7 regression pin: the n_buckets-measuring path used to
    persist() the bucket totals and never unpersist -- one stranded
    cached frame per call for the session lifetime. The persistent-
    RDD registry must end where it started (delta, not absolute: the
    shared test session may hold other suites' caches)."""
    from utc_cuip_kafka_aws_connector_spark.operators.packing import (
        distributed_prefix_sum,
    )

    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    df = spark.range(100).select(
        F.col("id").alias("oid"), F.lit(2).cast("long").alias("val")
    )
    # measuring (n_buckets=None) in both branch shapes incl. recursion
    for kwargs in (
        {"bucket_width": 1000},
        {"bucket_width": 4, "max_window_rows": 4},
    ):
        assert distributed_prefix_sum(df, "oid", "val", **kwargs).count() == 100
    # Deterministic, no GC dance: the small branch never persists
    # (driver-computed offsets) and the recursion branch unpersists
    # inside the call after staging its offsets.
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before


def test_distributed_prefix_sum_fuzz(spark):
    """Hypothesis-shaped fuzz (derandomized inputs): random sparse
    id sets with random values, three level shapes, exact equality
    with the sequential running sum."""
    import random

    from utc_cuip_kafka_aws_connector_spark.operators.packing import (
        distributed_prefix_sum,
    )

    rng = random.Random(11)
    for trial in range(4):
        n = rng.randint(1, 150)
        ids = sorted(rng.sample(range(0, 50_000), n))
        vals = [rng.randint(0, 10_000) for _ in range(n)]
        expected, run = {}, 0
        for oid, v in zip(ids, vals):
            run += v
            expected[oid] = run
        df = spark.createDataFrame(list(zip(ids, vals)), "oid long, val long")
        kwargs = rng.choice(
            [
                {"bucket_width": 1000},
                {"bucket_width": 7, "max_window_rows": 5},
                {"bucket_width": 3, "max_window_rows": 2},
            ]
        )
        got = {
            r["oid"]: r["cum"]
            for r in distributed_prefix_sum(df, "oid", "val", **kwargs).collect()
        }
        assert got == expected, (trial, kwargs, n)


def test_free_checkpoint_blocks_falls_back_without_log4j():
    """ADVICE r15: the log4j quieting in the checkpoint-block free is
    cosmetic, so a driver classpath without reachable log4j2 classes
    (shaded/relocated, different logging backend) must fall back to
    plain unpersist -- never fail the free. Unit-tested with fakes;
    the happy path runs on real Spark in the connected_components
    tests above."""
    from utc_cuip_kafka_aws_connector_spark.operators.dedup import (
        _free_checkpoint_blocks,
    )

    class _Block:
        def __init__(self):
            self.freed = 0

        def unpersist(self):
            self.freed += 1

        def rdd(self):  # reached only when the jvm lookup succeeded
            raise AssertionError("rdd() must not be called on fallback")

    class _NoJvm:
        @property
        def _jvm(self):
            raise RuntimeError("JVM gateway unavailable")

    blocks = [_Block(), _Block()]
    _free_checkpoint_blocks(_NoJvm(), blocks)
    assert [b.freed for b in blocks] == [1, 1]

    import types

    class _Log4jMissing:
        def __getattr__(self, name):  # LogManager/Configurator/Level
            raise RuntimeError(f"class not found: {name} (shaded away)")

    class _BrokenLog4j:  # gateway up, log4j2 classes unreachable
        _jvm = types.SimpleNamespace(
            org=types.SimpleNamespace(
                apache=types.SimpleNamespace(
                    logging=types.SimpleNamespace(log4j=_Log4jMissing())
                )
            )
        )

    blocks2 = [_Block()]
    _free_checkpoint_blocks(_BrokenLog4j(), blocks2)
    assert blocks2[0].freed == 1

    _free_checkpoint_blocks(_NoJvm(), [])  # empty list: no-op


def test_free_checkpoint_blocks_restores_partially_quieted_loggers():
    """Review r17: when setLevel fails PARTWAY (py4j hiccup after
    some loggers were already dropped to ERROR), the fallback must
    restore the ones it quieted — not permanently mute their WARNs —
    and still free every block."""
    import types

    from utc_cuip_kafka_aws_connector_spark.operators.dedup import (
        _free_checkpoint_blocks,
    )

    set_calls = []

    class _Logger:
        def __init__(self, lvl):
            self._l = lvl

        def getLevel(self):
            return self._l

    class _LogMgr:
        @staticmethod
        def getLogger(n):
            return _Logger(f"PREV[{n}]")

    class _Conf:
        @staticmethod
        def setLevel(n, lvl):
            if lvl == "ERROR" and sum(
                1 for _, v in set_calls if v == "ERROR"
            ) == 1:
                raise RuntimeError("py4j hiccup on the second logger")
            set_calls.append((n, lvl))

    class _Level:
        ERROR = "ERROR"

    jvm = types.SimpleNamespace(
        org=types.SimpleNamespace(
            apache=types.SimpleNamespace(
                logging=types.SimpleNamespace(
                    log4j=types.SimpleNamespace(
                        LogManager=_LogMgr,
                        Level=_Level,
                        core=types.SimpleNamespace(
                            config=types.SimpleNamespace(Configurator=_Conf)
                        ),
                    )
                )
            )
        )
    )

    class _SC:
        _jvm = jvm

    class _Block:
        def __init__(self, name):
            self._name = name
            self.freed = 0

        def rdd(self):
            blk = self

            class _R:
                def getClass(self):
                    class _C:
                        def getName(_s):
                            return blk._name

                    return _C()

            return _R()

        def unpersist(self):
            self.freed += 1

    blocks = [_Block("rdd.ClassA"), _Block("rdd.ClassB")]
    _free_checkpoint_blocks(_SC(), blocks)
    assert [b.freed for b in blocks] == [1, 1]
    quieted = [n for n, v in set_calls if v == "ERROR"]
    assert len(quieted) == 1  # the hiccup stopped the loop after one
    # ...and that one was restored to its prior level
    assert (quieted[0], f"PREV[{quieted[0]}]") in set_calls


def test_free_checkpoint_blocks_success_path_restore_is_guarded():
    """ADVICE r17 (landed at the r19 unfreeze): the SUCCESS path's
    finally-restore must guard each setLevel like the except branch
    does — one restore failing mid-loop must neither skip the
    remaining restores nor raise out of a cosmetic helper."""
    import types

    from utc_cuip_kafka_aws_connector_spark.operators.dedup import (
        _free_checkpoint_blocks,
    )

    set_calls = []

    class _Logger:
        def __init__(self, lvl):
            self._l = lvl

        def getLevel(self):
            return self._l

    class _LogMgr:
        @staticmethod
        def getLogger(n):
            return _Logger(f"PREV[{n}]")

    class _Conf:
        @staticmethod
        def setLevel(n, lvl):
            # quieting (lvl == ERROR) always succeeds; the RESTORE of
            # rdd.ClassA (its prior level) raises
            if lvl == "PREV[rdd.ClassA]":
                raise RuntimeError("py4j hiccup restoring ClassA")
            set_calls.append((n, lvl))

    class _Level:
        ERROR = "ERROR"

    jvm = types.SimpleNamespace(
        org=types.SimpleNamespace(
            apache=types.SimpleNamespace(
                logging=types.SimpleNamespace(
                    log4j=types.SimpleNamespace(
                        LogManager=_LogMgr,
                        Level=_Level,
                        core=types.SimpleNamespace(
                            config=types.SimpleNamespace(Configurator=_Conf)
                        ),
                    )
                )
            )
        )
    )

    class _SC:
        _jvm = jvm

    class _Block:
        def __init__(self, name):
            self._name = name
            self.freed = 0

        def rdd(self):
            blk = self

            class _R:
                def getClass(self):
                    class _C:
                        def getName(_s):
                            return blk._name

                    return _C()

            return _R()

        def unpersist(self):
            self.freed += 1

    blocks = [_Block("rdd.ClassA"), _Block("rdd.ClassB")]
    _free_checkpoint_blocks(_SC(), blocks)  # must NOT raise
    assert [b.freed for b in blocks] == [1, 1]
    # ClassB's restore still happened despite ClassA's failing first
    # or second (dict order is not the contract — the guard is)
    assert ("rdd.ClassB", "PREV[rdd.ClassB]") in set_calls
