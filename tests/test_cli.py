"""CLI entry (reference R24 parity): ingest routes by topic family and
produces the golden lake layout."""

from __future__ import annotations

import json
import os

import pytest

from utc_cuip_kafka_aws_connector_spark.cli import run_ingest

VISION = [
    {"timestamp": 1610668800000, "camera_id": "cam-a",
     "locations": [{"x": 1.0, "y": 2.0, "label": "car"}]},
    {"timestamp": 1612137600000, "camera_id": "cam-b", "locations": [], "hit_counts": 0},
]


def test_ingest_vision_and_dead_letter(spark, tmp_path):
    src = tmp_path / "vision.jsonl"
    src.write_text("\n".join(json.dumps(m) for m in VISION))
    lake = str(tmp_path / "lake")

    assert run_ingest(spark, "cuip_vision_events", str(src), lake) == "vision"
    assert os.path.isdir(f"{lake}/camera_id=cam-a/year=2021/month=1")
    assert spark.read.parquet(lake).count() == 2

    assert run_ingest(spark, "totally_unknown", str(src), lake) == "dead_letter"
    assert spark.read.text(f"{lake}/dead_letter/totally_unknown").count() == 2


AIR = [
    {"timestamp": 1610668800000, "nicename": "mlk-central", "pm2_5": 5.0, "pm10": 9.0,
     "temperature": 21.0, "humidity": 40.0},
    {"timestamp": 1612137600000, "nicename": "mlk-douglas", "pm2_5": 7.5, "pm10": 11.0,
     "temperature": 19.5, "humidity": 44.0},
]

REFERENCE_TOPICS = [
    "cuip_vision_events",
    "MLK_CENTRAL_AIR_QUALITY",
    "MLK_DOUGLAS_AIR_QUALITY",
    "MLK_GEORGIA_AIR_QUALITY",
    "MLK_HOUSTON_AIR_QUALITY",
    "MLK_LINDSAY_AIR_QUALITY",
    "MLK_MAGNOLIA_AIR_QUALITY",
    "MLK_PEEPLES_AIR_QUALITY",
]


def test_ingest_config_all_topic_families(spark, tmp_path):
    """Reference main() parity (run.py:59-131): one invocation reads a
    reference-shaped config, ingests every topic with an input file,
    routes all three families, and quarantines unknowns."""
    from utc_cuip_kafka_aws_connector_spark.cli import run_ingest_config

    cfg = tmp_path / "config.yaml"
    topics = REFERENCE_TOPICS + ["mystery_topic"]
    cfg.write_text(
        "kafka:\n  - bootstrap-servers: \"broker:9092\"\n    group-id: \"g1\"\n    topics: ["
        + ", ".join(f'"{t}"' for t in topics)
        + "]\n"
    )
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    (incoming / "cuip_vision_events.jsonl").write_text(
        "\n".join(json.dumps(m) for m in VISION)
    )
    (incoming / "MLK_CENTRAL_AIR_QUALITY.jsonl").write_text(json.dumps(AIR[0]))
    (incoming / "MLK_DOUGLAS_AIR_QUALITY.jsonl").write_text(json.dumps(AIR[1]))
    (incoming / "mystery_topic.jsonl").write_text('{"x": 1}')
    lake = str(tmp_path / "lake")

    routes = run_ingest_config(spark, str(cfg), str(incoming), lake)
    assert routes == {
        "cuip_vision_events": "vision",
        "MLK_CENTRAL_AIR_QUALITY": "air",
        "MLK_DOUGLAS_AIR_QUALITY": "air",
        "mystery_topic": "dead_letter",
    }
    assert spark.read.parquet(f"{lake}/vision").count() == 2
    air_df = spark.read.parquet(f"{lake}/air_quality")
    assert air_df.count() == 2  # both air topics in ONE family write
    assert os.path.isdir(f"{lake}/air_quality/nicename=mlk-central/year=2021/month=1")
    assert os.path.isdir(f"{lake}/air_quality/nicename=mlk-douglas/year=2021/month=2")
    assert spark.read.text(f"{lake}/dead_letter/mystery_topic").count() == 1


def test_stream_subcommand_idempotent_layout(spark, tmp_path):
    """The CRON job as one command: availableNow drains the input into
    the epoch-keyed idempotent sink; a second run with the same
    checkpoint sees no new files and writes nothing new."""
    from utc_cuip_kafka_aws_connector_spark.cli import run_stream

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    (incoming / "a.jsonl").write_text("\n".join(json.dumps(m) for m in AIR))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    run_stream(spark, "MLK_CENTRAL_AIR_QUALITY", str(incoming), out, ckpt)
    got = spark.read.parquet(f"{out}/batch_id=*")
    assert got.count() == 2
    assert os.path.isdir(f"{out}/batch_id=0/nicename=mlk-central/year=2021/month=1")

    run_stream(spark, "MLK_CENTRAL_AIR_QUALITY", str(incoming), out, ckpt)
    assert spark.read.parquet(f"{out}/batch_id=*").count() == 2  # no duplicates


def test_dual_destination_write_mirrors(spark, tmp_path):
    """Reference dual-bucket flush (df_manager.py:82-103): --backup-output
    produces an identical second lake."""
    src = tmp_path / "vision.jsonl"
    src.write_text("\n".join(json.dumps(m) for m in VISION))
    lake, backup = str(tmp_path / "lake"), str(tmp_path / "backup")

    assert run_ingest(spark, "cuip_vision_events", str(src), lake, backup_output=backup) == "vision"
    a = spark.read.parquet(lake)
    b = spark.read.parquet(backup)
    assert a.count() == b.count() == 2
    assert sorted(a.columns) == sorted(b.columns)
    assert os.path.isdir(f"{backup}/camera_id=cam-a/year=2021/month=1")


def test_cloud_committer_conf_contract():
    """The s3a:// write path's committer contract: magic committer +
    the cloud commit protocol bindings (jars are cluster-side; the
    keys are the documented deployment config)."""
    from utc_cuip_kafka_aws_connector_spark.sources.sinks import cloud_committer_conf

    conf = cloud_committer_conf()
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert conf["spark.hadoop.fs.s3a.committer.magic.enabled"] == "true"
    assert conf["spark.sql.sources.commitProtocolClass"].endswith("PathOutputCommitProtocol")
    assert conf["spark.sql.parquet.output.committer.class"].endswith("BindingParquetOutputCommitter")
    assert conf["spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a"].endswith("S3ACommitterFactory")


def test_compact_small_files(spark, tmp_path):
    """A fragmented lake (8 files per partition) compacts to ~1 file
    per partition with identical rows; stats report the fragmentation."""
    import glob

    from pyspark.sql import functions as F

    from utc_cuip_kafka_aws_connector_spark.sources.sinks import compact_small_files

    src, dest = str(tmp_path / "frag"), str(tmp_path / "compact")
    df = spark.range(4000).select(
        F.col("id"),
        (F.col("id") % 3).alias("bucket"),
        F.sha1(F.col("id").cast("string")).alias("payload"),
    )
    df.repartition(8).write.partitionBy("bucket").parquet(src)
    for b in range(3):
        assert len(glob.glob(f"{src}/bucket={b}/*.parquet")) == 8

    stats = compact_small_files(spark, src, dest, ["bucket"])
    srows = {r["leaf"]: r for r in stats.collect()}
    assert len(srows) == 3
    assert all(r["files_before"] == 8 and r["files_target"] == 1 for r in srows.values())

    for b in range(3):
        assert len(glob.glob(f"{dest}/bucket={b}/*.parquet")) == 1
    before = df.orderBy("id").collect()
    after = spark.read.parquet(dest).select("id", "bucket", "payload").orderBy("id").collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in before]


def test_cli_compact_end_to_end(spark, tmp_path, capsys):
    """`compact` subcommand: fragmented lake in, compacted lake +
    summary line out."""
    from pyspark.sql import functions as F

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src, dest = str(tmp_path / "frag"), str(tmp_path / "out")
    spark.range(900).select(
        F.col("id"), (F.col("id") % 2).alias("part")
    ).repartition(5).write.partitionBy("part").parquet(src)

    assert (
        cli.main(["compact", "--src", src, "--dest", dest, "--partition-cols", "part"]) == 0
    )
    out = capsys.readouterr().out
    assert "compacted 2 partitions" in out
    assert spark.read.parquet(dest).count() == 900


def test_cli_table_maintenance(spark, tmp_path, capsys):
    """`table --op optimize/vacuum/history` drives the txlog
    maintenance ops; vacuum/history run without a SparkSession."""
    from pyspark.sql import functions as F

    import utc_cuip_kafka_aws_connector_spark.cli as cli
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import read_snapshot, txn_append

    t = str(tmp_path / "tx")
    for i in range(4):
        txn_append(
            spark.range(i * 10, i * 10 + 10).select(F.col("id")).coalesce(1),
            t,
            txn_id=f"b{i}",
        )
    assert cli.main(["table", "--path", t, "--op", "optimize"]) == 0
    assert cli.main(["table", "--path", t, "--op", "vacuum", "--min-age-hours", "0"]) == 0
    assert cli.main(["table", "--path", t, "--op", "history"]) == 0
    out = capsys.readouterr().out
    assert "optimized" in out and "vacuumed" in out and "[checkpoint]" in out
    assert read_snapshot(spark, t).count() == 40


def test_cli_curate_matches_catalog_pipeline(spark, tmp_path, capsys):
    """`curate` runs the q99 pipeline over an arbitrary parquet input;
    with the same thresholds/rates the surviving doc_id set must equal
    q99's catalog result exactly."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli
    from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG

    out_dir = str(tmp_path / "curated")
    rc = cli.main(
        [
            "curate",
            "--input",
            "/root/testdata/sf0.001/documents.parquet",
            "--output",
            out_dir,
            "--keep-rates",
            "en=1.0,de=0.5",
            "--default-rate",
            "0.2",
        ]
    )
    assert rc == 0
    assert "survived" in capsys.readouterr().out
    got = {r["doc_id"] for r in spark.read.parquet(out_dir).select("doc_id").collect()}
    want = {
        r["doc_id"]
        for r in CATALOG["q99_curation_pipeline"]
        .builder(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert got == want and got


def test_cli_curate_sf01_end_to_end_golden(spark, tmp_path):
    """Scale-stress the composed curation path (the reference's
    whole-pipeline CRON expectation, README.md:35) at sf0.1 -- 5000
    docs through quality gate -> exact dedup -> stratified mixture --
    pinned to golden row count AND an order-insensitive content hash.
    Everything in the pipeline is deterministic by design (content
    -hash sampling, min-id dedup), so any drift in the survivor SET
    or survivor TEXTS is a real regression, not noise."""
    from pyspark.sql import functions as F

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    out_dir = str(tmp_path / "curated_sf01")
    res = cli.run_curate(
        spark,
        "/root/testdata/sf0.1/documents.parquet",
        out_dir,
        keep_rates="en=1.0,de=0.5",
        default_rate=0.2,
    )
    assert res == {"read": 5000, "survived": 2485}

    df = spark.read.parquet(out_dir)
    content_hash = (
        df.select(
            F.sha2(
                F.concat_ws("|", F.col("doc_id").cast("string"), F.md5("text")), 256
            ).alias("h")
        )
        .agg(F.sha2(F.concat_ws("", F.sort_array(F.collect_list("h"))), 256).alias("hh"))
        .collect()[0]["hh"]
    )
    assert content_hash == "9a9bcadf3fd5cb9fd0de123d2e6c7447e1355cf80f8cff2c9a012165faf971aa"
    assert df.agg(F.sum("doc_id")).collect()[0][0] == 6220929


def test_cli_simjoin_end_to_end(spark, tmp_path, capsys):
    """`simjoin` finds planted near-duplicate pairs (and only those)
    through the full CLI path."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [(0, base), (1, base + " extra"), (2, "wholly different words here now")]
    src, dest = str(tmp_path / "docs"), str(tmp_path / "pairs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(src)
    assert (
        cli.main(
            ["simjoin", "--input", src, "--output", dest, "--threshold", "0.5"]
        )
        == 0
    )
    pairs = spark.read.parquet(dest).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]
    assert "1 pairs at J>=0.5" in capsys.readouterr().out


def test_cli_retrieve_end_to_end(spark, tmp_path, capsys):
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "spark joins tables"), (1, "spark spark spark"), (2, "other text")],
        "doc_id long, text string",
    ).write.parquet(src)
    assert cli.main(["retrieve", "--input", src, "--query", "spark", "--k", "2"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    # line format is "rnk  doc_id  score": field 0 is the rank (always
    # 1 on the first line); field 1 is the doc id — doc 1 ("spark
    # spark spark") must take rank 1 on tf.
    assert out[0].split()[:2] == ["1", "1"]
    assert out[1].split()[:2] == ["2", "0"]


def test_cli_layout_end_to_end(spark, tmp_path, capsys):
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src, dest = str(tmp_path / "in"), str(tmp_path / "out")
    spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    ).write.parquet(src)
    for curve in ("z", "hilbert"):
        assert (
            cli.main(
                ["layout", "--input", src, "--output", dest + curve,
                 "--x-col", "x", "--y-col", "y", "--curve", curve, "--bits", "4"]
            )
            == 0
        )
        back = spark.read.parquet(dest + curve)
        assert back.count() == 256
        assert set(back.columns) == {"x", "y"}  # curve key dropped
    assert "hilbert curve" in capsys.readouterr().out


def test_cli_classify_end_to_end(spark, tmp_path, capsys):
    """`classify` trains on labeled docs and both predicts and emits
    the log-odds filter table through the full CLI path."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    train = [(i, "clean prose sentence words " * 3, "keep") for i in range(20)] + [
        (i + 20, "junk spam garbled noise " * 3, "drop") for i in range(20)
    ]
    score = [(100, "clean prose sentence words indeed"), (101, "junk spam garbled mess")]
    tr, src = str(tmp_path / "train"), str(tmp_path / "score")
    spark.createDataFrame(train, "doc_id long, text string, lang string").write.parquet(tr)
    spark.createDataFrame(score, "doc_id long, text string").write.parquet(src)

    pred = str(tmp_path / "pred")
    assert (
        cli.main(["classify", "--train", tr, "--input", src, "--output", pred]) == 0
    )
    got = {r.doc_id: r.predicted for r in spark.read.parquet(pred).collect()}
    assert got == {100: "keep", 101: "drop"}
    assert "trained on 40 docs" in capsys.readouterr().out

    odds = str(tmp_path / "odds")
    assert (
        cli.main(
            ["classify", "--train", tr, "--input", src, "--output", odds,
             "--keep-label", "keep"]
        )
        == 0
    )
    o = {r.doc_id: r.log_odds for r in spark.read.parquet(odds).collect()}
    assert o[100] > 0 > o[101]
    assert "log-odds vs 'keep'" in capsys.readouterr().out


def test_cli_hotkeys_end_to_end(spark, tmp_path, capsys):
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "rows")
    rows = [("hot",)] * 900 + [(f"u{i}",) for i in range(100)]
    spark.createDataFrame(rows, "k string").write.parquet(src)
    assert (
        cli.main(
            ["hotkeys", "--input", src, "--column", "k",
             "--k", "8", "--rows-per-task", "300"]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "         900  hot" in out
    assert "suggested salt buckets: 3" in out


def test_cli_report_end_to_end(spark, tmp_path, capsys):
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "hello world text", "en"), (1, "hello world text", "en"), (2, "mas texto aqui", "es")],
        "doc_id long, text string, lang string",
    ).write.parquet(src)
    assert cli.main(["report", "--input", src]) == 0
    out = capsys.readouterr().out
    assert "rows" in out and "3.0000" in out
    assert "exact_dup_ratio" in out and "0.3333" in out
    assert "lang:en" in out and "0.6667" in out


def test_cli_normalize_end_to_end(spark, tmp_path, capsys):
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src, dest = str(tmp_path / "in"), str(tmp_path / "out")
    lig = "ﬁ"  # 'fi' ligature -> NFKC folds to "fi"
    spark.createDataFrame(
        [(0, f"{lig}le   One")], "doc_id long, text string"
    ).write.parquet(src)
    assert (
        cli.main(["normalize", "--input", src, "--output", dest, "--lower"]) == 0
    )
    (r,) = spark.read.parquet(dest).collect()
    assert r.text == "file one"
    assert "normalized 1 docs (NFKC, lower)" in capsys.readouterr().out


def test_cli_ann_build_and_search(spark, tmp_path, capsys):
    """End-to-end CLI: build a PCA->IVF->PQ index from parquet, then
    search it — the user-facing composition of the round-8 ANN stack."""
    import numpy as np

    from utc_cuip_kafka_aws_connector_spark.cli import main

    rng = np.random.RandomState(3)
    rows = [
        (i, [float(v) for v in rng.randn(8) + (i % 4) * 5.0])
        for i in range(200)
    ]
    src = str(tmp_path / "emb")
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").write.parquet(src)
    idx = str(tmp_path / "idx")
    assert (
        main(
            [
                "ann", "--op", "build", "--path", idx, "--input", src,
                "--cells", "4", "--m", "4", "--nbits", "5",
            ]
        )
        or 0
    ) == 0
    capsys.readouterr()
    q = ",".join(str(v) for v in rows[0][1])
    assert (
        main(["ann", "--op", "search", "--path", idx, "--query", q,
              "--k", "5", "--nprobe", "4"])
        or 0
    ) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 5
    assert out[0].split()[0] == "0"  # the query IS row 0: exact self-match first


def test_cli_clean_end_to_end(spark, tmp_path, capsys):
    """clean = extract -> boilerplate -> substring dedup as one verb."""
    from utc_cuip_kafka_aws_connector_spark.cli import main

    para = " ".join(f"quoted{i}" for i in range(40))
    rows = [
        (
            i,
            f"<p>body {i} words here</p><div>Site Footer Banner 2024</div>"
            + (f"<p>{para}</p>" if i in (3, 7) else ""),
        )
        for i in range(30)
    ]
    src = str(tmp_path / "raw")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "clean")
    rc = main(
        [
            "clean", "--input", src, "--output", out, "--html",
            "--boiler-min-docs", "15", "--substr-window", "30",
        ]
    ) or 0
    assert rc == 0
    got = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    assert len(got) == 30
    assert all("<p>" not in t and "Site Footer" not in t for t in got.values())
    assert "quoted0" in got[3] and "quoted0" not in got[7]  # canonical kept once
    assert "body 5 words here" in got[5]


def test_cli_clean_with_rules_and_domain_cap(spark, tmp_path, capsys):
    from utc_cuip_kafka_aws_connector_spark.cli import main

    prose = (
        "This is a normal document with enough words in every line to pass.\n"
        "It has several sentences and the usual stop words that prose has.\n"
        "All of the lines end with terminal punctuation as they should.\n"
        "A final sentence adds the extra words that the word count rule "
        "needs to clear its minimum bound of fifty with a little room."
    )
    rows = []
    for i in range(30):
        # 25 good docs spread over domains; doc i<20 on big.com
        url = f"https://big.com/p{i}?utm_source=x" if i < 20 else f"https://s{i}.org/a"
        rows.append((i, prose + f"\nUnique closing line number {i} is here.", url))
    rows.append((98, "too short", "https://big.com/short"))
    src = str(tmp_path / "raw")
    spark.createDataFrame(rows, "doc_id long, text string, url string").write.parquet(src)
    out = str(tmp_path / "clean")
    rc = main(
        [
            "clean", "--input", src, "--output", out,
            "--boiler-min-docs", "40", "--substr-window", "0",
            "--gopher", "--c4", "--url-col", "url", "--max-per-domain", "5",
        ]
    ) or 0
    assert rc == 0
    got = spark.read.parquet(out)
    rows_out = got.collect()
    ids = {r.doc_id for r in rows_out}
    assert 98 not in ids                       # gopher word count
    assert len([i for i in ids if i < 20]) == 5  # domain cap on big.com
    assert len([i for i in ids if 20 <= i < 30]) == 10
    assert all("utm_source" not in r.url for r in rows_out)  # normalized


def test_cli_curate_full_funnel_and_split(spark, tmp_path, capsys):
    """curate-full (curate_v4, the r10/r11 briefs' composition gap):
    every stage shrinks-or-holds the corpus, planted near-dups die at
    the near-dedup stage, the decontaminated doc disappears, the
    split column lands leakage-safely (near-dup components share a
    split), and the funnel report prints."""
    import random

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    rng = random.Random(5)

    def doc(seed, n=40):
        r = random.Random(seed)
        return " ".join(
            r.choice(["the", "a", "of", "and", "to", "in", "is", "it"])
            if i % 3 == 0
            else f"word{r.randrange(500)}"
            for i in range(n)
        )

    rows = [(i, doc(i), "en") for i in range(60)]
    rows += [(100 + i, doc(i), "en") for i in range(5)]  # exact dups of 0..4
    near = doc(7).split()
    near[3] = "edited"
    rows += [(200, " ".join(near), "en")]  # near-dup of 7
    rows += [(300, "tiny", "en")]  # fails quality
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.parquet(inp)
    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(0, doc(13))], "doc_id long, text string"
    ).write.parquet(bench)  # doc 13 is contaminated verbatim

    out = str(tmp_path / "built")
    rc = cli.main(
        [
            "curate-full",
            "--input", inp,
            "--output", out,
            "--boiler-min-docs", "1000",  # keep text intact for this corpus
            "--near-dup-threshold", "0.7",
            "--decontam", bench,
            "--decontam-threshold", "0.5",
            "--keep-rates", "en=1.0",
            "--split", "train=0.75,val=0.125,test=0.125",
            "--seed", "3",
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "curate-full" in printed and "near_dedup" in printed

    got = spark.read.parquet(out)
    ids = {r.doc_id for r in got.select("doc_id").collect()}
    assert 300 not in ids                       # quality gate
    assert not ids & {100, 101, 102, 103, 104}  # exact dups (min id kept)
    assert 200 not in ids and 7 in ids          # near-dup loses to 7
    assert 13 not in ids                        # decontaminated
    assert "split" in got.columns
    sp = {r.doc_id: r.split for r in got.collect()}
    assert set(sp.values()) <= {"train", "val", "test"}


def test_cli_tokenizer_lifecycle_both_shapes(spark, tmp_path, capsys):
    """tokenizer train -> encode -> report, plain and byte-level: the
    byte-level model reports structurally-zero OOV and its encode
    output decodes back to the exact text."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli
    from utc_cuip_kafka_aws_connector_spark.operators.bytelevel import (
        decode_byte_ids,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
        load_tokenizer_spec,
    )

    inp = "/root/testdata/sf0.001/documents.parquet"
    for flag, name in [([], "plain"), (["--byte-level"], "byte")]:
        model = str(tmp_path / f"{name}.json")
        ids_out = str(tmp_path / f"{name}_ids")
        assert cli.main(
            ["tokenizer", "--op", "train", "--model", model,
             "--input", inp, "--merges", "12"] + flag
        ) == 0
        assert "trained" in capsys.readouterr().out
        assert cli.main(
            ["tokenizer", "--op", "encode", "--model", model,
             "--input", inp, "--output", ids_out]
        ) == 0
        assert "encoded" in capsys.readouterr().out
        assert cli.main(
            ["tokenizer", "--op", "report", "--model", model, "--input", inp]
        ) == 0
        report = capsys.readouterr().out
        assert "chars/token" in report
        if name == "byte":
            assert "oov=0.0000" in report  # byte coverage is total
            spec = load_tokenizer_spec(spark, model)
            row = spark.read.parquet(ids_out).orderBy("doc_id").first()
            text = (
                spark.read.parquet(inp)
                .filter(f"doc_id = {row.doc_id}")
                .first()
                .text
            )
            assert decode_byte_ids(row.token_ids, spec.vocab) == text


def test_cli_lm_train_and_score(spark, tmp_path, capsys):
    """lm train -> score --buckets 3: scores land in parquet with
    the expected schema and the buckets are equal-population."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    inp = "/root/testdata/sf0.001/documents.parquet"
    model = str(tmp_path / "kn_lm")
    out = str(tmp_path / "scored")
    assert cli.main(
        ["lm", "--op", "train", "--model", model, "--input", inp,
         "--order", "2", "--min-count", "2"]
    ) == 0
    assert "trained KN order-2" in capsys.readouterr().out
    assert cli.main(
        ["lm", "--op", "score", "--model", model, "--input", inp,
         "--output", out, "--buckets", "3"]
    ) == 0
    assert "scored" in capsys.readouterr().out
    scored = spark.read.parquet(out)
    n_docs = spark.read.parquet(inp).count()
    assert scored.count() == n_docs
    assert {"doc_id", "n_tokens", "log10_prob", "ppl", "bucket"} <= set(
        scored.columns
    )
    from pyspark.sql import functions as F

    sizes = [
        r["c"]
        for r in scored.groupBy("bucket")
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    assert len(sizes) == 3
    assert max(sizes) - min(sizes) <= 1


def test_cli_lm_score_buckets_method_approx(spark, tmp_path, capsys):
    """lm score --buckets 3 --buckets-method approx: the corpus-scale
    bucketing path (approxQuantile thresholds, no global sort) is
    reachable end-to-end from the CLI — VERDICT r15 flagged the
    operator as half-shipped while only the exact path had a call
    site. At this corpus size and the operator's default rel_err the
    approx cuts are tight, so the bucket assignment must agree with
    the exact run away from boundary ties."""
    from pyspark.sql import functions as F

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    inp = "/root/testdata/sf0.001/documents.parquet"
    model = str(tmp_path / "kn_lm")
    out_exact = str(tmp_path / "scored_exact")
    out_approx = str(tmp_path / "scored_approx")
    assert cli.main(
        ["lm", "--op", "train", "--model", model, "--input", inp,
         "--order", "2", "--min-count", "2"]
    ) == 0
    assert cli.main(
        ["lm", "--op", "score", "--model", model, "--input", inp,
         "--output", out_exact, "--buckets", "3"]
    ) == 0
    assert cli.main(
        ["lm", "--op", "score", "--model", model, "--input", inp,
         "--output", out_approx, "--buckets", "3",
         "--buckets-method", "approx"]
    ) == 0
    capsys.readouterr()
    approx = spark.read.parquet(out_approx)
    n_docs = spark.read.parquet(inp).count()
    assert approx.count() == n_docs
    labels = {r.bucket for r in approx.select("bucket").distinct().collect()}
    assert labels <= {1, 2, 3} and len(labels) == 3
    joined = (
        spark.read.parquet(out_exact)
        .select("doc_id", F.col("bucket").alias("b_exact"))
        .join(approx.select("doc_id", F.col("bucket").alias("b_approx")),
              "doc_id")
    )
    n_disagree = joined.where("b_exact <> b_approx").count()
    # disagreements can only come from documents within rel_err of a
    # quantile cut (plus exact's id tie-break); a handful at most here
    assert n_disagree <= max(3, n_docs // 100), n_disagree


def test_cli_report_ppl_buckets_method_approx(spark, tmp_path, capsys):
    """report --ppl-lm --ppl-buckets-method approx: the data card's
    CCNet cut rows come out of the approx path too (same row names;
    cuts are approximate quantiles instead of exact ones)."""
    import random

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    def doc(seed, n=20):
        r = random.Random(seed)
        return " ".join(
            r.choice(["the", "cat", "dog", "sat", "tree", "fish"])
            for _ in range(n)
        )

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, doc(i), "en") for i in range(25)],
        "doc_id long, text string, lang string",
    ).write.parquet(src)
    lm_dir = str(tmp_path / "lm")
    assert cli.main(
        ["lm", "--op", "train", "--model", lm_dir, "--input", src,
         "--order", "2"]
    ) == 0
    capsys.readouterr()
    assert cli.main(
        ["report", "--input", src, "--ppl-lm", lm_dir,
         "--ppl-buckets-method", "approx"]
    ) == 0
    out = capsys.readouterr().out
    for row in ("ppl_mean", "ppl_bucket_cut:1", "ppl_bucket_cut:2", "ppl_max"):
        assert row in out, f"{row} missing from card:\n{out}"


def test_cli_select_dsir(spark, tmp_path, capsys):
    """select: a target sample drawn from one source slice pulls the
    selection toward that slice (and --weights-only writes weights
    for every raw doc)."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    inp = "/root/testdata/sf0.001/documents.parquet"
    target = str(tmp_path / "target")
    out = str(tmp_path / "selected")
    wout = str(tmp_path / "weights")
    docs = spark.read.parquet(inp)
    docs.where("doc_id % 5 = 0").limit(80).write.parquet(target)
    assert cli.main(
        ["select", "--target", target, "--input", inp, "--output", out,
         "--k", "25", "--n-buckets", "512", "--seed", "3"]
    ) == 0
    assert "selected 25/" in capsys.readouterr().out
    sel = spark.read.parquet(out)
    assert sel.count() == 25
    assert {"doc_id", "log_weight", "gumbel_key"} <= set(sel.columns)
    assert cli.main(
        ["select", "--target", target, "--input", inp, "--output", wout,
         "--n-buckets", "512", "--weights-only"]
    ) == 0
    assert spark.read.parquet(wout).count() == docs.count()


def test_cli_curate_full_perplexity_stage(spark, tmp_path, capsys):
    """curate-full --ppl-lm: the CCNet stage — an off-domain junk
    document dies at the perplexity cut while in-domain docs (drawn
    from the same distribution as the LM's training sample) survive;
    the funnel reports the stage; mutually-exclusive knobs error."""
    import random

    import pytest as _pytest

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    def doc(seed, n=30):
        r = random.Random(seed)
        return " ".join(
            r.choice(
                ["the", "cat", "dog", "sat", "ran", "house", "tree",
                 "bird", "fish", "sky"]
            )
            for _ in range(n)
        )

    rows = [(i, doc(i), "en") for i in range(40)]
    rows += [(900, "zxqv jkwp mmfr tttb " * 8, "en")]  # off-domain junk
    inp = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(inp)

    ref = str(tmp_path / "ref")
    spark.createDataFrame(
        [(doc(1000 + i),) for i in range(40)], "text string"
    ).write.parquet(ref)
    lm_dir = str(tmp_path / "lm")
    assert cli.main(
        ["lm", "--op", "train", "--model", lm_dir, "--input", ref,
         "--order", "2", "--min-count", "2"]
    ) == 0
    capsys.readouterr()

    out = str(tmp_path / "built")
    rc = cli.main(
        [
            "curate-full",
            "--input", inp,
            "--output", out,
            "--boiler-min-docs", "1000",
            "--min-quality", "0.0",
            "--ppl-lm", lm_dir,
            "--ppl-quantile", "0.9",
            "--near-dup-threshold", "-1",
            "--keep-rates", "en=1.0",
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "perplexity" in printed
    ids = {
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert 900 not in ids              # junk lands above the cut
    assert len(ids & set(range(40))) >= 30

    from utc_cuip_kafka_aws_connector_spark.cli import run_curate_full

    with _pytest.raises(ValueError, match="exactly one"):
        run_curate_full(
            spark, inp, str(tmp_path / "x"), ppl_lm=lm_dir,
            near_dup_threshold=None,
        )

    # ADVICE r12: an earlier stage that kills every document must
    # produce a descriptive funnel error at the ppl-quantile stage,
    # not an IndexError out of approxQuantile's empty [] result
    with _pytest.raises(ValueError, match="empty frame"):
        run_curate_full(
            spark, inp, str(tmp_path / "x2"), ppl_lm=lm_dir,
            ppl_quantile=0.9, min_quality=1e9,
            near_dup_threshold=None, boiler_min_docs=1000,
        )


def test_cli_curate_full_semantic_decontam(spark, tmp_path, capsys):
    """curate-full --decontam-embeddings: a corpus doc whose
    embedding duplicates an eval item dies at the semantic stage
    even though its TEXT shares no n-grams with anything."""
    import random

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    rng = random.Random(11)

    def vec(r):
        return [r.uniform(-1, 1) for _ in range(8)]

    def doc(seed, n=25):
        r = random.Random(seed)
        return " ".join(f"tok{r.randrange(300)}" for _ in range(n))

    evec = vec(random.Random(999))
    rows = [(i, doc(i), "en", vec(random.Random(i))) for i in range(30)]
    rows.append((700, doc(700), "en", list(evec)))  # embedding leak
    inp = str(tmp_path / "docs")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, embedding array<double>",
    ).write.parquet(inp)
    ev = str(tmp_path / "eval_emb")
    spark.createDataFrame(
        [(0, list(evec))], "vec_id long, embedding array<double>"
    ).write.parquet(ev)

    out = str(tmp_path / "built")
    rc = cli.main(
        [
            "curate-full",
            "--input", inp,
            "--output", out,
            "--boiler-min-docs", "1000",
            "--min-quality", "0.0",
            "--near-dup-threshold", "-1",
            "--decontam-embeddings", ev,
            "--decontam-cosine", "0.999",
            "--keep-rates", "en=1.0",
        ]
    )
    assert rc == 0
    assert "semantic_decontam" in capsys.readouterr().out
    ids = {
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert 700 not in ids
    assert len(ids) == 30


def test_cli_lm_merge(spark, tmp_path, capsys):
    """lm --op merge: two saved batch LMs fold into one that scores
    exactly like training on the union corpus."""
    import pytest as _pytest

    import utc_cuip_kafka_aws_connector_spark.cli as cli
    from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
        kn_score,
        kn_train,
        load_kn_lm,
    )

    texts = [
        "the cat sat on the mat",
        "a dog chased the cat",
        "the fish swam in the sea",
        "cats and dogs live here",
    ]
    a_dir, b_dir = str(tmp_path / "in_a"), str(tmp_path / "in_b")
    spark.createDataFrame(
        [(t,) for t in texts[:2]], "text string"
    ).write.parquet(a_dir)
    spark.createDataFrame(
        [(t,) for t in texts[2:]], "text string"
    ).write.parquet(b_dir)
    lm_a, lm_b = str(tmp_path / "lm_a"), str(tmp_path / "lm_b")
    for src, dst in ((a_dir, lm_a), (b_dir, lm_b)):
        assert cli.main(
            ["lm", "--op", "train", "--model", dst, "--input", src,
             "--order", "2"]
        ) == 0
    capsys.readouterr()
    merged_dir = str(tmp_path / "lm_merged")
    assert cli.main(
        ["lm", "--op", "merge", "--model", merged_dir,
         "--input", f"{lm_a},{lm_b}"]
    ) == 0
    assert "merged 2 LMs" in capsys.readouterr().out

    whole = spark.createDataFrame(
        [(t,) for t in texts], "text string"
    )
    probe = spark.createDataFrame(
        [("p1", "the cat swam here"), ("p2", "dogs sat on the sea")],
        "doc_id string, text string",
    )
    direct = kn_train(whole, order=2)
    merged = load_kn_lm(spark, merged_dir)
    a = {
        r["doc_id"]: r["log10_prob"]
        for r in kn_score(probe, merged).collect()
    }
    b = {
        r["doc_id"]: r["log10_prob"]
        for r in kn_score(probe, direct).collect()
    }
    for d in b:
        assert a[d] == _pytest.approx(b[d], rel=1e-12), d


def test_cli_pack_pipeline(spark, tmp_path, capsys):
    """tokenizer encode -> pack: the full tokenize-and-pack chain as
    two commands; packed rows are exact-window and lossless."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    inp = "/root/testdata/sf0.001/documents.parquet"
    model = str(tmp_path / "tok.json")
    ids = str(tmp_path / "ids")
    packed = str(tmp_path / "packed")
    assert cli.main(
        ["tokenizer", "--op", "train", "--model", model, "--input", inp,
         "--merges", "8"]
    ) == 0
    assert cli.main(
        ["tokenizer", "--op", "encode", "--model", model, "--input", inp,
         "--output", ids]
    ) == 0
    capsys.readouterr()
    assert cli.main(
        ["pack", "--input", ids, "--output", packed,
         "--context-len", "256", "--pad-id", "0"]
    ) == 0
    out = capsys.readouterr().out
    assert "packed" in out and "fill" in out
    rows = spark.read.parquet(packed)
    from pyspark.sql import functions as F

    assert rows.where(F.size("input_ids") != 256).count() == 0
    n_in = (
        spark.read.parquet(ids)
        .agg(F.sum(F.size("token_ids")))
        .collect()[0][0]
    )
    n_packed = rows.agg(F.sum("n_tokens")).collect()[0][0]
    n_trunc = rows.where("truncated").count()
    if n_trunc == 0:
        assert n_packed == n_in
    else:
        assert n_packed < n_in


def test_cli_curate_full_dsir_preselect(spark, tmp_path, capsys):
    """curate-full --select-target: the DSIR stage shrinks the pool
    to --select-k rows, biased toward the target domain, before the
    rest of the funnel runs."""
    import random

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    def doc(seed, words, n=25):
        r = random.Random(seed)
        return " ".join(r.choice(words) for _ in range(n))

    A = ["cat", "dog", "fish", "bird", "tree", "house", "sat", "the"]
    B = ["stock", "bond", "yield", "market", "index", "fund", "rate"]
    rows = [(i, doc(i, A), "en") for i in range(40)]
    rows += [(100 + i, doc(500 + i, B), "en") for i in range(40)]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(inp)
    target = str(tmp_path / "target")
    spark.createDataFrame(
        [(doc(900 + i, A),) for i in range(20)], "text string"
    ).write.parquet(target)

    out = str(tmp_path / "built")
    rc = cli.main(
        [
            "curate-full",
            "--input", inp,
            "--output", out,
            "--select-target", target,
            "--select-k", "30",
            "--select-buckets", "512",
            "--boiler-min-docs", "1000",
            "--min-quality", "0.0",
            "--near-dup-threshold", "-1",
            "--keep-rates", "en=1.0",
            "--seed", "2",
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "dsir_select:30" in printed
    ids = {
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    }
    n_domain_a = len([i for i in ids if i < 100])
    assert n_domain_a > len(ids) * 0.7  # selection leans to the target

    import pytest as _pytest

    from utc_cuip_kafka_aws_connector_spark.cli import run_curate_full

    with _pytest.raises(ValueError, match="select_k"):
        run_curate_full(
            spark, inp, str(tmp_path / "x"),
            select_target=target, near_dup_threshold=None,
        )


def test_cli_pack_empty_input(spark, tmp_path, capsys):
    """pack on an empty ids table succeeds with a zero-row report
    instead of crashing on null aggregates."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    inp = str(tmp_path / "empty_ids")
    spark.createDataFrame(
        [], "doc_id long, token_ids array<int>"
    ).write.parquet(inp)
    out = str(tmp_path / "packed")
    assert cli.main(
        ["pack", "--input", inp, "--output", out, "--context-len", "16"]
    ) == 0
    assert "packed 0 rows" in capsys.readouterr().out


def test_cli_curate_full_moore_lewis_preselect(spark, tmp_path, capsys):
    """curate-full --select-method moore-lewis: the CE-difference
    stage keeps exactly --select-k rows and, on a planted
    in-domain/off-domain corpus, picks the in-domain ones (the
    deterministic alternative to DSIR's seeded resample)."""
    import random

    import pytest as _pytest

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    def doc(seed, words, n=25):
        r = random.Random(seed)
        return " ".join(r.choice(words) for _ in range(n))

    A = ["cat", "dog", "fish", "bird", "tree", "house", "sat", "the"]
    B = ["stock", "bond", "yield", "market", "index", "fund", "rate"]
    rows = [(i, doc(i, A), "en") for i in range(40)]
    rows += [(100 + i, doc(500 + i, B), "en") for i in range(40)]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(inp)
    target = str(tmp_path / "target")
    spark.createDataFrame(
        [(doc(900 + i, A),) for i in range(20)], "text string"
    ).write.parquet(target)

    out = str(tmp_path / "built_ml")
    rc = cli.main(
        [
            "curate-full",
            "--input", inp,
            "--output", out,
            "--select-target", target,
            "--select-k", "30",
            "--select-method", "moore-lewis",
            "--boiler-min-docs", "1000",
            "--min-quality", "0.0",
            "--near-dup-threshold", "-1",
            "--keep-rates", "en=1.0",
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "moore_lewis_select:30" in printed
    ids = {
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    }
    # CE-difference is sharper than DSIR's stochastic resample: every
    # survivor should come from the in-domain half
    assert len(ids) == 30
    assert all(i < 100 for i in ids), sorted(ids)

    from utc_cuip_kafka_aws_connector_spark.cli import run_curate_full

    with _pytest.raises(ValueError, match="select_method"):
        run_curate_full(
            spark, inp, str(tmp_path / "x3"),
            select_target=target, select_k=5,
            select_method="nope", near_dup_threshold=None,
        )


def test_stream_curate_replay_and_cross_batch_dedup(spark, tmp_path, capsys):
    """stream-curate (the r12 VERDICT stretch): one foreachBatch
    consumer running rule filter + exact dedup (within AND across
    batches) + monitors, exactly-once under re-runs. Batch 2 carries
    a duplicate of a batch-1 document: it must die at the cross-batch
    anti-join; re-running with the same checkpoint writes nothing."""
    import glob
    import json

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    good = "the quick brown fox jumps over the lazy dog and runs far " * 3
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    (incoming / "b1.jsonl").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"doc_id": 1, "text": good + "one", "lang": "en"},
                {"doc_id": 2, "text": good + "one", "lang": "en"},  # in-batch dup
                {"doc_id": 3, "text": "zx qq", "lang": "en"},       # fails quality
                {"doc_id": 4, "text": good + "four", "lang": "en"},
            ]
        )
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    rc = cli.main(
        [
            "stream-curate",
            "--input", str(incoming),
            "--output", out,
            "--checkpoint", ckpt,
            "--min-quality", "0.5",
            "--hot-key-col", "lang",
        ]
    )
    assert rc == 0
    capsys.readouterr()
    got = spark.read.option("basePath", f"{out}/data").parquet(
        f"{out}/data/batch_id=*"
    )
    assert sorted(r.doc_id for r in got.collect()) == [1, 4]
    hot = spark.read.parquet(f"{out}/_monitor/hotkeys/batch_id=*")
    assert {(r["lang"], r["n"]) for r in hot.collect()} == {("en", 2)}

    # batch 2: one cross-batch duplicate (same text as doc 1), one new
    (incoming / "b2.jsonl").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"doc_id": 10, "text": good + "one", "lang": "en"},  # x-batch dup
                {"doc_id": 11, "text": good + "eleven", "lang": "de"},
            ]
        )
    )
    assert cli.main(
        [
            "stream-curate",
            "--input", str(incoming),
            "--output", out,
            "--checkpoint", ckpt,
            "--min-quality", "0.5",
            "--hot-key-col", "lang",
        ]
    ) == 0
    capsys.readouterr()
    got = spark.read.option("basePath", f"{out}/data").parquet(
        f"{out}/data/batch_id=*"
    )
    assert sorted(r.doc_id for r in got.collect()) == [1, 4, 11]

    # replay: same checkpoint, no new input -> nothing changes
    n_dirs = len(glob.glob(f"{out}/data/batch_id=*"))
    assert cli.main(
        [
            "stream-curate",
            "--input", str(incoming),
            "--output", out,
            "--checkpoint", ckpt,
        ]
    ) == 0
    capsys.readouterr()
    assert len(glob.glob(f"{out}/data/batch_id=*")) == n_dirs
    got = spark.read.option("basePath", f"{out}/data").parquet(
        f"{out}/data/batch_id=*"
    )
    assert sorted(r.doc_id for r in got.collect()) == [1, 4, 11]


def test_stream_curate_seen_hash_compaction(spark, tmp_path, capsys):
    """r14 state maintenance (VERDICT r13 What's-wrong #2): with
    --compact-every 2 the cross-batch hash state stays bounded — one
    committed snapshot + at most 2 raw dirs — while the kept-set is
    IDENTICAL to an uncompacted run at every step, cross-batch dups
    still die after their origin dir was compacted away, a torn
    snapshot (no _SUCCESS) is invisible, and replay writes nothing."""
    import glob
    import json
    import os
    import shutil

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    good = "the quick brown fox jumps over the lazy dog and runs far " * 3
    incoming = tmp_path / "inc"
    incoming.mkdir()
    batches = [
        [{"doc_id": 1, "text": good + "one", "lang": "en"}],
        [{"doc_id": 2, "text": good + "two", "lang": "en"}],
        [{"doc_id": 3, "text": good + "three", "lang": "en"}],
        # epoch 3 arrives AFTER the epoch-2 compaction consolidated
        # batches 0-1: the dup of doc 1 must die against the snapshot
        [
            {"doc_id": 4, "text": good + "one", "lang": "en"},
            {"doc_id": 5, "text": good + "five", "lang": "en"},
        ],
        [{"doc_id": 6, "text": good + "two", "lang": "en"}],  # dup of doc 2
    ]

    outs = {"c": str(tmp_path / "out_c"), "u": str(tmp_path / "out_u")}
    ckpts = {"c": str(tmp_path / "ck_c"), "u": str(tmp_path / "ck_u")}

    def kept(out):
        dirs = glob.glob(f"{out}/data/batch_id=*")
        if not dirs:
            return []
        df = spark.read.option("basePath", f"{out}/data").parquet(
            f"{out}/data/batch_id=*"
        )
        return sorted(r.doc_id for r in df.collect())

    for i, rows in enumerate(batches):
        (incoming / f"b{i}.jsonl").write_text(
            "\n".join(json.dumps(d) for d in rows)
        )
        for mode, every in (("c", "2"), ("u", "0")):
            assert cli.main(
                [
                    "stream-curate",
                    "--input", str(incoming),
                    "--output", outs[mode],
                    "--checkpoint", ckpts[mode],
                    "--compact-every", every,
                ]
            ) == 0
            capsys.readouterr()
        # the kept-set must never depend on compaction state
        assert kept(outs["c"]) == kept(outs["u"]), f"after batch {i}"

    assert kept(outs["c"]) == [1, 2, 3, 5]
    # bounded state: compactions ran at epochs 2 and 4 -> exactly one
    # snapshot (upto=4; upto=2 was superseded and deleted) and only
    # the raw dir of epoch 4 remains; the uncompacted run holds all 5
    assert glob.glob(f"{outs['c']}/_seen_compact/upto=*") == [
        f"{outs['c']}/_seen_compact/upto=4"
    ]
    assert os.path.exists(f"{outs['c']}/_seen_compact/upto=4/_SUCCESS")
    # the Bloom sidecar rides the snapshot (r14: routes provably-novel
    # rows around the snapshot anti-join; the kept-set identity with
    # the uncompacted twin above IS its exactness proof)
    assert os.path.exists(f"{outs['c']}/_seen_compact/upto=4/_bloom.json")
    raw = sorted(glob.glob(f"{outs['c']}/_seen_hashes/batch_id=*"))
    assert raw == [f"{outs['c']}/_seen_hashes/batch_id=4"]
    assert len(glob.glob(f"{outs['u']}/_seen_hashes/batch_id=*")) == 5
    # the snapshot holds the full pre-4 hash set: docs 1, 2, 3, 5
    assert (
        spark.read.parquet(f"{outs['c']}/_seen_compact/upto=4").count() == 4
    )

    # a torn snapshot write (no _SUCCESS) must be invisible: plant a
    # poisoned upto=5 dir, then stream a dup of doc 5 — it still dies
    # against the real state, and the torn dir is garbage-collected
    # by the next compaction (epoch 6)
    torn = f"{outs['c']}/_seen_compact/upto=5"
    shutil.copytree(f"{outs['c']}/_seen_compact/upto=4", torn)
    os.remove(f"{torn}/_SUCCESS")
    for f in glob.glob(f"{torn}/*.parquet"):
        os.remove(f)  # empty dir = would dedup NOTHING if trusted
    # corrupt the live snapshot's Bloom sidecar too: it is a pure
    # accelerator, so the reader must fall back to the plain
    # anti-join and still suppress every dup below
    with open(f"{outs['c']}/_seen_compact/upto=4/_bloom.json", "w") as fh:
        fh.write("{not json")
    crc = f"{outs['c']}/_seen_compact/upto=4/._bloom.json.crc"
    if os.path.exists(crc):
        os.remove(crc)  # direct overwrite left a stale Hadoop CRC
    (incoming / "b5.jsonl").write_text(
        json.dumps({"doc_id": 7, "text": good + "five", "lang": "en"})
        + "\n"
        + json.dumps({"doc_id": 8, "text": good + "eight", "lang": "en"})
    )
    assert cli.main(
        [
            "stream-curate",
            "--input", str(incoming),
            "--output", outs["c"],
            "--checkpoint", ckpts["c"],
            "--compact-every", "2",
        ]
    ) == 0
    capsys.readouterr()
    assert kept(outs["c"]) == [1, 2, 3, 5, 8]
    # epoch 6 compacts: the torn upto=5 dir is swept with the rest
    (incoming / "b6.jsonl").write_text(
        json.dumps({"doc_id": 9, "text": good + "nine", "lang": "en"})
    )
    assert cli.main(
        [
            "stream-curate",
            "--input", str(incoming),
            "--output", outs["c"],
            "--checkpoint", ckpts["c"],
            "--compact-every", "2",
        ]
    ) == 0
    capsys.readouterr()
    assert kept(outs["c"]) == [1, 2, 3, 5, 8, 9]
    assert glob.glob(f"{outs['c']}/_seen_compact/upto=*") == [
        f"{outs['c']}/_seen_compact/upto=6"
    ]

    # replay: same checkpoint, no new input -> nothing changes
    n_dirs = len(glob.glob(f"{outs['c']}/data/batch_id=*"))
    assert cli.main(
        [
            "stream-curate",
            "--input", str(incoming),
            "--output", outs["c"],
            "--checkpoint", ckpts["c"],
            "--compact-every", "2",
        ]
    ) == 0
    capsys.readouterr()
    assert len(glob.glob(f"{outs['c']}/data/batch_id=*")) == n_dirs
    assert kept(outs["c"]) == [1, 2, 3, 5, 8, 9]


def test_stream_curate_near_dup_suppression(spark, tmp_path, capsys):
    """--near-dup-threshold (r14, VERDICT r13 #6): cross-batch AND
    within-batch near-copies are suppressed and flagged to their
    surviving originals under _monitor/neardups/; the band state
    rides the same epoch-keyed layout + compaction as the hash
    state; replay writes nothing."""
    import glob
    import json

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "today " * 3
    )
    other = (
        "a calm river flows past the old stone bridge where children "
        "often play and watch the boats drift by " * 2
    )
    # near-copies: one word swapped (high shingle overlap, not exact)
    near1 = base.replace("lazy", "sleepy", 1)
    near2 = base.replace("quick", "rapid", 1)
    incoming = tmp_path / "inc"
    incoming.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    batches = [
        # within-batch: doc 2 is a near-copy of doc 1 (earlier id wins)
        [
            {"doc_id": 1, "text": base, "lang": "en"},
            {"doc_id": 2, "text": near1, "lang": "en"},
            {"doc_id": 3, "text": other, "lang": "en"},
        ],
        # cross-batch: doc 10 near-copies doc 1, doc 12 near-copies
        # doc 3; doc 11 is genuinely new and must pass through
        [
            {"doc_id": 10, "text": near2, "lang": "en"},
            {"doc_id": 11, "text":
                "the little bakery on the corner opens early and fills "
                "the street with the warm smell of fresh bread every "
                "morning while the town slowly wakes up " * 2,
             "lang": "en"},
            {"doc_id": 12, "text": other.replace("calm", "quiet", 1),
             "lang": "en"},
        ],
        # post-compaction (epoch 2 compacts both states): doc 20
        # still matches doc 1 via the consolidated band snapshot
        [{"doc_id": 20, "text": near1 + "extra", "lang": "en"}],
    ]

    def run():
        assert cli.main(
            [
                "stream-curate",
                "--input", str(incoming),
                "--output", out,
                "--checkpoint", ckpt,
                "--compact-every", "2",
                "--near-dup-threshold", "0.6",
            ]
        ) == 0
        capsys.readouterr()

    for i, rows in enumerate(batches):
        (incoming / f"b{i}.jsonl").write_text(
            "\n".join(json.dumps(d) for d in rows)
        )
        run()

    got = spark.read.option("basePath", f"{out}/data").parquet(
        f"{out}/data/batch_id=*"
    )
    assert sorted(r.doc_id for r in got.collect()) == [1, 3, 11]

    flagged = spark.read.option(
        "basePath", f"{out}/_monitor/neardups"
    ).parquet(f"{out}/_monitor/neardups/batch_id=*")
    by_doc = {r.doc: r for r in flagged.collect()}
    assert set(by_doc) == {2, 10, 12, 20}
    assert by_doc[2].dup_of == 1 and by_doc[2].sim >= 0.6
    assert by_doc[10].dup_of == 1 and by_doc[10].sim >= 0.6
    assert by_doc[12].dup_of == 3 and by_doc[12].sim >= 0.6
    assert by_doc[20].dup_of == 1 and by_doc[20].sim >= 0.6

    # band state compacted at epoch 2 alongside the hash state
    assert glob.glob(f"{out}/_seen_bands_compact/upto=*") == [
        f"{out}/_seen_bands_compact/upto=2"
    ]
    assert sorted(glob.glob(f"{out}/_seen_bands/batch_id=*")) == [
        f"{out}/_seen_bands/batch_id=2"
    ]

    # replay: same checkpoint, no new input -> nothing changes
    n_dirs = len(glob.glob(f"{out}/data/batch_id=*"))
    run()
    assert len(glob.glob(f"{out}/data/batch_id=*")) == n_dirs
    got = spark.read.option("basePath", f"{out}/data").parquet(
        f"{out}/data/batch_id=*"
    )
    assert sorted(r.doc_id for r in got.collect()) == [1, 3, 11]


def test_cli_report_model_signal_blocks(spark, tmp_path, capsys):
    """report --ppl-lm / --dsir-target / --eval-embeddings: the r13
    data-card signal rows come out of the CLI verb."""
    import random

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    def doc(seed, n=20):
        r = random.Random(seed)
        return " ".join(
            r.choice(["the", "cat", "dog", "sat", "tree", "fish"])
            for _ in range(n)
        )

    src = str(tmp_path / "docs")
    rng = random.Random(5)
    spark.createDataFrame(
        [
            (i, doc(i), "en", [rng.uniform(-1, 1) for _ in range(6)])
            for i in range(25)
        ],
        "doc_id long, text string, lang string, embedding array<double>",
    ).write.parquet(src)
    ref = str(tmp_path / "ref")
    spark.createDataFrame(
        [(doc(100 + i),) for i in range(20)], "text string"
    ).write.parquet(ref)
    lm_dir = str(tmp_path / "lm")
    assert cli.main(
        ["lm", "--op", "train", "--model", lm_dir, "--input", ref,
         "--order", "2"]
    ) == 0
    evals = str(tmp_path / "evals")
    spark.createDataFrame(
        [(0, [1.0, 0.5, -0.25, 0.0, 0.75, -1.0])],
        "vec_id long, embedding array<double>",
    ).write.parquet(evals)
    capsys.readouterr()

    assert cli.main(
        [
            "report", "--input", src,
            "--ppl-lm", lm_dir,
            "--dsir-target", ref, "--select-buckets", "256",
            "--eval-embeddings", evals,
        ]
    ) == 0
    out = capsys.readouterr().out
    for row in (
        "ppl_mean", "ppl_bucket_cut:1", "ppl_max",
        "dsir_logweight_mean", "semdecontam_max_cosine_mean",
        "semdecontam_contaminated_ratio",
    ):
        assert row in out, out


def test_cli_explain_verb(spark, capsys):
    """explain --query: the plan-audit loop as a verb — formatted
    physical plan out; unknown names error with suggestions."""
    import pytest as _pytest

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    assert cli.main(
        ["explain", "--query", "q01_pricing_summary",
         "--sf-dir", "/root/testdata/sf0.001"]
    ) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan parquet" in out
    with _pytest.raises(SystemExit):
        cli.main(["explain", "--query", "q01_pricing_summar"])
    assert "did you mean" in capsys.readouterr().err


def test_cli_mine_negatives_lifecycle(spark, tmp_path, capsys):
    """End-to-end CLI: mine hard negatives from a labeled embedding
    parquet — output parquet matches the operator called directly,
    and label exclusion holds (no mined pair shares a label)."""
    import numpy as np

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    rng = np.random.RandomState(5)
    rows = [
        (
            i,
            [float(v) for v in rng.randn(6) + (i % 3) * 8.0],
            "ABC"[i % 3],
        )
        for i in range(60)
    ]
    src = str(tmp_path / "emb")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, lang string"
    ).write.parquet(src)
    dest = str(tmp_path / "negs")
    assert (
        cli.main(
            [
                "mine", "--op", "negatives", "--input", src,
                "--output", dest, "--label-col", "lang", "--k", "3",
                "--method", "ivf", "--cells", "3", "--nprobe", "3",
            ]
        )
        or 0
    ) == 0
    out = capsys.readouterr().out
    assert "hard negatives" in out and dest in out
    mined = spark.read.parquet(dest)
    labels = {r[0]: r[2] for r in rows}
    got = mined.collect()
    assert got and all(labels[r.anchor_id] != labels[r.neg_id] for r in got)
    assert mined.groupBy("anchor_id").count().agg({"count": "max"}).first()[0] <= 3


def test_cli_mine_bitext_lifecycle(spark, tmp_path, capsys):
    """End-to-end CLI: mine bitext pairs from two embedding parquets
    with planted parallel rows — every planted (i, i) pair is
    recovered at the 1.05 threshold under the forward strategy."""
    import numpy as np

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    rng = np.random.RandomState(9)
    src_vecs = {i: rng.randn(6) for i in range(10)}
    s = str(tmp_path / "src")
    t = str(tmp_path / "tgt")
    schema = "vec_id long, embedding array<double>"
    spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in src_vecs.items()], schema
    ).write.parquet(s)
    spark.createDataFrame(
        [
            (i, [float(x) for x in v + rng.randn(6) * 0.03])
            for i, v in src_vecs.items()
        ]
        + [(j, [float(x) for x in rng.randn(6)]) for j in range(10, 16)],
        schema,
    ).write.parquet(t)
    dest = str(tmp_path / "pairs")
    assert (
        cli.main(
            [
                "mine", "--op", "bitext", "--input", s, "--target", t,
                "--output", dest, "--k", "3", "--threshold", "1.05",
                "--strategy", "forward", "--method", "brute",
            ]
        )
        or 0
    ) == 0
    out = capsys.readouterr().out
    assert "bitext pairs" in out and dest in out
    mined = spark.read.parquet(dest)
    assert {(r.src_id, r.tgt_id) for r in mined.collect()} == {
        (i, i) for i in range(10)
    }


def test_cli_mine_bitext_requires_target(spark, tmp_path, capsys):
    import pytest as _pytest

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "emb2")
    spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    ).write.parquet(src)
    with _pytest.raises(SystemExit):
        cli.main(
            ["mine", "--op", "bitext", "--input", src,
             "--output", str(tmp_path / "o")]
        )
    assert "requires --target" in capsys.readouterr().err


def test_cli_pairs_end_to_end(spark, tmp_path, capsys):
    """`pairs` builds preference pairs and the optional per-prompt
    stats table through the full CLI path."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    rows = [
        ("p1", 1, 3.0, "best"), ("p1", 2, 1.0, "worst"), ("p1", 3, 2.0, "mid"),
        ("p2", 4, 5.0, "a"), ("p2", 5, 5.0, "b"),  # tie: no pair
    ]
    src = str(tmp_path / "resp")
    spark.createDataFrame(
        rows, "prompt_id string, response_id long, score double, text string"
    ).write.parquet(src)

    dest, stats = str(tmp_path / "pairs"), str(tmp_path / "stats")
    assert (
        cli.main(
            ["pairs", "--input", src, "--output", dest, "--text-col", "text",
             "--strategy", "best_rest", "--stats-output", stats]
        )
        == 0
    )
    got = sorted(
        (r.prompt, r.chosen_id, r.rejected_id, r.margin, r.chosen_text)
        for r in spark.read.parquet(dest).collect()
    )
    assert got == [
        ("p1", 1, 2, 2.0, "best"),
        ("p1", 1, 3, 1.0, "best"),
    ]
    st = {r.prompt: r for r in spark.read.parquet(stats).collect()}
    assert st["p2"].top_is_tied and not st["p1"].top_is_tied
    out = capsys.readouterr().out
    assert "built 2 preference pairs over 1 prompts" in out
    assert "per-prompt stats" in out


def test_cli_chat_lifecycle(spark, tmp_path, capsys):
    """`chat` validate/render/stats/dedup/truncate over one corpus:
    every op through the full CLI path, plus the truncate guard."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    good = [("user", "hello there friend"), ("assistant", "hi")]
    rows = [
        (1, good),
        (2, good),  # duplicate of 1
        (3, [("user", "dangling question words")]),  # invalid tail
    ]
    src = str(tmp_path / "convs")
    spark.createDataFrame(
        rows, "conv_id long, turns array<struct<role:string,content:string>>"
    ).write.parquet(src)

    val = str(tmp_path / "val")
    assert (
        cli.main(
            ["chat", "--op", "validate", "--input", src, "--output", val,
             "--valid-only"]
        )
        == 0
    )
    assert {r.conv_id for r in spark.read.parquet(val).collect()} == {1, 2}

    ren = str(tmp_path / "ren")
    assert (
        cli.main(
            ["chat", "--op", "render", "--input", src, "--output", ren,
             "--template", "plain"]
        )
        == 0
    )
    texts = {r.conv_id: r.text for r in spark.read.parquet(ren).collect()}
    assert texts[1] == "user: hello there friend\n\nassistant: hi"

    st = str(tmp_path / "stats")
    assert cli.main(["chat", "--op", "stats", "--input", src, "--output", st]) == 0
    assert {r.conv_id: r.ws_tokens for r in spark.read.parquet(st).collect()} == {
        1: 4, 2: 4, 3: 3,
    }

    dd = str(tmp_path / "dd")
    assert cli.main(["chat", "--op", "dedup", "--input", src, "--output", dd]) == 0
    assert {r.conv_id for r in spark.read.parquet(dd).collect()} == {1, 3}

    tr = str(tmp_path / "tr")
    assert (
        cli.main(
            ["chat", "--op", "truncate", "--input", src, "--output", tr,
             "--max-tokens", "3"]
        )
        == 0
    )
    kept = {r.conv_id: len(r.turns) for r in spark.read.parquet(tr).collect()}
    # 3-token first turns fit budget 3 exactly; the reply busts it
    assert kept == {1: 1, 2: 1, 3: 1}
    assert "chat truncate: 3 conversations" in capsys.readouterr().out

    with pytest.raises(SystemExit):
        cli.main(["chat", "--op", "truncate", "--input", src, "--output", tr])
    assert "requires --max-tokens" in capsys.readouterr().err


def test_cli_sample_end_to_end(spark, tmp_path, capsys):
    """`sample` draws exactly n per stratum deterministically through
    the full CLI path."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    rows = [(i, 1.0 + (i % 5), f"s{i % 2}") for i in range(40)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, w double, s string").write.parquet(src)

    dest = str(tmp_path / "draw")
    argv = ["sample", "--input", src, "--output", dest, "--n", "4",
            "--weight-col", "w", "--strata-col", "s", "--seed", "9",
            "--key-col", "es_key"]
    assert cli.main(argv) == 0
    first = {(r.doc_id, r.es_key < 0) for r in spark.read.parquet(dest).collect()}
    assert len(first) == 8 and all(neg for _, neg in first)
    assert "drew 8 rows without replacement" in capsys.readouterr().out
    # re-run: same seed, same rows (the determinism contract)
    assert cli.main(argv) == 0
    again = {(r.doc_id, r.es_key < 0) for r in spark.read.parquet(dest).collect()}
    assert again == first


def test_cli_mix_and_curve(spark, tmp_path, capsys):
    """`mix` (both ops) and `curve` through the full CLI path."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    rows = [("en", 100.0, 0.9), ("en", 100.0, 0.4), ("yo", 10.0, 0.7)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "lang string, n_tokens double, score double"
    ).write.parquet(src)

    uni = str(tmp_path / "uni")
    assert (
        cli.main(
            ["mix", "--op", "unimax", "--input", src, "--output", uni,
             "--budget", "100", "--max-epochs", "2.0"]
        )
        == 0
    )
    got = {r.lang: r for r in spark.read.parquet(uni).collect()}
    # yo capped at 20 (2 epochs x 10); en takes the remaining 80
    assert got["yo"].alloc == 20.0 and got["en"].alloc == 80.0

    temp = str(tmp_path / "temp")
    assert (
        cli.main(
            ["mix", "--op", "temperature", "--input", src, "--output", temp,
             "--tau", "0.5"]
        )
        == 0
    )
    assert spark.read.parquet(temp).count() == 2
    with pytest.raises(SystemExit):
        cli.main(["mix", "--op", "unimax", "--input", src, "--output", uni])
    assert "requires --budget" in capsys.readouterr().err

    cur = str(tmp_path / "cur")
    assert (
        cli.main(
            ["curve", "--input", src, "--output", cur, "--score-col", "score",
             "--lo", "0", "--hi", "1", "--points", "4",
             "--weight-col", "n_tokens", "--group-col", "lang"]
        )
        == 0
    )
    out = spark.read.parquet(cur)
    assert out.count() == 10  # 2 langs x 5 thresholds
    en = {round(r.threshold, 9): r for r in out.filter("lang='en'").collect()}
    assert en[0.0].docs_kept == 2 and en[0.75].docs_kept == 1
    assert en[0.5].weight_kept == 100.0
    assert "retention curve: 10 grid rows" in capsys.readouterr().out


def test_cli_tokenizer_utilization(spark, tmp_path, capsys):
    """`tokenizer --op utilization` prints per-slice vocab coverage
    through the full CLI path (train a tiny model first)."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "the quick brown fox " * 3, "en") for i in range(5)]
        + [(9, "zzz unseen", "de")],
        "doc_id long, text string, lang string",
    ).write.parquet(src)
    model = str(tmp_path / "tok.json")
    assert (
        cli.main(
            ["tokenizer", "--op", "train", "--model", model, "--input", src,
             "--merges", "10"]
        )
        == 0
    )
    capsys.readouterr()
    assert (
        cli.main(
            ["tokenizer", "--op", "utilization", "--model", model,
             "--input", src]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "coverage=" in out and "singletons=" in out
    assert "en" in out and "de" in out


def test_cli_mine_positives(spark, tmp_path, capsys):
    """`mine --op positives` crops deterministic (query, positive)
    pairs through the full CLI path."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(10))) for i in range(8)],
        "doc_id long, text string",
    ).write.parquet(src)
    dest = str(tmp_path / "pairs")
    argv = ["mine", "--op", "positives", "--input", src, "--output", dest,
            "--id-col", "doc_id", "--pair-op", "ict",
            "--min-tokens", "2", "--max-tokens", "5", "--seed", "3"]
    assert cli.main(argv) == 0
    got = {r.doc_id: (r.query, r.positive) for r in spark.read.parquet(dest).collect()}
    assert len(got) == 8
    for i, (q, p) in got.items():
        assert sorted(q.split() + p.split()) == sorted(f"w{i}_{j}" for j in range(10))
    assert "mined 8 positive pairs (ict" in capsys.readouterr().out
    assert cli.main(argv) == 0  # deterministic re-run
    assert {r.doc_id: (r.query, r.positive) for r in spark.read.parquet(dest).collect()} == got


def test_cli_mine_corrupt(spark, tmp_path, capsys):
    """`mine --op corrupt` builds T5 denoising pairs through the full
    CLI path, deterministically."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(40))) for i in range(6)],
        "doc_id long, text string",
    ).write.parquet(src)
    dest = str(tmp_path / "pairs")
    argv = ["mine", "--op", "corrupt", "--input", src, "--output", dest,
            "--id-col", "doc_id", "--rate", "0.15", "--mean-span", "3"]
    assert cli.main(argv) == 0
    got = {r.doc_id: (r.inputs, r.targets) for r in spark.read.parquet(dest).collect()}
    assert len(got) == 6
    assert all("<extra_id_0>" in i and t.split()[-1].startswith("<extra_id_")
               for i, t in got.values())
    assert "built 6 span-corruption examples" in capsys.readouterr().out
    assert cli.main(argv) == 0
    assert {r.doc_id: (r.inputs, r.targets) for r in spark.read.parquet(dest).collect()} == got


def test_cli_sample_targets_assembly(spark, tmp_path, capsys):
    """mix --op unimax -> sample --targets: the mixture-assembly loop
    end-to-end through the CLI."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli
    from pyspark.sql import functions as F

    rows = [(i, 1.0 + i % 3, f"s{i % 2}") for i in range(40)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, w double, lang string").write.parquet(src)
    # sizes -> unimax targets
    uni = str(tmp_path / "uni")
    assert cli.main(
        ["mix", "--op", "unimax", "--input", src, "--output", uni,
         "--group-col", "lang", "--size-col", "w", "--budget", "12"]
    ) == 0
    targets = str(tmp_path / "targets")
    spark.read.parquet(uni).select(
        "lang", F.floor("alloc").cast("long").alias("target")
    ).write.parquet(targets)
    dest = str(tmp_path / "drawn")
    assert cli.main(
        ["sample", "--input", src, "--output", dest, "--targets", targets,
         "--weight-col", "w", "--strata-col", "lang", "--seed", "2"]
    ) == 0
    per = {
        r.lang: r["count"]
        for r in spark.read.parquet(dest).groupBy("lang").count().collect()
    }
    assert sum(per.values()) <= 12 and set(per) == {"s0", "s1"}
    assert "targets table per 'lang'" in capsys.readouterr().out
    with pytest.raises(SystemExit):
        cli.main(["sample", "--input", src, "--output", dest,
                  "--weight-col", "w"])
    assert "exactly one of" in capsys.readouterr().err


def test_cli_mine_fim(spark, tmp_path, capsys):
    """`mine --op fim` reorders documents for infilling through the
    full CLI path, deterministically."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"def f{i}(): return {i}") for i in range(20)],
        "doc_id long, text string",
    ).write.parquet(src)
    dest = str(tmp_path / "fim")
    argv = ["mine", "--op", "fim", "--input", src, "--output", dest,
            "--id-col", "doc_id", "--rate-fim", "1.0", "--seed", "6"]
    assert cli.main(argv) == 0
    got = {r.doc_id: r.text for r in spark.read.parquet(dest).collect()}
    assert len(got) == 20
    assert all("<fim_middle>" in t for t in got.values())
    assert "FIM-transformed 20/20 docs" in capsys.readouterr().out
    assert cli.main(argv) == 0
    assert {r.doc_id: r.text for r in spark.read.parquet(dest).collect()} == got


def test_cli_clean_para_dedup_stage(spark, tmp_path, capsys):
    """`clean --para-dedup` removes within-document repeated
    paragraphs ahead of the other stages."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "nav menu here\n\nreal content %d\n\nnav menu here" % i)
         for i in range(5)],
        "doc_id long, text string",
    ).write.parquet(src)
    dest = str(tmp_path / "clean")
    assert (
        cli.main(
            ["clean", "--input", src, "--output", dest, "--para-dedup",
             "--boiler-min-docs", "100", "--substr-window", "0"]
        )
        == 0
    )
    got = {r.doc_id: r.text for r in spark.read.parquet(dest).collect()}
    for i, t in got.items():
        assert t == f"nav menu here\n\nreal content {i}"


def test_cli_tokenizer_prune(spark, tmp_path, capsys):
    """train -> prune -> the pruned model re-encodes the corpus and
    survives a reload through the public tokenizer.json format."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "alpha beta gamma " * 4) for i in range(6)],
        "doc_id long, text string",
    ).write.parquet(src)
    model, pruned = str(tmp_path / "tok.json"), str(tmp_path / "pruned.json")
    assert cli.main(
        ["tokenizer", "--op", "train", "--model", model, "--input", src,
         "--merges", "30"]
    ) == 0
    capsys.readouterr()
    assert cli.main(
        ["tokenizer", "--op", "prune", "--model", model, "--input", src,
         "--output", pruned]
    ) == 0
    out = capsys.readouterr().out
    assert "pruned vocab" in out
    ids = str(tmp_path / "ids")
    assert cli.main(
        ["tokenizer", "--op", "encode", "--model", pruned, "--input", src,
         "--output", ids]
    ) == 0
    assert spark.read.parquet(ids).count() == 6


def test_cli_order_in_context(spark, tmp_path, capsys):
    """`order` produces a packing order over an embeddings parquet
    through the full CLI path."""
    import numpy as np

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    rng = np.random.default_rng(1)
    rows = []
    for c, base in enumerate(([30.0, 0], [0, 30.0])):
        for i in range(8):
            v = np.array(base) + rng.normal(0, 0.4, 2)
            rows.append((c * 8 + i, [float(x) for x in v]))
    src = str(tmp_path / "emb")
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").write.parquet(src)
    dest = str(tmp_path / "order")
    assert cli.main(
        ["order", "--input", src, "--output", dest, "--n-clusters", "2"]
    ) == 0
    got = spark.read.parquet(dest)
    assert got.count() == 16
    assert set(got.columns) == {"vec_id", "cluster_id", "pack_order"}
    assert "ordered 16 docs across 2 clusters" in capsys.readouterr().out


def test_cli_clean_strip_code_fences(spark, tmp_path):
    """`clean --strip-code-fences` feeds only the prose stream into
    the rest of the chain."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"real prose {i}\n```python\nsecret = {i}\n```\nmore prose")
         for i in range(4)],
        "doc_id long, text string",
    ).write.parquet(src)
    dest = str(tmp_path / "clean")
    assert cli.main(
        ["clean", "--input", src, "--output", dest, "--strip-code-fences",
         "--boiler-min-docs", "100", "--substr-window", "0"]
    ) == 0
    got = {r.doc_id: r.text for r in spark.read.parquet(dest).collect()}
    for i, t in got.items():
        assert "secret" not in t and f"real prose {i}" in t


def test_cli_prune_refuses_unserializable_spec(spark, tmp_path, capsys):
    """tokenizer --op prune refuses specs whose sections
    save_tokenizer's format would silently drop (review r16)."""
    import json as _json

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    # a Llama-shaped tokenizer.json: normalizers + no pre_tokenizer
    doc = {
        "version": "1.0",
        "normalizer": {
            "type": "Sequence",
            "normalizers": [
                {"type": "Prepend", "prepend": "▁"},
                {"type": "Replace", "pattern": {"String": " "},
                 "content": "▁"},
            ],
        },
        "model": {
            "type": "BPE",
            "unk_token": None,
            "vocab": {"a": 0, "▁": 1},
            "merges": [],
        },
    }
    model = str(tmp_path / "llama.json")
    with open(model, "w") as fh:
        fh.write(_json.dumps(doc))
    src = str(tmp_path / "docs")
    spark.createDataFrame([(0, "a")], "doc_id long, text string").write.parquet(src)
    with pytest.raises(SystemExit):
        cli.main(["tokenizer", "--op", "prune", "--model", model,
                  "--input", src, "--output", str(tmp_path / "out.json")])
    assert "cannot serialize this spec faithfully" in capsys.readouterr().err


def test_cli_prune_remap_output(spark, tmp_path, capsys):
    """--remap-output writes the (old_id, new_id) table."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "aa bb aa") for i in range(3)], "doc_id long, text string"
    ).write.parquet(src)
    model = str(tmp_path / "tok.json")
    assert cli.main(["tokenizer", "--op", "train", "--model", model,
                     "--input", src, "--merges", "5"]) == 0
    pruned, remap = str(tmp_path / "p.json"), str(tmp_path / "remap")
    assert cli.main(["tokenizer", "--op", "prune", "--model", model,
                     "--input", src, "--output", pruned,
                     "--remap-output", remap]) == 0
    m = spark.read.parquet(remap)
    assert set(m.columns) == {"old_id", "new_id"}
    assert m.count() > 0
    assert "id remap ->" in capsys.readouterr().out


def test_cli_mine_text_ops_default_doc_id(spark, tmp_path):
    """mine's text ops default to doc_id (the corpus convention)
    without an explicit --id-col (review r16)."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(20))) for i in range(4)],
        "doc_id long, text string",
    ).write.parquet(src)
    dest = str(tmp_path / "out")
    assert cli.main(["mine", "--op", "fim", "--input", src,
                     "--output", dest, "--rate-fim", "1.0"]) == 0
    assert spark.read.parquet(dest).count() == 4


def test_cli_curve_normalized(spark, tmp_path, capsys):
    """curve --normalize aligns per-source scales before curving:
    two sources with 100x different raw scales land the same
    normalized retention profile."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    rows = [(i, float(i % 10), "a") for i in range(20)] + [
        (100 + i, float((i % 10) * 100), "b") for i in range(20)
    ]
    src = str(tmp_path / "scored")
    spark.createDataFrame(rows, "id long, score double, lang string").write.parquet(src)
    dest = str(tmp_path / "curve")
    assert cli.main(
        ["curve", "--input", src, "--output", dest, "--score-col", "score",
         "--lo", "0", "--hi", "1", "--points", "4", "--group-col", "lang",
         "--normalize", "minmax"]
    ) == 0
    got = {}
    for r in spark.read.parquet(dest).collect():
        got.setdefault(r.lang, {})[round(r.threshold, 9)] = r.docs_kept
    assert got["a"] == got["b"]  # identical profiles after norm
    with pytest.raises(SystemExit):
        cli.main(["curve", "--input", src, "--output", dest,
                  "--score-col", "score", "--lo", "0", "--hi", "1",
                  "--normalize", "zscore"])
    assert "requires --group-col" in capsys.readouterr().err


def test_cli_perturb(spark, tmp_path, capsys):
    """`perturb` writes deterministic typo noise through the full CLI
    path."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, " ".join(f"token{j}word" for j in range(20))) for i in range(5)],
        "doc_id long, text string",
    ).write.parquet(src)
    dest = str(tmp_path / "noisy")
    argv = ["perturb", "--input", src, "--output", dest,
            "--rate", "0.5", "--seed", "4"]
    assert cli.main(argv) == 0
    got = {r.doc_id: (r.text, r.n_edits) for r in spark.read.parquet(dest).collect()}
    assert sum(e for _, e in got.values()) > 10
    assert "word edits" in capsys.readouterr().out
    assert cli.main(argv) == 0  # deterministic re-run
    assert {r.doc_id: (r.text, r.n_edits) for r in spark.read.parquet(dest).collect()} == got


def test_cli_curate_full_new_clean_stages(spark, tmp_path, capsys):
    """curate-full --strip-code-fences --para-dedup run as funnel
    stages ahead of the existing chain."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    docs = [
        (i, "en",
         f"real prose {i} here\n\nreal prose {i} here\n\n"
         f"```py\nsecret = 1\n```\ndistinct tail w{i}a w{i}b w{i}c "
         f"w{i}d w{i}e w{i}f w{i}g w{i}h keeping documents far apart")
        for i in range(12)
    ]
    src = str(tmp_path / "raw")
    spark.createDataFrame(docs, "doc_id long, lang string, text string").write.parquet(src)
    dest = str(tmp_path / "corpus")
    assert cli.main(
        ["curate-full", "--input", src, "--output", dest,
         "--strip-code-fences", "--para-dedup",
         "--boiler-min-docs", "100", "--min-quality", "0.0",
         "--near-dup-threshold", "0.99", "--keep-rates", "en=1.0"]
    ) == 0
    out = capsys.readouterr().out
    assert "strip_code_fences" in out and "para_dedup" in out
    got = spark.read.parquet(dest)
    [r] = got.filter("doc_id = 3").collect()
    assert "secret" not in r.text
    assert r.text.count("real prose 3 here") == 1


def test_cli_clean_refuses_helper_column_collisions(spark, tmp_path):
    """ADVICE r16: --strip-code-fences / --para-dedup generate fixed
    helper column names (prose, code_blocks, code_ratio,
    paras_removed) and drop/rename them into the text column; an
    input that already carries one must be refused loudly, not
    silently clobbered."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "some text", 0.5)],
        "doc_id long, text string, code_ratio double",
    ).write.parquet(src)
    with pytest.raises(SystemExit, match="code_ratio"):
        cli.main(
            ["clean", "--input", src, "--output", str(tmp_path / "o1"),
             "--strip-code-fences", "--boiler-min-docs", "100",
             "--substr-window", "0"]
        )

    src2 = str(tmp_path / "docs2")
    spark.createDataFrame(
        [(0, "para\n\npara", "x")],
        "doc_id long, text string, paras_removed string",
    ).write.parquet(src2)
    with pytest.raises(SystemExit, match="paras_removed"):
        cli.main(
            ["clean", "--input", src2, "--output", str(tmp_path / "o2"),
             "--para-dedup", "--boiler-min-docs", "100",
             "--substr-window", "0"]
        )

    # curate-full wiring shares the guard
    from utc_cuip_kafka_aws_connector_spark.cli import run_curate_full

    with pytest.raises(SystemExit, match="strip-code-fences"):
        run_curate_full(
            spark, src, str(tmp_path / "o3"),
            strip_code_fences=True, boiler_min_docs=100,
        )


def test_cli_bestof_end_to_end(spark, tmp_path, capsys):
    """`bestof` writes each prompt's thresholded top-n and reports
    prompt/row counts."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "resp")
    spark.createDataFrame(
        [("p", 1, 1.0), ("p", 2, 3.0), ("p", 3, 2.0),
         ("q", 4, 0.1), ("q", 5, 0.2)],
        "prompt_id string, response_id long, score double",
    ).write.parquet(src)
    dest = str(tmp_path / "best")
    assert cli.main(
        ["bestof", "--input", src, "--output", dest,
         "--n", "2", "--min-score", "0.5"]
    ) == 0
    got = {
        (r.prompt, r.response_id): r.rank
        for r in spark.read.parquet(dest).collect()
    }
    # q is rejected wholesale (no response >= 0.5)
    assert got == {("p", 2): 1, ("p", 3): 2}
    out = capsys.readouterr().out
    assert "kept 2 responses over 1 prompts" in out


def test_cli_mix_doremi(spark, tmp_path, capsys):
    """`mix --op doremi` aggregates per-example losses and writes the
    EG-averaged mixture; harder domains weigh more."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "losses")
    rows = []
    for step in range(3):
        for i in range(5):
            rows.append((step, "hard", 3.0 + i * 0.1, 2.0))
            rows.append((step, "easy", 2.0, 2.0))
    spark.createDataFrame(
        rows, "step long, domain string, proxy_loss double, ref_loss double"
    ).write.parquet(src)
    dest = str(tmp_path / "weights")
    assert cli.main(
        ["mix", "--op", "doremi", "--input", src, "--output", dest,
         "--group-col", "domain", "--step-col", "step", "--lr", "1.0"]
    ) == 0
    got = {r.domain: r.weight for r in spark.read.parquet(dest).collect()}
    assert got["hard"] > got["easy"]
    assert sum(got.values()) == pytest.approx(1.0)
    assert "weights for 2 groups" in capsys.readouterr().out


def test_cli_batchplan_end_to_end(spark, tmp_path, capsys):
    """`batchplan` writes batch assignments and prints exact padding
    economics; the per-bucket report rides --report-output."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, [4, 5, 6, 7][i % 4]) for i in range(40)],
        "doc_id long, n_tokens long",
    ).write.parquet(src)
    dest = str(tmp_path / "batches")
    rep = str(tmp_path / "rep")
    assert cli.main(
        ["batchplan", "--input", src, "--output", dest,
         "--batch-size", "8", "--shard-hex", "0",
         "--boundaries", "8,64", "--report-output", rep]
    ) == 0
    from pyspark.sql import functions as F

    got = spark.read.parquet(dest)
    assert got.count() == 40
    assert got.filter(~F.col("is_remainder")).groupBy(
        "bucket", "shard", "batch_idx"
    ).count().filter(F.col("count") != 8).count() == 0
    out = capsys.readouterr().out
    assert "batchplan: 40 rows in 5 batches" in out
    assert spark.read.parquet(rep).count() == 1  # all lengths <= 8: one bucket


def test_cli_batchplan_empty_input(spark, tmp_path, capsys):
    """Review r17: an input with no eligible rows (all lengths
    null/non-positive) must report cleanly, not crash formatting the
    NULL aggregate."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, None), (2, 0)], "doc_id long, n_tokens long"
    ).write.parquet(src)
    dest = str(tmp_path / "batches")
    assert cli.main(
        ["batchplan", "--input", src, "--output", dest, "--shard-hex", "0"]
    ) == 0
    assert "0 eligible rows" in capsys.readouterr().out
    assert spark.read.parquet(dest).count() == 0


def test_cli_epochs_end_to_end(spark, tmp_path, capsys):
    """`epochs` closes the mix -> rows loop: a unimax-shaped
    allocation materializes as the replicated corpus."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(40)],
        "doc_id long, lang string",
    ).write.parquet(src)
    alloc = str(tmp_path / "alloc")
    spark.createDataFrame(
        [("en", 2.0), ("de", 0.0)], "lang string, epochs double"
    ).write.parquet(alloc)
    dest = str(tmp_path / "rows")
    assert cli.main(
        ["epochs", "--input", src, "--alloc", alloc, "--output", dest]
    ) == 0
    got = spark.read.parquet(dest)
    assert got.count() == 40  # 20 en docs x exactly 2 epochs; de dropped
    assert got.filter(got.lang == "de").count() == 0
    assert "materialized 40 rows across 1 groups" in capsys.readouterr().out


def test_cli_epochs_from_doremi_weights(spark, tmp_path, capsys):
    """The full learned-mixture loop through the CLI: mix --op doremi
    produces WEIGHTS; epochs --budget converts them against corpus
    sizes and materializes rows."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    losses = str(tmp_path / "losses")
    spark.createDataFrame(
        [("hard", 3.0 + i * 0.01, 2.0) for i in range(20)]
        + [("easy", 2.0, 2.0)] * 20,
        "domain string, proxy_loss double, ref_loss double",
    ).write.parquet(losses)
    weights = str(tmp_path / "weights")
    assert cli.main(
        ["mix", "--op", "doremi", "--input", losses, "--output", weights,
         "--group-col", "domain", "--lr", "2.0"]
    ) == 0

    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, "hard" if i % 2 else "easy") for i in range(100)],
        "doc_id long, domain string",
    ).write.parquet(corpus)
    rows = str(tmp_path / "rows")
    assert cli.main(
        ["epochs", "--input", corpus, "--alloc", weights, "--output", rows,
         "--group-col", "domain", "--budget", "200", "--max-epochs", "3"]
    ) == 0
    got = spark.read.parquet(rows)
    n_hard = got.filter(got.domain == "hard").count()
    n_easy = got.filter(got.domain == "easy").count()
    assert n_hard > n_easy  # the learned mixture upweights hard
    assert n_hard + n_easy == got.count() > 0
    assert "materialized" in capsys.readouterr().out


def test_cli_epochs_budget_rejects_custom_epochs_col(spark, tmp_path):
    """ADVICE r17: --budget always produces an 'epochs' column, so a
    non-default --epochs-col is a config contradiction — rejected
    with a clear parser error, not a missing-column
    AnalysisException deep in materialize_epochs."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, "en") for i in range(4)], "doc_id long, lang string"
    ).write.parquet(corpus)
    weights = str(tmp_path / "weights")
    spark.createDataFrame(
        [("en", 1.0)], "lang string, weight double"
    ).write.parquet(weights)
    with pytest.raises(SystemExit) as exc:
        cli.main(
            ["epochs", "--input", corpus, "--alloc", weights,
             "--output", str(tmp_path / "rows"),
             "--budget", "8", "--epochs-col", "reps"]
        )
    assert exc.value.code == 2  # argparse error exit


def test_cli_curve_max_groups_exposed(spark, tmp_path, capsys):
    """ADVICE r17 (carried): the curve verb exposes retention_curve's
    max_groups guard — a tight cap refuses on a wide group key, and
    raising it from the command line unblocks the same run."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "scored")
    spark.createDataFrame(
        # 10 groups x scores across the whole grid, so the histogram
        # carries ~5 bucket rows per group — past max_groups=3's
        # row cap (3 * (points + 2) = 18), under 100's (600)
        [(f"g{i}", j / 4.0) for i in range(10) for j in range(5)],
        "grp string, score double",
    ).write.parquet(src)
    argv = ["curve", "--input", src, "--output", str(tmp_path / "curve"),
            "--score-col", "score", "--lo", "0.0", "--hi", "1.0",
            "--points", "4", "--group-col", "grp"]
    with pytest.raises(ValueError, match="max_groups"):
        cli.main(argv + ["--max-groups", "3"])
    assert cli.main(argv + ["--max-groups", "100"]) == 0
    assert "retention curve" in capsys.readouterr().out
