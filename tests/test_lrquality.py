"""Discriminative quality classifier (operators/lrquality.py):
planted separation, internal consistency of probabilities against
the published coefficients, layout independence, filter contract,
save/load round trip, validation.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.lrquality import (
    lr_filter,
    lr_load,
    lr_save,
    lr_score,
    lr_train,
)

GOOD = ["the", "cat", "sat", "on", "mat", "dog", "ran", "tree", "house"]
JUNK = ["zx", "qq", "kpw", "vv", "jjj", "xoxo", "zzz"]


def _doc(seed, words, n=20):
    r = random.Random(seed)
    return " ".join(r.choice(words) for _ in range(n))


@pytest.fixture(scope="module")
def train_df(spark):
    rows = [(1, _doc(i, GOOD)) for i in range(60)]
    rows += [(0, _doc(1000 + i, JUNK)) for i in range(60)]
    return spark.createDataFrame(rows, "label int, text string")


@pytest.fixture(scope="module")
def model(train_df):
    return lr_train(train_df, n_features=2**12, max_iter=50)


def test_planted_separation(spark, model):
    rows = [(i, _doc(5000 + i, GOOD)) for i in range(20)]
    rows += [(100 + i, _doc(6000 + i, JUNK)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.p_keep for r in lr_score(df, model).collect()}
    assert all(got[i] > 0.9 for i in range(20))
    assert all(got[100 + i] < 0.1 for i in range(20))


def test_probability_matches_published_coefficients(spark, model):
    """Internal-consistency differential: p_keep must equal
    sigmoid(w.x + b) recomputed in pure Python from the model's own
    coefficients and the hashed feature vector MLlib builds — pins
    that score-time feature hashing equals train-time hashing."""
    rows = [(0, _doc(7, GOOD)), (1, _doc(8, JUNK)), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.p_keep for r in lr_score(df, model).collect()}

    lrm = model.stages[-1]
    w = lrm.coefficients
    b = float(lrm.intercept)
    # rebuild the feature vector with the pipeline's own feature
    # stages (everything but the classifier), then fold manually
    from pyspark.ml import PipelineModel

    feats_only = PipelineModel(model.stages[:-1])
    from utc_cuip_kafka_aws_connector_spark.operators.lrquality import (
        _with_tokens,
    )

    fdf = feats_only.transform(_with_tokens(df, "text"))
    for r in fdf.select("doc_id", "features").collect():
        z = b + sum(
            float(v) * float(w[int(i)])
            for i, v in zip(r.features.indices, r.features.values)
        )
        want = 1.0 / (1.0 + math.exp(-z))
        assert got[r.doc_id] == pytest.approx(want, abs=1e-9), r.doc_id
    # empty doc scores the intercept-only probability, not null
    assert got[2] == pytest.approx(1.0 / (1.0 + math.exp(-b)), abs=1e-9)


def test_layout_independent_predictions(spark, train_df, model):
    df = spark.createDataFrame(
        [(i, _doc(9000 + i, GOOD if i % 2 else JUNK)) for i in range(30)],
        "doc_id long, text string",
    )
    a = {r.doc_id: r.p_keep for r in lr_score(df, model).collect()}
    b = {
        r.doc_id: r.p_keep
        for r in lr_score(df.repartition(7), model).collect()
    }
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-9)


def test_filter_contract(spark, model):
    rows = [(i, _doc(300 + i, GOOD), "x") for i in range(10)]
    rows += [(50 + i, _doc(400 + i, JUNK), "y") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, extra string")
    kept = lr_filter(df, model, min_p_keep=0.5)
    assert sorted(r.doc_id for r in kept.collect()) == list(range(10))
    assert kept.columns == df.columns  # rows pass through unchanged


def test_save_load_round_trip(spark, model, tmp_path):
    path = str(tmp_path / "lrq")
    lr_save(model, path)
    reloaded = lr_load(path)
    df = spark.createDataFrame(
        [(0, _doc(11, GOOD)), (1, _doc(12, JUNK))],
        "doc_id long, text string",
    )
    a = {r.doc_id: r.p_keep for r in lr_score(df, model).collect()}
    b = {r.doc_id: r.p_keep for r in lr_score(df, reloaded).collect()}
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=0.0)  # same weights


def test_rejects_non_binary_labels(spark):
    df = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "label int, text string"
    )
    with pytest.raises(ValueError, match="binary"):
        lr_train(df, n_features=64)


def test_null_text_scores(spark, model):
    df = spark.createDataFrame(
        [(0, None), (1, _doc(2, GOOD))], "doc_id long, text string"
    )
    got = {r.doc_id: r.p_keep for r in lr_score(df, model).collect()}
    assert 0.0 <= got[0] <= 1.0  # null = empty doc, not a crash
    assert got[1] > 0.9


def test_cli_classify_lr_method(spark, tmp_path, capsys):
    """classify --method lr: train on labeled docs with --keep-label
    as the positive class, emit calibrated (id, p_keep)."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    train = str(tmp_path / "train")
    spark.createDataFrame(
        [(i, _doc(i, GOOD), "good") for i in range(40)]
        + [(100 + i, _doc(800 + i, JUNK), "junk") for i in range(40)],
        "doc_id long, text string, kind string",
    ).write.parquet(train)
    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, _doc(51, GOOD)), (1, _doc(52, JUNK))],
        "doc_id long, text string",
    ).write.parquet(docs)
    out = str(tmp_path / "scored")
    rc = cli.main(
        [
            "classify", "--train", train, "--input", docs,
            "--output", out, "--label-col", "kind",
            "--keep-label", "good", "--method", "lr",
        ]
    )
    assert rc == 0
    assert "p_keep vs 'good' (lr)" in capsys.readouterr().out
    got = {r.doc_id: r.p_keep for r in spark.read.parquet(out).collect()}
    assert got[0] > 0.9 and got[1] < 0.1

    import pytest as _pytest

    from utc_cuip_kafka_aws_connector_spark.cli import run_classify

    with _pytest.raises(ValueError, match="keep-label|keep_label|positive"):
        run_classify(
            spark, train, docs, str(tmp_path / "x"),
            label_col="kind", method="lr",
        )


def test_curate_full_classifier_stage(spark, tmp_path, capsys):
    """classify --method lr --save-model -> curate-full
    --classifier-model: the learned filter drops the junk half at its
    own funnel stage."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    train = str(tmp_path / "train")
    spark.createDataFrame(
        [(i, _doc(i, GOOD), "good") for i in range(40)]
        + [(100 + i, _doc(800 + i, JUNK), "junk") for i in range(40)],
        "doc_id long, text string, kind string",
    ).write.parquet(train)
    model_dir = str(tmp_path / "clf")
    assert cli.main(
        [
            "classify", "--train", train, "--input", train,
            "--output", str(tmp_path / "ignore"),
            "--label-col", "kind", "--keep-label", "good",
            "--method", "lr", "--save-model", model_dir,
        ]
    ) == 0
    capsys.readouterr()

    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, _doc(2000 + i, GOOD), "en") for i in range(15)]
        + [(50 + i, _doc(3000 + i, JUNK), "en") for i in range(15)],
        "doc_id long, text string, lang string",
    ).write.parquet(docs)
    out = str(tmp_path / "built")
    rc = cli.main(
        [
            "curate-full", "--input", docs, "--output", out,
            "--classifier-model", model_dir,
            "--boiler-min-docs", "1000", "--min-quality", "0.0",
            "--near-dup-threshold", "-1", "--keep-rates", "en=1.0",
        ]
    )
    assert rc == 0
    assert "classifier:15" in capsys.readouterr().out
    ids = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    assert ids == set(range(15))


def test_null_labels_raise_value_error(spark):
    """Code-review r13: a null among labels must surface the binary-
    label diagnostic, not a sorted() TypeError."""
    df = spark.createDataFrame(
        [(1, "a b"), (0, "c d"), (None, "e f")],
        "label int, text string",
    )
    with pytest.raises(ValueError, match="binary"):
        lr_train(df, n_features=64)


def test_tokenizer_contract_matches_words(spark, model):
    """Multi-line/tabbed text tokenizes through text.words — the
    same feature stream regardless of whitespace flavor."""
    df = spark.createDataFrame(
        [(0, "the cat sat on mat"), (1, "the\tcat\nsat  on mat")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.p_keep for r in lr_score(df, model).collect()}
    assert got[0] == pytest.approx(got[1], abs=1e-12)


def test_save_model_rejected_for_nb(spark, tmp_path):
    import pytest as _pytest

    from utc_cuip_kafka_aws_connector_spark.cli import run_classify

    train = str(tmp_path / "t")
    spark.createDataFrame(
        [(0, "a b", "x"), (1, "c d", "y")],
        "doc_id long, text string, kind string",
    ).write.parquet(train)
    with _pytest.raises(ValueError, match="save-model|save_model"):
        run_classify(
            spark, train, train, str(tmp_path / "o"),
            label_col="kind", method="nb", save_model=str(tmp_path / "m"),
        )


def test_lr_score_plan_is_jvm_only(spark, model):
    """The transform chain (tokens -> HashingTF -> NGram -> assemble
    -> LR -> vector_to_array) is compiled Scala end-to-end — no
    Python evaluation node in the scoring plan."""
    from tests.plan_utils import formatted_plan

    df = spark.createDataFrame(
        [(0, "the cat sat")], "doc_id long, text string"
    )
    plan = formatted_plan(lr_score(df, model))
    for node in ("BatchEvalPython", "ArrowEvalPython", "InPandas"):
        assert node not in plan, node


def test_stream_curate_classifier_stage(spark, tmp_path, capsys, model):
    """stream-curate --classifier-model: the learned filter runs per
    micro-batch inside the one foreachBatch consumer — batch/stream
    curation parity."""
    import json

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    model_dir = str(tmp_path / "clf")
    lr_save(model, model_dir)
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    (incoming / "b.jsonl").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"doc_id": 0, "text": _doc(70, GOOD), "lang": "en"},
                {"doc_id": 1, "text": _doc(71, JUNK), "lang": "en"},
                {"doc_id": 2, "text": _doc(72, GOOD), "lang": "en"},
            ]
        )
    )
    out = str(tmp_path / "out")
    rc = cli.main(
        [
            "stream-curate",
            "--input", str(incoming),
            "--output", out,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--min-quality", "0.0",
            "--classifier-model", model_dir,
        ]
    )
    assert rc == 0
    got = spark.read.option("basePath", f"{out}/data").parquet(
        f"{out}/data/batch_id=*"
    )
    assert sorted(r.doc_id for r in got.collect()) == [0, 2]
