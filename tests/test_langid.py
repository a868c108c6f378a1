"""Model-based language ID (operators/langid.py, r14 — the VERDICT
r13 'infrastructure sits ready' item): char-n-gram hashed NB over the
nbquality machinery. Planted multilingual separation, the heuristic
differential on the driver fixture corpus, save/load identity, empty
docs, and the CLI train -> predict -> curate-full --langid-model
lifecycle.
"""

from __future__ import annotations

import random

import pytest

from utc_cuip_kafka_aws_connector_spark.operators.langid import (
    char_ngram_features,
    langid_load,
    langid_predict,
    langid_save,
    langid_train,
)

# Small synthetic parallel corpora with language-typical character
# patterns (function words + morphology), built from public common
# words — enough signal for char trigrams at toy scale.
SENTENCES = {
    "en": [
        "the quick brown fox jumps over the lazy dog",
        "she said that the weather would be nice today",
        "a child walked to the school with her friends",
        "they found the book under the wooden table",
        "the nation of the market through which things flow",
    ],
    "de": [
        "der schnelle braune fuchs springt über den faulen hund",
        "sie sagte dass das wetter heute schön sein würde",
        "ein kind ging mit seinen freunden zur schule",
        "sie fanden das buch unter dem hölzernen tisch",
        "die nation und der markt durch welche dinge fließen",
    ],
    "fr": [
        "le rapide renard brun saute par dessus le chien paresseux",
        "elle a dit que le temps serait beau aujourd'hui",
        "un enfant marchait vers l'école avec ses amis",
        "ils ont trouvé le livre sous la table en bois",
        "la nation et le marché par lesquels les choses passent",
    ],
    "es": [
        "el rápido zorro marrón salta sobre el perro perezoso",
        "ella dijo que el tiempo sería agradable hoy",
        "un niño caminaba hacia la escuela con sus amigos",
        "encontraron el libro debajo de la mesa de madera",
        "la nación y el mercado por los cuales pasan las cosas",
    ],
}

HELD_OUT = {
    "en": "the children said that they would walk over to the market",
    "de": "die kinder sagten dass sie über den markt gehen würden",
    "fr": "les enfants ont dit qu'ils marcheraient vers le marché",
    "es": "los niños dijeron que caminarían hacia el mercado",
}


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [
        (i * 100 + j, t, lang)
        for i, (lang, texts) in enumerate(sorted(SENTENCES.items()))
        for j, t in enumerate(texts)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_planted_multilingual_separation(spark, labeled):
    """Train on 4 languages, predict held-out sentences: every one
    must come back with its true language."""
    model = langid_train(labeled, n=3, n_features=1 << 14)
    held = spark.createDataFrame(
        [(i, t, lang) for i, (lang, t) in enumerate(sorted(HELD_OUT.items()))],
        "doc_id long, text string, true_lang string",
    )
    pred = langid_predict(held, model)
    got = {
        r.doc_id: r.predicted
        for r in pred.collect()
    }
    want = {i: lang for i, (lang, _t) in enumerate(sorted(HELD_OUT.items()))}
    assert got == want


def test_heuristic_differential_on_fixture(spark, sf_dir, labeled):
    """The VERDICT-prescribed differential: on the driver fixture
    corpus (synthetic English-register text containing the 'the'/'a'
    markers and nothing from the other languages), the trained model
    and the marker-word heuristic must agree wherever the heuristic
    is CONFIDENT (a strict marker majority, not an all-zero tie) —
    the model subsumes the heuristic on its home turf."""
    from pyspark.sql import functions as F

    from utc_cuip_kafka_aws_connector_spark.operators.text import language_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    model = langid_train(labeled, n=3, n_features=1 << 14)
    pred = langid_predict(docs, model).select(
        "doc_id", F.col("predicted").alias("model_lang")
    )
    heur = language_id(docs).select("doc_id", "predicted_lang", "score_en")
    both = heur.join(pred, "doc_id").persist()
    # where the heuristic has REAL signal (>= 10% marker density —
    # several 'the'/'a' hits, not one stray 'a' in thirty jargon
    # words), the model must agree on every doc
    confident = both.filter(
        (F.col("predicted_lang") != "unknown")
        & (F.col("score_en") >= 0.10)
    )
    n_conf = confident.count()
    assert n_conf >= 20
    agree = confident.filter(
        F.col("predicted_lang") == F.col("model_lang")
    ).count()
    assert agree == n_conf, (
        f"model disagrees with the confident heuristic on "
        f"{n_conf - agree}/{n_conf} fixture docs"
    )
    # corpus-wide the two stay broadly consistent even on the
    # jargon-salad tail where the heuristic is guessing off a single
    # marker hit (documented disagreement zone)
    n_all = both.count()
    agree_all = both.filter(
        F.col("predicted_lang") == F.col("model_lang")
    ).count()
    assert agree_all / n_all >= 0.75, (agree_all, n_all)
    both.unpersist()


def test_save_load_identity(spark, labeled, tmp_path):
    """Predictions after save/load are row-identical: the featurizer
    reconstructed from the sidecar hashes bit-identically."""
    model = langid_train(labeled, n=3, n_features=1 << 14)
    path = str(tmp_path / "lid")
    langid_save(model, path)
    reloaded = langid_load(spark, path)
    a = {
        r.doc_id: (r.predicted, r.score)
        for r in langid_predict(labeled, model).collect()
    }
    b = {
        r.doc_id: (r.predicted, r.score)
        for r in langid_predict(labeled, reloaded).collect()
    }
    assert set(a) == set(b)
    for i in a:
        # labels exact; scores to the nbquality tolerance contract
        # (log-likelihood sums fold in shuffle order — documented
        # tolerance-stable, not bit-stable)
        assert a[i][0] == b[i][0]
        assert a[i][1] == pytest.approx(b[i][1], rel=1e-9)
    assert reloaded["char_n"] == 3 and reloaded["n_features"] == 1 << 14


def test_empty_and_null_docs_survive(spark, labeled):
    """Zero-feature docs (empty/null text) still appear, scored on
    priors alone with the deterministic label tie-break."""
    model = langid_train(labeled, n=3, n_features=1 << 14)
    odd = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id long, text string"
    )
    got = {r.doc_id: r.predicted for r in langid_predict(odd, model).collect()}
    assert set(got) == {1, 2, 3}
    # uniform priors (5 docs per language): alphabetical tie-break
    assert set(got.values()) == {"de"}


def test_char_ngram_features_shape(spark):
    """Boundary padding, lowercase, whitespace collapse, null->no
    features; validation."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "Ab  cD"), (2, None), (3, "x")], "i long, t string"
    )
    out = df.select(
        "i", F.size(char_ngram_features("t", 3, 1 << 10)).alias("n")
    ).collect()
    got = {r.i: r.n for r in out}
    # " ab cd " -> 5 trigrams; blank-only grams filtered
    assert got[1] == 5
    assert got[2] == 0
    # " x " -> 1 trigram
    assert got[3] == 1
    with pytest.raises(ValueError, match="n must be"):
        df.select(char_ngram_features("t", 0))


def test_cli_langid_lifecycle_and_curate_full(spark, tmp_path, capsys):
    """langid --op train -> --op predict -> curate-full
    --langid-model: the funnel's mixture sample stratifies on the
    PREDICTED language, so keep-rates bite even when the input has a
    wrong/missing lang column."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    rng = random.Random(7)
    rows = [
        (i * 100 + j, t, lang)
        for i, (lang, texts) in enumerate(sorted(SENTENCES.items()))
        for j, t in enumerate(texts)
    ]
    labeled_path = str(tmp_path / "labeled")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(labeled_path)
    model_dir = str(tmp_path / "lid_model")
    assert cli.main(
        [
            "langid", "--op", "train",
            "--input", labeled_path,
            "--model", model_dir,
            "--char-n", "3", "--n-features", str(1 << 14),
        ]
    ) == 0
    assert "trained char-3-gram NB" in capsys.readouterr().out

    # corpus with DELIBERATELY wrong lang metadata: every doc says
    # 'en', but half are German sentences
    def en_doc(seed):
        r = random.Random(seed)
        return " ".join(
            r.choice(["the", "quick", "brown", "fox", "jumps", "over",
                      "lazy", "dog", "walked", "school", "friends",
                      "table", "would", "weather"])
            for _ in range(25)
        )

    def de_doc(seed):
        r = random.Random(seed)
        return " ".join(
            r.choice(["der", "schnelle", "braune", "fuchs", "springt",
                      "über", "faulen", "hund", "schön", "würde",
                      "freunden", "schule", "hölzernen", "dinge"])
            for _ in range(25)
        )

    corpus = [(i, en_doc(i), "en") for i in range(20)]
    corpus += [(100 + i, de_doc(i), "en") for i in range(20)]
    rng.shuffle(corpus)
    corpus_path = str(tmp_path / "corpus")
    spark.createDataFrame(
        corpus, "doc_id long, text string, lang string"
    ).write.parquet(corpus_path)

    pred_path = str(tmp_path / "pred")
    assert cli.main(
        [
            "langid", "--op", "predict",
            "--input", corpus_path,
            "--model", model_dir,
            "--output", pred_path,
        ]
    ) == 0
    capsys.readouterr()
    pred = {
        r.doc_id: r.predicted
        for r in spark.read.parquet(pred_path).collect()
    }
    assert all(pred[i] == "en" for i in range(20))
    assert all(pred[100 + i] == "de" for i in range(20))

    # curate-full with keep-rates en=1.0, default 0: only docs the
    # MODEL calls English survive the mixture sample, despite every
    # row's metadata claiming 'en'
    out = str(tmp_path / "built")
    assert cli.main(
        [
            "curate-full",
            "--input", corpus_path,
            "--output", out,
            "--langid-model", model_dir,
            "--keep-rates", "en=1.0",
            "--default-rate", "0.0",
            "--min-quality", "0.0",
            "--boiler-min-docs", "1000",
            "--near-dup-threshold", "-1",
        ]
    ) == 0
    printed = capsys.readouterr().out
    assert "langid:40" in printed
    ids = {
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert ids == set(range(20)), sorted(ids)


def test_stream_curate_langid_relabel(spark, tmp_path, capsys):
    """stream-curate --langid-model (r14): per-micro-batch relabel —
    the written data and the hot-key monitor carry PREDICTED
    languages even when every incoming row's metadata claims 'en';
    replay writes nothing."""
    import glob
    import json

    import utc_cuip_kafka_aws_connector_spark.cli as cli

    rows = [
        (i * 100 + j, t, lang)
        for i, (lang, texts) in enumerate(sorted(SENTENCES.items()))
        for j, t in enumerate(texts)
    ]
    labeled_path = str(tmp_path / "labeled")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(labeled_path)
    model_dir = str(tmp_path / "lid")
    assert cli.main(
        ["langid", "--op", "train", "--input", labeled_path,
         "--model", model_dir, "--n-features", str(1 << 14)]
    ) == 0
    capsys.readouterr()

    incoming = tmp_path / "inc"
    incoming.mkdir()
    # held-out sentences, ALL claiming lang=en; quality gate off
    (incoming / "b0.jsonl").write_text(
        "\n".join(
            json.dumps({"doc_id": i, "text": t, "lang": "en"})
            for i, (lang, t) in enumerate(sorted(HELD_OUT.items()))
        )
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    args = [
        "stream-curate", "--input", str(incoming), "--output", out,
        "--checkpoint", ck, "--min-quality", "0.0",
        "--langid-model", model_dir, "--hot-key-col", "lang",
    ]
    assert cli.main(args) == 0
    capsys.readouterr()
    got = {
        r.doc_id: r.lang
        for r in spark.read.option("basePath", f"{out}/data")
        .parquet(f"{out}/data/batch_id=*")
        .collect()
    }
    want = {i: lang for i, (lang, _t) in enumerate(sorted(HELD_OUT.items()))}
    assert got == want
    hot = {
        (r["lang"], r["n"])
        for r in spark.read.parquet(f"{out}/_monitor/hotkeys/batch_id=*").collect()
    }
    assert hot == {("de", 1), ("en", 1), ("es", 1), ("fr", 1)}
    # replay: nothing changes
    n_dirs = len(glob.glob(f"{out}/data/batch_id=*"))
    assert cli.main(args) == 0
    capsys.readouterr()
    assert len(glob.glob(f"{out}/data/batch_id=*")) == n_dirs
