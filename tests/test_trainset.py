"""operators/trainset.py + the `trainset` CLI verb: the corpus ->
training-shards capstone (allocation -> replica rows -> packed
windows | padded batches -> manifest-verified shards).

Evidence: exact replica accounting against the allocation (integer
epochs: counts are laws, not statistics; fractional epochs: the CLI
output equals the direct operator composition row-for-row under the
same salt), manifest verification on the written shards (and a
corruption actually failing it), token-conservation through packing,
shuffle-seed determinism, and the column-clash refusal doctrine.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.shardwrite import (
    verify_shards,
)
from utc_cuip_kafka_aws_connector_spark.operators.trainset import (
    packed_training_shards,
    padded_training_shards,
    replica_rows,
)


def _corpus(spark):
    """30 docs: en 20 (lengths 2..6), de 10 (lengths 3..5)."""
    rows = [(i, "en", list(range(2 + i % 5))) for i in range(20)]
    rows += [(100 + i, "de", list(range(3 + i % 3))) for i in range(10)]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, token_ids array<int>"
    )


def _alloc(spark, en=2.0, de=1.0):
    return spark.createDataFrame(
        [("en", en), ("de", de)], "lang string, epochs double"
    )


def test_cli_trainset_packed_lifecycle(spark, tmp_path, capsys):
    """The end-to-end loop: integer allocation -> packed shards whose
    manifest verifies and whose totals obey exact conservation laws
    (docs = sum n*e; tokens = sum (len+eos) * e — no truncation at
    this context length)."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "corpus")
    _corpus(spark).write.parquet(src)
    alloc = str(tmp_path / "alloc")
    _alloc(spark).write.parquet(alloc)
    dest = str(tmp_path / "shards")
    assert cli.main(
        ["trainset", "--input", src, "--alloc", alloc, "--output", dest,
         "--mode", "packed", "--context-len", "16", "--pad-id", "0",
         "--eos-id", "99"]
    ) == 0
    out = capsys.readouterr().out
    assert "manifest verified" in out

    packed = spark.read.parquet(dest)
    tot = packed.agg(
        F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")
    ).first()
    # en: 20 docs x 2 epochs, de: 10 x 1 -> 50 packed documents
    assert tot["d"] == 50
    # token conservation: every doc carries len+1 (eos) tokens, no
    # doc exceeds context_len=16 so nothing truncates
    lens = {r["doc_id"]: len(r["token_ids"]) for r in _corpus(spark).collect()}
    expect = sum((lens[i] + 1) * 2 for i in range(20)) + sum(
        (lens[100 + i] + 1) for i in range(10)
    )
    assert tot["t"] == expect
    # manifest accounting: n_docs there counts SEQUENCES per shard,
    # and every written window is exactly context_len wide (padding
    # included in the manifest's token sum)
    man = spark.read.parquet(dest + "_manifest").agg(
        F.sum("n_docs").alias("seqs"), F.sum("n_tokens").alias("t")
    ).first()
    assert man["seqs"] == packed.count()
    assert man["t"] == packed.count() * 16
    # the written shards verify independently too
    assert verify_shards(
        spark, dest, "seq_id", "input_ids", "shard"
    ).count() == 0
    assert packed.filter(F.size("input_ids") != 16).count() == 0
    assert packed.filter(F.col("truncated")).count() == 0


def test_cli_trainset_padded_replica_accounting(spark, tmp_path, capsys):
    """Padded shards keep group/replica columns, so the allocation is
    auditable from the output itself: integer epochs give exact
    per-group counts; a fractional group matches the direct operator
    composition row-for-row (same salt -> same draws)."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "corpus")
    _corpus(spark).write.parquet(src)
    alloc = str(tmp_path / "alloc")
    _alloc(spark, en=2.0, de=0.4).write.parquet(alloc)
    dest = str(tmp_path / "shards")
    assert cli.main(
        ["trainset", "--input", src, "--alloc", alloc, "--output", dest,
         "--mode", "padded", "--batch-size", "4", "--shard-hex", "0"]
    ) == 0
    assert "manifest verified" in capsys.readouterr().out

    back = spark.read.parquet(dest)
    counts = {
        r["lang"]: r["n"]
        for r in back.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts["en"] == 40  # 20 docs x exactly 2 epochs
    # de at 0.4 epochs: the deterministic subsample — equal to the
    # operator composition under the same salt
    direct = replica_rows(_corpus(spark), _alloc(spark, en=2.0, de=0.4))
    want = sorted(
        r["example_id"] for r in direct.collect() if r["lang"] == "de"
    )
    got = sorted(r["example_id"] for r in back.collect() if r["lang"] == "de")
    assert got == want
    assert verify_shards(
        spark, dest, "example_id", "token_ids", "train_shard"
    ).count() == 0
    # batch metadata survived the write (the reason write_training_
    # shards keeps all columns)
    assert {"batch_idx", "pad_to", "pad", "is_remainder"} <= set(back.columns)


def test_shuffle_seed_is_deterministic_and_scatters(spark, tmp_path):
    """Same seed -> byte-identical manifests on re-run; the seeded id
    prefix actually permutes the fill order (different seed -> a
    different packing)."""
    df, al = _corpus(spark), _alloc(spark)
    p1, p2, p3 = (str(tmp_path / n) for n in ("a", "b", "c"))
    m1 = packed_training_shards(
        df, al, p1, context_len=16, pad_id=0, shuffle_seed=7
    ).collect()
    m2 = packed_training_shards(
        df, al, p2, context_len=16, pad_id=0, shuffle_seed=7
    ).collect()
    assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))
    m3 = packed_training_shards(
        df, al, p3, context_len=16, pad_id=0, shuffle_seed=8
    ).collect()
    assert sorted(map(tuple, m1)) != sorted(map(tuple, m3))


def test_verification_catches_corruption(spark, tmp_path):
    """Deleting a written shard partition makes verify_shards
    non-empty — the manifest is a real integrity check, not
    decoration."""
    import shutil

    df, al = _corpus(spark), _alloc(spark)
    dest = str(tmp_path / "shards")
    packed_training_shards(df, al, dest, context_len=16, pad_id=0)
    assert verify_shards(
        spark, dest, "seq_id", "input_ids", "shard"
    ).count() == 0
    # drop one hive partition
    import os

    part = next(
        p for p in os.listdir(dest) if p.startswith("shard=")
    )
    shutil.rmtree(os.path.join(dest, part))
    assert verify_shards(
        spark, dest, "seq_id", "input_ids", "shard"
    ).count() > 0


def test_replica_rows_contract(spark):
    """Unique example ids by construction; clash refusal; seeded ids
    preserve the (group, doc, replica) suffix for auditability."""
    df, al = _corpus(spark), _alloc(spark)
    rows = replica_rows(df, al)
    n = rows.count()
    assert rows.select("example_id").distinct().count() == n == 50
    seeded = replica_rows(df, al, shuffle_seed=3)
    assert seeded.filter(
        ~F.col("example_id").rlike("^[0-9A-F]{16}#[a-z]+#[0-9]+#[0-9]+$")
    ).count() == 0
    with pytest.raises(ValueError, match="example_id"):
        replica_rows(rows, al)


def test_replica_rows_same_doc_id_in_two_groups_never_collides(spark):
    """ADVICE r18 (the round's medium): replica numbering restarts
    per group, so a doc_id present in TWO groups used to collide on
    <doc_id>#<replica> — per-(group,id) validation could not catch
    it. The group now rides in the id and in the shuffle hash."""
    df = spark.createDataFrame(
        [(1, "en", [0, 1]), (1, "de", [0, 1, 2]), (2, "en", [0])],
        "doc_id long, lang string, token_ids array<int>",
    )
    al = _alloc(spark, en=2.0, de=2.0)
    rows = replica_rows(df, al)
    n = rows.count()
    assert n == 6  # (2 en docs + 1 de doc) x 2 epochs
    assert rows.select("example_id").distinct().count() == n
    got = sorted(
        r["example_id"] for r in rows.filter("doc_id = 1").collect()
    )
    assert got == ["de#1#0", "de#1#1", "en#1#0", "en#1#1"]
    # seeded: the permutation key hashes the group too, so the two
    # groups' replicas of doc 1 get distinct prefixes (and stay
    # globally unique)
    seeded = replica_rows(df, al, shuffle_seed=3)
    assert seeded.select("example_id").distinct().count() == n


def test_cli_trainset_packed_requires_context_len(spark, tmp_path):
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "c")
    _corpus(spark).write.parquet(src)
    alloc = str(tmp_path / "a")
    _alloc(spark).write.parquet(alloc)
    with pytest.raises(SystemExit) as exc:
        cli.main(
            ["trainset", "--input", src, "--alloc", alloc,
             "--output", str(tmp_path / "s")]
        )
    assert exc.value.code == 2


def test_duplicate_corpus_ids_refused_by_default(spark, tmp_path):
    """Review r18: duplicate (group, doc_id) corpus rows would
    collide example ids and make shard assignment layout-dependent —
    the capstone refuses by default; the documented opt-out skips
    the check for upstream-deduped corpora."""
    dup = _corpus(spark).union(_corpus(spark).limit(1))
    with pytest.raises(ValueError, match="duplicate id"):
        packed_training_shards(
            dup, _alloc(spark), str(tmp_path / "s"), context_len=16,
            pad_id=0,
        )
    # the opt-out still runs end-to-end (caller takes the risk)
    packed_training_shards(
        dup, _alloc(spark), str(tmp_path / "s2"), context_len=16,
        pad_id=0, validate_unique_ids=False,
    )


def test_empty_allocation_refused_loudly(spark, tmp_path):
    """Review r18: an allocation matching no corpus groups must
    refuse with a clear message, not crash verify_shards on an
    unreadable all-partition empty parquet dir."""
    bad_alloc = spark.createDataFrame(
        [("EN", 2.0)], "lang string, epochs double"  # case mismatch
    )
    with pytest.raises(ValueError, match="ZERO examples"):
        packed_training_shards(
            _corpus(spark), bad_alloc, str(tmp_path / "s"),
            context_len=16, pad_id=0,
        )


def test_cli_no_validate_ids_flag(spark, tmp_path, capsys):
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "corpus")
    _corpus(spark).union(_corpus(spark).limit(1)).write.parquet(src)
    alloc = str(tmp_path / "alloc")
    _alloc(spark).write.parquet(alloc)
    argv = ["trainset", "--input", src, "--alloc", alloc,
            "--output", str(tmp_path / "shards"),
            "--mode", "packed", "--context-len", "16"]
    with pytest.raises(ValueError, match="duplicate id"):
        cli.main(argv)
    assert cli.main(argv + ["--no-validate-ids"]) == 0
    assert "manifest verified" in capsys.readouterr().out


def test_cli_trainset_budget_full_mixture_loop(spark, tmp_path, capsys):
    """The one-verb corpus-to-shards loop: mixture WEIGHTS + a token
    budget convert through allocation_from_weights (token-mass
    sizes), then materialize, pack, write, verify. Exact accounting:
    en/de token masses are known, so the converted epochs — and
    therefore the packed doc totals — are laws."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    src = str(tmp_path / "corpus")
    _corpus(spark).write.parquet(src)
    weights = str(tmp_path / "weights")
    spark.createDataFrame(
        [("en", 0.5), ("de", 0.5)], "lang string, weight double"
    ).write.parquet(weights)
    # token masses: en = sum(2..6 pattern) = 20 docs avg 4 = 80;
    # de = 10 docs of 3+i%3 -> 3,4,5 repeating = 39
    # budget 160 -> en epochs = 80/80 = 1.0, de = 80/39 ~ 2.051
    dest = str(tmp_path / "shards")
    assert cli.main(
        ["trainset", "--input", src, "--alloc", weights, "--output", dest,
         "--mode", "padded", "--budget", "160", "--shard-hex", "0"]
    ) == 0
    assert "manifest verified" in capsys.readouterr().out
    back = spark.read.parquet(dest)
    counts = {
        r["lang"]: r["n"]
        for r in back.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts["en"] == 20  # exactly 1.0 epochs
    # de at ~2.051: every doc twice plus a deterministic ~5% third
    assert 20 <= counts["de"] <= 30
    with pytest.raises(SystemExit):
        cli.main(
            ["trainset", "--input", src, "--alloc", weights,
             "--output", dest, "--budget", "160",
             "--epochs-col", "reps", "--mode", "padded"]
        )


def test_replica_rows_ids_injective_with_separator_in_keys(spark):
    """Review r19: with two variable-width fields in the composite
    id, an unescaped '#' would alias (group='a#1', doc='b') with
    (group='a', doc='1#b'). Fields are backslash-escaped, so the
    crafted collision stays two distinct ids."""
    df = spark.createDataFrame(
        [("b", "a#1", [0, 1]), ("1#b", "a", [0, 1])],
        "doc_id string, lang string, token_ids array<int>",
    )
    al = spark.createDataFrame(
        [("a#1", 1.0), ("a", 1.0)], "lang string, epochs double"
    )
    rows = replica_rows(df, al)
    got = sorted(r["example_id"] for r in rows.collect())
    assert len(got) == 2 and got[0] != got[1]
    assert got == [r"a#1\#b#0", r"a\#1#b#0"]
