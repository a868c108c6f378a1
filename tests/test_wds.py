"""WebDataset-style tar shards (sources/wds.py): interop with
stdlib-authored tars, exact round trip, sample grouping, extension
pruning, corrupt-shard policy, deterministic shard bytes.
"""

from __future__ import annotations

import io
import tarfile

import pytest

from utc_cuip_kafka_aws_connector_spark.sources.wds import (
    group_samples,
    read_tar_shards,
    save_tar_shards,
    write_tar_shards,
)

SAMPLES = [
    ("s0", "a01", "jpg", b"\xff\xd8JPEGBYTES"),
    ("s0", "a01", "txt", b"a caption"),
    ("s0", "a01", "json", b'{"w": 2}'),
    ("s0", "a02", "jpg", b"MOREJPEG"),
    ("s0", "a02", "txt", b"second"),
    ("s1", "b01", "wav", b"RIFFWAVE"),
    ("s1", "b01", "txt", b"audio transcript"),
]


def _author_tars(tmp_path):
    """Write the fixture with stdlib tarfile only — proves the reader
    consumes EXTERNAL WebDataset layouts, not just its own writer."""
    import pathlib

    tmp_path = pathlib.Path(tmp_path)
    tmp_path.mkdir(parents=True, exist_ok=True)
    by_shard: dict[str, list] = {}
    for shard, key, ext, content in SAMPLES:
        by_shard.setdefault(shard, []).append((key, ext, content))
    for shard, entries in by_shard.items():
        with tarfile.open(tmp_path / f"{shard}.tar", "w") as tf:
            for key, ext, content in entries:
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(content)
                tf.addfile(info, io.BytesIO(content))
    return str(tmp_path)


def test_read_external_tars(spark, tmp_path):
    root = _author_tars(tmp_path)
    got = sorted(
        (r["shard"], r["key"], r["ext"], bytes(r["content"]))
        for r in read_tar_shards(spark, root).collect()
    )
    assert got == sorted(SAMPLES)


def test_extension_pruning(spark, tmp_path):
    root = _author_tars(tmp_path)
    got = read_tar_shards(spark, root, extensions=["txt"]).collect()
    assert {r["ext"] for r in got} == {"txt"}
    assert len(got) == 3


def test_group_samples_map_shape(spark, tmp_path):
    root = _author_tars(tmp_path)
    rows = {
        (r["shard"], r["key"]): r["parts"]
        for r in group_samples(read_tar_shards(spark, root)).collect()
    }
    assert set(rows) == {("s0", "a01"), ("s0", "a02"), ("s1", "b01")}
    a01 = rows[("s0", "a01")]
    assert set(a01) == {"jpg", "txt", "json"}
    assert bytes(a01["txt"]) == b"a caption"


def test_write_read_round_trip_and_determinism(spark, tmp_path):
    df = spark.createDataFrame(
        SAMPLES, "shard string, key string, ext string, content binary"
    )
    tars = write_tar_shards(df).collect()
    assert {r["shard"] for r in tars} == {"s0", "s1"}
    # deterministic bytes: rebuilding from a different layout matches
    tars2 = write_tar_shards(df.repartition(5)).collect()
    assert {r["shard"]: bytes(r["tar"]) for r in tars} == {
        r["shard"]: bytes(r["tar"]) for r in tars2
    }
    # entries are sample-contiguous (WebDataset contract)
    for r in tars:
        with tarfile.open(fileobj=io.BytesIO(bytes(r["tar"]))) as tf:
            keys = [m.name.partition(".")[0] for m in tf.getmembers()]
        seen = set()
        for prev, cur in zip(keys, keys[1:]):
            if cur != prev:
                assert cur not in seen, (r["shard"], keys)
                seen.add(prev)

    out = str(tmp_path / "round")
    n = save_tar_shards(
        spark, write_tar_shards(df), out
    )
    assert n == 2
    back = sorted(
        (r["shard"], r["key"], r["ext"], bytes(r["content"]))
        for r in read_tar_shards(spark, out).collect()
    )
    assert back == sorted(SAMPLES)


def test_corrupt_shard_policy(spark, tmp_path):
    root = _author_tars(tmp_path)
    (tmp_path / "broken.tar").write_bytes(b"this is not a tar file!!")
    with pytest.raises(Exception, match="corrupt tar shard"):
        read_tar_shards(spark, root).collect()
    got = read_tar_shards(spark, root, on_error="skip").collect()
    assert len(got) == len(SAMPLES)  # good shards still land
    with pytest.raises(ValueError, match="on_error"):
        read_tar_shards(spark, root, on_error="ignore")


def test_feeds_multimodal_decoder(spark, tmp_path):
    """Bridge check: a WAV entry read from a tar decodes through the
    existing multimodal audio path."""
    import struct

    sr, nch, bits, frames = 8000, 1, 16, 4
    data = b"\x00\x01" * frames
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, nch, sr, sr * 2, 2, bits)
        + b"data"
        + struct.pack("<I", len(data))
    )
    with tarfile.open(tmp_path / "av.tar", "w") as tf:
        info = tarfile.TarInfo(name="clip0.wav")
        payload = hdr + data
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))

    from utc_cuip_kafka_aws_connector_spark.operators.multimodal import (
        extract_audio_meta,
    )

    entries = read_tar_shards(spark, str(tmp_path)).where(
        "ext = 'wav'"
    )
    av = entries.selectExpr(
        "xxhash64(key) as doc_id", "content as payload"
    )
    row = extract_audio_meta(av).collect()[0]
    assert row["err"] is None
    assert row["sample_rate"] == sr
    assert row["channels"] == nch
    assert row["n_frames"] == frames


def test_cli_wds_import_export(spark, tmp_path, capsys):
    """wds --op import/export: tars -> entry parquet -> tars -> the
    same entries; --samples imports the map shape."""
    import utc_cuip_kafka_aws_connector_spark.cli as cli

    root = _author_tars(tmp_path / "tars_in")
    entries = str(tmp_path / "entries")
    assert cli.main(
        ["wds", "--op", "import", "--input", root, "--output", entries]
    ) == 0
    assert f"imported {len(SAMPLES)} entries" in capsys.readouterr().out

    tars_out = str(tmp_path / "tars_out")
    assert cli.main(
        ["wds", "--op", "export", "--input", entries, "--output", tars_out]
    ) == 0
    assert "exported 2 tar shards" in capsys.readouterr().out
    back = sorted(
        (r["shard"], r["key"], r["ext"], bytes(r["content"]))
        for r in read_tar_shards(spark, tars_out).collect()
    )
    assert back == sorted(SAMPLES)

    samples = str(tmp_path / "samples")
    assert cli.main(
        ["wds", "--op", "import", "--input", root, "--output", samples,
         "--samples", "--extensions", "txt,json"]
    ) == 0
    assert "imported 3 samples" in capsys.readouterr().out
    got = spark.read.parquet(samples).collect()
    assert all(set(r["parts"]) <= {"txt", "json"} for r in got)


def test_skip_mode_never_emits_partial_shards(spark, tmp_path):
    """A tar whose INDEX parses but whose data region is truncated
    must contribute zero entries under on_error='skip' — partial
    samples are worse than dropped shards."""
    root = _author_tars(tmp_path)
    good = tarfile.open(tmp_path / "s0.tar").getmembers()
    assert good  # fixture sanity
    # craft a truncated shard: valid headers, cut mid-data
    whole = (tmp_path / "s0.tar").read_bytes()
    (tmp_path / "cut.tar").write_bytes(whole[: 512 + 4])
    entries = read_tar_shards(spark, root, on_error="skip").collect()
    shards = {r["shard"] for r in entries}
    assert "cut" not in shards          # nothing partial leaked
    assert len(entries) == len(SAMPLES)


def test_directory_structured_tars_keep_full_path_keys(spark, tmp_path):
    """The WebDataset convention keys a sample by the FULL member
    path minus extension (ADVICE r12): tars built by tarring a tree
    (including './' prefixes) must NOT merge distinct samples that
    share a basename, and import->export must preserve the layout."""
    import pathlib

    root = pathlib.Path(tmp_path) / "tree"
    root.mkdir(parents=True)
    members = [
        ("./train/000/img.jpg", b"J0"),
        ("./train/000/img.txt", b"caption zero"),
        ("./train/001/img.jpg", b"J1"),
        ("./train/001/img.txt", b"caption one"),
    ]
    with tarfile.open(root / "t0.tar", "w") as tf:
        for name, content in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(content)
            tf.addfile(info, io.BytesIO(content))

    entries = read_tar_shards(spark, str(root))
    got = sorted(
        (r["key"], r["ext"], bytes(r["content"])) for r in entries.collect()
    )
    assert got == [
        ("train/000/img", "jpg", b"J0"),
        ("train/000/img", "txt", b"caption zero"),
        ("train/001/img", "jpg", b"J1"),
        ("train/001/img", "txt", b"caption one"),
    ]
    # two distinct samples, not one merged basename bucket
    samples = group_samples(entries).collect()
    assert sorted(r["key"] for r in samples) == [
        "train/000/img",
        "train/001/img",
    ]
    # round trip: the directory layout survives in the member names
    tars = write_tar_shards(entries)
    blob = bytes(tars.collect()[0]["tar"])
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        assert sorted(m.name for m in tf.getmembers()) == [
            "train/000/img.jpg",
            "train/000/img.txt",
            "train/001/img.jpg",
            "train/001/img.txt",
        ]
