"""operators/imagedup.py: perceptual image dedup (dHash + Hamming)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.imagedup import (
    dhash,
    image_dhash,
    image_near_dups,
)


def _ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def _bmp(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    row = (w * 3 + 3) & ~3
    pad = row - w * 3
    raster = b"".join(
        img[y, :, ::-1].astype(np.uint8).tobytes() + b"\0" * pad
        for y in range(h - 1, -1, -1)  # bottom-up
    )
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    )
    return header + raster


def _img(seed: int, h=32, w=40) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(40, 200, size=(h, w, 3)).astype(np.int64)


@pytest.fixture(scope="module")
def gallery(spark):
    base = _img(1)
    rows = [
        (0, bytearray(_ppm(base))),
        (1, bytearray(_ppm(np.clip(base + 20, 0, 255)))),  # brightness shift
        (2, bytearray(_bmp(base))),  # same pixels, other container
        (3, bytearray(_ppm(_img(2)))),  # different photo
        (4, bytearray(_ppm(_img(3)))),  # different photo
        (5, bytearray(b"GIF89a not decodable here")),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_hashes_and_error_isolation(spark, gallery):
    rows = {r.doc_id: r for r in image_dhash(gallery).collect()}
    assert len(rows) == 6
    assert rows[5].dhash is None and "NotImplementedError" in rows[5].error
    assert all(rows[i].dhash is not None for i in range(5))
    # brightness shift: gradient-identical -> same hash
    assert rows[0].dhash == rows[1].dhash
    # same pixels through the BMP decoder -> same hash
    assert rows[0].dhash == rows[2].dhash
    # different photos -> far apart
    d = bin((rows[0].dhash ^ rows[3].dhash) & ((1 << 64) - 1)).count("1")
    assert d > 10


def test_near_dups_and_clusters(spark, gallery):
    hashed = image_dhash(gallery)
    pairs = image_near_dups(hashed, max_distance=6)
    got = {(r.id_a, r.id_b): r.distance for r in pairs.collect()}
    assert set(got) == {(0, 1), (0, 2), (1, 2)}
    assert all(d == 0 for d in got.values())
    from utc_cuip_kafka_aws_connector_spark.operators.dedup import dedup_clusters

    comp = dedup_clusters(
        hashed.filter(F.col("dhash").isNotNull()).select("doc_id"),
        pairs,
        id_col="doc_id",
        src="id_a",
        dst="id_b",
    )
    rows = {r.doc_id: (r.component, r.keep) for r in comp.collect()}
    assert rows[0] == (0, True) and rows[1] == (0, False) and rows[2] == (0, False)
    assert rows[3][1] and rows[4][1]


def test_banding_completeness_matches_bruteforce(spark):
    """Property: for hashes within max_distance <= bands-1, the banded
    join finds EVERY pair the brute-force Hamming scan finds."""
    rng = np.random.RandomState(9)
    bases = rng.randint(0, 1 << 63, size=8, dtype=np.int64)
    rows, rid = [], 0
    for b in bases:
        rows.append((rid, int(b)))
        rid += 1
        flip = int(b)
        for bit in rng.choice(64, size=6, replace=False):
            flip ^= 1 << int(bit)  # exactly 6 bits away
        flip &= (1 << 64) - 1
        rows.append((rid, flip - (1 << 64) if flip >= 1 << 63 else flip))
        rid += 1
    hashed = spark.createDataFrame(rows, "doc_id long, dhash long")
    got = {(r.id_a, r.id_b) for r in image_near_dups(hashed, max_distance=6).collect()}
    want = set()
    for i, ha in rows:
        for j, hb in rows:
            if i < j and bin((ha ^ hb) & ((1 << 64) - 1)).count("1") <= 6:
                want.add((i, j))
    assert got == want and want  # non-degenerate


def test_verify_is_jvm_side(spark):
    from tests.plan_utils import formatted_plan

    hashed = spark.createDataFrame([(0, 5), (1, 7)], "doc_id long, dhash long")
    plan = formatted_plan(image_near_dups(hashed, max_distance=3, bands=4))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_validation(spark):
    hashed = spark.createDataFrame([(0, 5)], "doc_id long, dhash long")
    with pytest.raises(ValueError, match="divide"):
        image_near_dups(hashed, bands=7)
    with pytest.raises(ValueError, match="completeness"):
        image_near_dups(hashed, max_distance=8, bands=8)
    df = spark.createDataFrame([(0, bytearray(b"P6"))], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="hash_size"):
        image_dhash(df, hash_size=9)
