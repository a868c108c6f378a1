"""operators/lenbatch.py: length-bucketed padded batch assembly.

Evidence: an exact pure-pandas replay differential (bucketing, md5
sharding, (len, id) sort, chunking, per-batch dynamic pad_to and the
remainder flag all reach the comparison), the integer-exact
floor-log2 bucket law near power-of-two edges, explicit-boundary and
overflow-bucket semantics, conservation (every eligible row lands in
exactly one batch; no batch exceeds batch_size; at most one
remainder per (bucket, shard)), the economics claim (length order
never pads more than the hash baseline on the same corpus, strictly
less on a length-skewed one), report arithmetic recomputed by hand,
and null/non-positive eligibility.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.lenbatch import (
    bucketed_batches,
    padding_report,
)


def _corpus(spark, n=400, seed=5):
    import random

    rng = random.Random(seed)
    rows = [(i, rng.choice([3, 7, 9, 15, 16, 17, 40, 300, 2000])) for i in range(n)]
    rows += [(9001, None), (None, 10), (9002, 0), (9003, -4)]  # dropped
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def _replay(pdf: pd.DataFrame, batch_size, shard_hex, boundaries, order):
    pdf = pdf.dropna(subset=["doc_id", "n_tokens"])
    pdf = pdf[pdf["n_tokens"] > 0].copy()
    if boundaries is None:
        pdf["bucket"] = pdf["n_tokens"].astype("int64").apply(
            lambda v: v.bit_length() - 1
        )
    else:
        def bk(v):
            for i, b in enumerate(boundaries):
                if v <= b:
                    return i
            return len(boundaries)

        pdf["bucket"] = pdf["n_tokens"].apply(bk)
    pdf["shard"] = (
        pdf["doc_id"].astype("int64").astype(str).apply(
            lambda s: hashlib.md5(s.encode()).hexdigest()[:shard_hex]
        )
        if shard_hex
        else ""
    )
    pdf["_ord"] = pdf["doc_id"].astype("int64").astype(str).apply(
        lambda s: hashlib.md5((s + ":batch").encode()).hexdigest()
    )
    out = []
    for (b, s), g in pdf.groupby(["bucket", "shard"], sort=False):
        keys = ["n_tokens", "doc_id"] if order == "length" else ["_ord", "doc_id"]
        g = g.sort_values(keys, kind="mergesort").reset_index(drop=True)
        idx = g.index.to_numpy() // batch_size
        pad_to = g["n_tokens"].astype("int64").groupby(idx).transform("max")
        short = len(g) % batch_size != 0
        out.append(
            g.assign(
                batch_idx=idx,
                pad_to=pad_to,
                pad=pad_to - g["n_tokens"].astype("int64"),
                is_remainder=short & (idx == idx[-1]),
            ).drop(columns=["_ord"])
        )
    return pd.concat(out).reset_index(drop=True)


@pytest.mark.parametrize(
    "boundaries,order,shard_hex",
    [(None, "length", 1), ([16, 64, 512], "length", 1),
     (None, "hash", 1), (None, "length", 0)],
    ids=["pow2", "bounds", "hash-order", "unsharded"],
)
def test_matches_pandas_replay_exactly(spark, boundaries, order, shard_hex):
    df = _corpus(spark)
    got = (
        bucketed_batches(
            df, batch_size=8, boundaries=boundaries,
            shard_hex=shard_hex, order=order,
        )
        .toPandas()
        .sort_values(["bucket", "shard", "batch_idx", "doc_id"])
        .reset_index(drop=True)
    )
    want = (
        _replay(df.toPandas(), 8, shard_hex, boundaries, order)
        .sort_values(["bucket", "shard", "batch_idx", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "n_tokens": "int64"}),
        want.astype(
            {c: got[c].dtype.name for c in got.columns}
        )[got.columns.tolist()],
        check_exact=True,
    )


def test_pow2_bucket_law_at_edges(spark):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([1, 2, 3, 4, 7, 8, 1023, 1024, 1025])],
        "doc_id long, n_tokens long",
    )
    got = {
        r["n_tokens"]: r["bucket"]
        for r in bucketed_batches(df, batch_size=4, shard_hex=0).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 7: 2, 8: 3, 1023: 9, 1024: 10, 1025: 10}


def test_conservation_and_batch_shape(spark):
    df = _corpus(spark)
    out = bucketed_batches(df, batch_size=8).cache()
    eligible = df.filter(
        F.col("doc_id").isNotNull()
        & F.col("n_tokens").isNotNull()
        & (F.col("n_tokens") > 0)
    ).count()
    assert out.count() == eligible
    sizes = out.groupBy("bucket", "shard", "batch_idx").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("pad_to").alias("mx"),
        F.max("n_tokens").alias("mt"),
        F.max(F.col("is_remainder").cast("int")).alias("rem"),
        F.min(F.col("is_remainder").cast("int")).alias("rem_min"),
    )
    rows = sizes.collect()
    assert all(r["n"] <= 8 for r in rows)
    # non-remainder batches are exactly full; flag is batch-uniform
    assert all(r["n"] == 8 or r["rem"] == 1 for r in rows)
    assert all(r["rem"] == r["rem_min"] for r in rows)
    # pad_to is the batch's own max length
    assert all(r["mx"] == r["mt"] for r in rows)
    # at most one remainder batch per (bucket, shard)
    rem_per_group = (
        sizes.filter(F.col("rem") == 1)
        .groupBy("bucket", "shard")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in rem_per_group)
    out.unpersist()


def test_length_order_beats_hash_baseline(spark):
    # one bucket (wide boundary) + skewed lengths: sorted chunks pad
    # far less than hash-ordered chunks
    import random

    rng = random.Random(1)
    df = spark.createDataFrame(
        [(i, rng.choice([4, 8, 1000])) for i in range(300)],
        "doc_id long, n_tokens long",
    )
    kw = dict(batch_size=16, boundaries=[1_000_000], shard_hex=0)
    w_len = padding_report(
        bucketed_batches(df, order="length", **kw)
    ).head()["waste_frac"]
    w_hash = padding_report(
        bucketed_batches(df, order="hash", **kw)
    ).head()["waste_frac"]
    assert w_len < w_hash * 0.5, (w_len, w_hash)
    # and pow2 bucketing alone (hash order within buckets) also beats
    # the single-bucket hash baseline: the buckets carry the win
    w_bucketed_hash = padding_report(
        bucketed_batches(df, order="hash", batch_size=16, shard_hex=0)
    ).head()["waste_frac"]
    assert w_bucketed_hash < w_hash, (w_bucketed_hash, w_hash)


def test_padding_report_arithmetic(spark):
    df = spark.createDataFrame(
        [(1, 3), (2, 5), (3, 5), (4, 6), (5, 7)],
        "doc_id long, n_tokens long",
    )
    # one bucket, no shards, batch_size 2, sorted: batches
    # [3,5](pad 2), [5,6](pad 1), [7](pad 0, remainder)
    out = bucketed_batches(
        df, batch_size=2, boundaries=[100], shard_hex=0
    )
    r = padding_report(out).head()
    assert (r["n_rows"], r["n_batches"], r["n_remainder_batches"]) == (5, 3, 1)
    assert (r["real_tokens"], r["pad_tokens"]) == (26, 3)
    assert r["waste_frac"] == pytest.approx(3 / 29)
    by_b = padding_report(out, by_bucket=True).collect()
    assert len(by_b) == 1 and by_b[0]["bucket"] == 0
    assert by_b[0]["pad_tokens"] == 3


def test_validation_errors(spark):
    df = spark.createDataFrame([(1, 3)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="batch_size"):
        bucketed_batches(df, batch_size=0)
    with pytest.raises(ValueError, match="shard_hex"):
        bucketed_batches(df, shard_hex=-1)
    with pytest.raises(ValueError, match="order"):
        bucketed_batches(df, order="nope")
    with pytest.raises(ValueError, match="boundaries"):
        bucketed_batches(df, boundaries=[10, 10])
    with pytest.raises(ValueError, match="boundaries"):
        bucketed_batches(df, boundaries=[])


def test_refuses_generated_column_collisions(spark):
    """Review r17: the operator generates fixed column names; an
    input already carrying one must be refused (silently clobbering
    'bucket', or duplicating 'batch_idx' in the applyInPandas
    schema, is the collision class cli._require_cols_absent exists
    for)."""
    for col, typ in [("bucket", "long"), ("batch_idx", "long"),
                     ("is_remainder", "boolean")]:
        df = spark.createDataFrame(
            [], f"doc_id long, n_tokens long, {col} {typ}"
        )
        with pytest.raises(ValueError, match=col):
            bucketed_batches(df)


def test_length_order_plan_skips_hash_key(spark):
    """Review r17: the md5 baseline sort key must not be computed
    (nor ride the shuffle) on the default length path — it exists
    only for order='hash'."""
    from tests.plan_utils import formatted_plan

    df = spark.createDataFrame([(1, 3)], "doc_id long, n_tokens long")
    assert ":batch" not in formatted_plan(bucketed_batches(df, order="length"))
    assert ":batch" in formatted_plan(bucketed_batches(df, order="hash"))
