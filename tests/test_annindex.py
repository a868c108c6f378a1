"""operators/annindex.py: the composed PCA -> IVF -> PQ index.

Pins: (a) the exactness escape hatch — with every cell probed and a
corpus-wide shortlist, search == flat brute-force top-k exactly;
(b) default-knob recall against brute force; (c) the save/load
round-trip including partition-pruned probes; (d) the PCA front-end
composes without breaking either.
"""

from __future__ import annotations

import posixpath

import numpy as np
import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.annindex import (
    ann_encode,
    ann_fit,
    ann_load,
    ann_save,
    ann_search,
)

N, D = 600, 16


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(8, D) * 3.0  # 8 latent clusters
    rows = [
        (i, [float(v) for v in base[i % 8] + rng.randn(D) * 0.5])
        for i in range(N)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8)


def _flat_topk(corpus, q, k):
    qarr = F.array(*[F.lit(float(x)) for x in q])
    diff = F.zip_with(F.col("embedding"), qarr, lambda x, y: x - y)
    dist = F.aggregate(
        F.transform(diff, lambda v: v * v), F.lit(0.0), lambda acc, v: acc + v
    )
    return (
        corpus.select("vec_id", dist.alias("dist"))
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(k)
    )


QUERY = [0.3 * ((i % 5) - 2) for i in range(D)]


def test_exhaustive_probe_equals_brute_force(spark, corpus):
    index = ann_fit(corpus, n_cells=8, m=4, nbits=4)
    coded = ann_encode(corpus, index)
    exact = [(r.vec_id, r.dist) for r in _flat_topk(corpus, QUERY, 10).collect()]
    got = [
        (r.vec_id, r.dist)
        for r in ann_search(
            index, coded, QUERY, k=10, nprobe=8, vectors=corpus, shortlist=N
        ).collect()
    ]
    assert got == exact  # bit-identical: same JVM fold, same tie-break


def test_default_knobs_hit_recall(spark, corpus):
    index = ann_fit(corpus, n_cells=8, m=4, nbits=6)
    coded = ann_encode(corpus, index)
    exact = {r.vec_id for r in _flat_topk(corpus, QUERY, 10).collect()}
    got = {
        r.vec_id
        for r in ann_search(
            index, coded, QUERY, k=10, nprobe=4, vectors=corpus
        ).collect()
    }
    assert len(got & exact) >= 8  # recall@10 >= 0.8 with half the cells


def test_pca_front_end_composes_and_reranks_in_original_space(spark, corpus):
    index = ann_fit(corpus, k_pca=8, n_cells=8, m=4, nbits=6)
    coded = ann_encode(corpus, index)
    assert coded.columns == ["vec_id", "centroid_id", "codes"]
    exact = {r.vec_id for r in _flat_topk(corpus, QUERY, 10).collect()}
    rows = ann_search(
        index, coded, QUERY, k=10, nprobe=8, vectors=corpus, shortlist=120
    ).collect()
    got = {r.vec_id for r in rows}
    assert len(got & exact) >= 7  # reduced-space probe, original-space rerank
    # distances are TRUE original-space L2 (rerank), not ADC estimates
    flat = {r.vec_id: r.dist for r in _flat_topk(corpus, QUERY, N).collect()}
    for r in rows:
        assert r.dist == pytest.approx(flat[r.vec_id])


def test_save_load_roundtrip_prunes_partitions(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    index = ann_fit(corpus, n_cells=8, m=4, nbits=6)
    ann_save(spark, corpus, index, path)
    index2, coded2, vectors2 = ann_load(spark, path)
    assert index2["n_cells"] == 8 and vectors2 is not None
    probe1 = ann_search(index2, coded2, QUERY, k=5, nprobe=1, vectors=vectors2)
    assert probe1.count() == 5
    # partition pruning: the probe's isin() must reach the scan as a
    # PartitionFilter on centroid_id (inputFiles() cannot show this --
    # it lists the relation pre-pruning -- so pin the plan instead)
    from tests.plan_utils import formatted_plan

    adc_plan = formatted_plan(
        ann_search(index2, coded2, QUERY, k=5, nprobe=1)
    )
    seg = adc_plan.split("PartitionFilters", 1)
    assert len(seg) == 2 and "centroid_id" in seg[1][:200], adc_plan
    # and the full probe equals the in-memory index's full probe
    mem = ann_search(index, ann_encode(corpus, index), QUERY, k=5, nprobe=8,
                     vectors=corpus, shortlist=N)
    disk = ann_search(index2, coded2, QUERY, k=5, nprobe=8, vectors=vectors2,
                      shortlist=N)
    assert [tuple(r) for r in disk.collect()] == [tuple(r) for r in mem.collect()]


def test_search_without_vectors_returns_adc_estimates(spark, corpus):
    index = ann_fit(corpus, n_cells=8, m=8, nbits=6)
    coded = ann_encode(corpus, index)
    rows = ann_search(index, coded, QUERY, k=10, nprobe=8).collect()
    assert len(rows) == 10
    exact = {r.vec_id for r in _flat_topk(corpus, QUERY, 10).collect()}
    assert len({r.vec_id for r in rows} & exact) >= 6  # code-only recall


def test_incremental_append_is_searchable(spark, corpus, tmp_path):
    from utc_cuip_kafka_aws_connector_spark.operators.annindex import ann_append

    path = str(tmp_path / "idx")
    index = ann_fit(corpus, n_cells=8, m=4, nbits=6)
    ann_save(spark, corpus, index, path)
    # new batch: clones of row 7 far ids away, plus genuinely new points
    base = corpus.filter(F.col("vec_id") == 7).first().embedding
    fresh = spark.createDataFrame(
        [(10_000 + i, [v + 0.001 * i for v in base]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    assert ann_append(spark, fresh, path) == 5
    index2, coded2, vectors2 = ann_load(spark, path)
    assert coded2.count() == N + 5
    top = ann_search(
        index2, coded2, list(base), k=6, nprobe=8, vectors=vectors2,
        shortlist=N + 5,
    ).collect()
    got = {r.vec_id for r in top}
    assert 7 in got and {10_000, 10_001, 10_002} <= got  # appended rows found


def test_vacuum_drops_deleted_ids_and_compacts(spark, corpus, tmp_path):
    """ann_vacuum (r10 brief): deletions stop surfacing in search,
    survivors are untouched, append fragmentation compacts, and the
    vacuumed copy loads through plain ann_load."""
    from utc_cuip_kafka_aws_connector_spark.operators.annindex import (
        ann_append,
        ann_vacuum,
    )

    path = str(tmp_path / "idx_frag")
    dest = str(tmp_path / "idx_clean")
    index = ann_fit(corpus, n_cells=8, m=4, nbits=6)
    ann_save(spark, corpus, index, path)
    # fragment the index with several small appends
    for j in range(3):
        fresh = spark.createDataFrame(
            [
                (20_000 + 10 * j + i, [float(v) for v in np.random.RandomState(j * 10 + i).randn(D)])
                for i in range(4)
            ],
            "vec_id long, embedding array<double>",
        )
        ann_append(spark, fresh, path)

    target = corpus.filter(F.col("vec_id") == 7).first().embedding
    dels = spark.createDataFrame([(7,), (20_000,)], "vec_id long")
    stats = ann_vacuum(spark, path, dest, delete_ids=dels)
    assert stats["rows_dropped"] == 2
    assert stats["rows_kept"] == N + 12 - 2
    assert stats["files_after"] <= stats["files_before"]

    index2, coded2, vectors2 = ann_load(spark, dest)
    assert coded2.count() == N + 12 - 2
    assert coded2.filter(F.col("vec_id").isin(7, 20_000)).count() == 0
    top = ann_search(
        index2, coded2, list(target), k=5, nprobe=8, vectors=vectors2,
        shortlist=N + 12,
    ).collect()
    assert all(r.vec_id != 7 for r in top)  # the deleted row is gone
    assert top  # survivors still searchable
