"""Incremental corpus dedup: match a NEW batch of documents against
a persisted LSH index of the corpus, without ever re-pairing the
existing corpus with itself.

The production shape this fills: a 100 TB corpus is deduped once
with the batch family (operators/dedup.py); every day a new crawl
arrives. Re-running full dedup re-does corpus x corpus work that
cannot produce new pairs — the only new information is
new x (corpus + new). This module makes that incremental step a
pair of equi-joins:

- ``build_lsh_index``: the corpus's (band_key, doc, sig) rows
  (operators/lshbands.py — same construction as the streaming
  matcher), written once as parquet partitioned-friendly columns.
  O(corpus x bands) rows, built in one sketch pass.
- ``incremental_near_dups``: band the new batch, equi-join on
  band_key against the index (never a cross product; candidate
  volume tracks shared buckets), estimate Jaccard as the
  equal-component fraction of the two signatures — one JVM
  ``zip_with``/``aggregate`` fold, no Python — and keep each new
  doc's best match over the threshold. Within-batch duplicates are
  the same join with the index replaced by the batch's own bands
  (id-ordered, so the earlier doc is the canonical survivor).
- ``updated_index``: the index rows for the ACCEPTED (non-duplicate)
  new docs, unioned onto the old index — append these to the index
  table and the next batch dedups against today's survivors too.

Scale notes: the index join is the canonical AQE skew case (a
boilerplate band bucket is a hot key) — the index is bands-
partitionable and the join is a plain equi-join, so AQE skew split
or ``skew.salted_join`` applies unchanged. Signatures ride the join
(num_hashes longs per row); at 64 hashes that is 512 bytes/row,
the price of verification without a second lookup.

Reference basis: public MinHash-LSH (Broder 1997; LSH banding per
Leskovec/Rajaraman/Ullman ch.3); the reference repo has no dedup at
all (SURVEY R23). SURVEY §2.D training-data scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.bloom import (
    bloom_build,
    bloom_semi_filter,
)
from utc_cuip_kafka_aws_connector_spark.operators.lshbands import (
    banded_signatures,
)


def _sig_sim(a: Column, b: Column) -> Column:
    """Equal-component fraction of two equal-length signatures — the
    unbiased MinHash Jaccard estimator, as one JVM fold."""
    eq = F.zip_with(a, b, lambda x, y: (x == y).cast("int"))
    return F.aggregate(eq, F.lit(0), lambda acc, v: acc + v) / F.size(a)


def build_lsh_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(band_key, doc, sig) index rows for a corpus — write these as
    the persistent dedup index (parquet; partitioning by
    pmod(band_key, N) keeps bucket lookups file-prunable)."""
    return banded_signatures(
        df, id_col, text_col, num_hashes, bands, shingle_n
    )


def index_band_bloom(
    index: DataFrame, fpp: float = 0.01, num_items: int | None = None
) -> dict:
    """A Bloom summary of the index's ``band_key`` set
    (operators/bloom.py), built once when the index is written and
    persisted beside it (the dict is JSON-able: m, k, bits, n_added).
    Pass it to ``incremental_near_dups(index_bloom=...)`` to
    pre-screen each new batch: a probe row whose band bucket is
    absent from the summary CANNOT join any index row (Bloom's
    no-false-negative side), so the typical mostly-novel crawl batch
    skips the index shuffle for most of its rows at the cost of a
    broadcast-sized bitmap — the runtime-filter pattern applied to
    the dedup index join. ~12 MB summarizes 10M buckets at 1% FPR;
    false positives only pass a few extra rows into the join they
    would have reached anyway, so results are exactly unchanged
    (test-pinned equivalence)."""
    n = num_items if num_items is not None else index.count()
    return bloom_build(index, "band_key", max(n, 1), fpp)


def incremental_near_dups(
    new_df: DataFrame,
    index: DataFrame,
    sim_threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    within_batch: bool = True,
    index_bloom: dict | None = None,
) -> DataFrame:
    """One row per NEW doc: (doc, dup_of, sim, is_dup). ``dup_of``
    is the best match at or above ``sim_threshold`` — an existing
    corpus doc from ``index``, or (``within_batch``) an earlier-id
    sibling in the same batch — else null/false.

    The index side never self-joins; candidate generation is
    equi-joins on band_key only. ``index_bloom`` (see
    ``index_band_bloom``) pre-screens the probe side of the INDEX
    join scan-locally; the within-batch join is unaffected (its
    matches are not in the index), so the verdict is identical with
    or without the screen."""
    nb = banded_signatures(
        new_df, id_col, text_col, num_hashes, bands, shingle_n
    )
    probes = nb.select(
        "band_key", F.col("doc"), F.col("sig")
    )
    index_probes = (
        bloom_semi_filter(probes, "band_key", index_bloom)
        if index_bloom is not None
        else probes
    )
    vs_index = index_probes.join(
        index.select(
            "band_key",
            F.col("doc").alias("cand"),
            F.col("sig").alias("cand_sig"),
        ),
        "band_key",
    )
    cands = vs_index
    if within_batch:
        vs_self = probes.join(
            nb.select(
                "band_key",
                F.col("doc").alias("cand"),
                F.col("sig").alias("cand_sig"),
            ),
            "band_key",
        ).filter(F.col("cand") < F.col("doc"))  # earlier id is canonical
        cands = vs_index.unionByName(vs_self)
    scored = (
        # a pair meeting in several bands is the same evidence —
        # dedupe before paying the signature fold
        cands.dropDuplicates(["doc", "cand"]).select(
            "doc", "cand", _sig_sim(F.col("sig"), F.col("cand_sig")).alias("sim")
        )
        .filter(F.col("sim") >= F.lit(sim_threshold))
        .groupBy("doc")
        .agg(F.max(F.struct(F.col("sim"), (-F.col("cand")).alias("nc"), F.col("cand"))).alias("b"))
    )
    all_new = new_df.select(F.col(id_col).alias("doc")).distinct()
    return all_new.join(scored, "doc", "left").select(
        "doc",
        F.col("b.cand").alias("dup_of"),
        F.coalesce(F.col("b.sim"), F.lit(0.0)).alias("sim"),
        F.col("b.cand").isNotNull().alias("is_dup"),
    )


def updated_index(
    index: DataFrame,
    new_df: DataFrame,
    verdict: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """The old index plus the band rows of the batch's ACCEPTED
    (non-duplicate per ``verdict``) docs — append-only maintenance of
    the persistent index."""
    keep = verdict.filter(~F.col("is_dup")).select("doc")
    accepted = new_df.join(
        keep.withColumnRenamed("doc", id_col), id_col, "left_semi"
    )
    fresh = banded_signatures(
        accepted, id_col, text_col, num_hashes, bands, shingle_n
    )
    return index.unionByName(fresh)


def vacuum_lsh_index(index: DataFrame, delete_ids: DataFrame) -> DataFrame:
    """Index retention, the LSH twin of ``annindex.ann_vacuum``: the
    index rows minus every doc in ``delete_ids`` (any frame whose
    first column holds doc ids — removals from dedup, takedowns,
    retention windows). A removed doc otherwise keeps matching future
    batches forever, silently rejecting fresh documents as
    duplicates of content the corpus no longer contains. One
    anti-join (broadcast at takedown sizes); rewrite the persisted
    index table with the result and rebuild the band Bloom
    (``index_band_bloom``) in the same maintenance pass — Blooms
    cannot unlearn, so the summary must be rebuilt, not patched."""
    first = delete_ids.columns[0]
    dels = delete_ids.select(F.col(first).alias("doc")).distinct()
    return index.join(F.broadcast(dels), "doc", "left_anti")
