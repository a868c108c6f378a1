"""SimHash near-dup at corpus scale: the banded-Hamming upgrade of
the q47 fingerprint.

``dedup.simhash`` computes the 64-bit token-multiset fingerprint
(Charikar 2002); matching fingerprints within a Hamming radius was
previously a caller exercise, and the naive form is an all-pairs
scan. This module closes that with the same pigeonhole construction
the perceptual hashes use (``imagedup.hamming_near_dups``): band the
64 bits, equi-join per band (complete through distance bands-1),
verify with JVM ``bit_count`` — near-dup TEXT pairs at banded-join
cost, feeding ``dedup.dedup_clusters`` like every other signal.

Relation to MinHash-LSH (q46/q80): SimHash banding trades recall
semantics — MinHash bands approximate JACCARD with tunable
(bands, rows) curves, SimHash radius approximates token-multiset
COSINE with an exact distance guarantee. Both are one sketch pass +
one banded equi-join; pick by which similarity the policy is written
against."""

from __future__ import annotations

from pyspark.sql import DataFrame

from utc_cuip_kafka_aws_connector_spark.operators.dedup import simhash
from utc_cuip_kafka_aws_connector_spark.operators.imagedup import (
    hamming_near_dups,
)


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 3,
    bands: int = 8,
) -> DataFrame:
    """(id_a, id_b, distance): every document pair whose SimHash
    fingerprints are within ``max_distance`` Hamming bits — complete
    for max_distance <= bands - 1, never all-pairs."""
    hashed = simhash(df, id_col, text_col).withColumnRenamed(
        "simhash64", "dhash"
    )
    return hamming_near_dups(hashed, max_distance, bands, id_col, "dhash")
