"""Exact set-similarity self-join with prefix filtering (PPJoin-style).

The scalable EXACT counterpart to the MinHash-LSH approximate path in
operators/dedup.py, and the production upgrade of the bounded
inverted-index join behind q78 (generalizing the reference's pandas
duplicate scan, df_manager.py:63-66, to similarity joins it cannot
express at all): instead of generating a candidate pair for EVERY
shared token (the full inverted index — quadratic on Zipf-frequent
tokens), each set emits only its PREFIX under a global
rarest-token-first order, and two sets become a candidate only when
their prefixes intersect.

Why that is lossless (the public prefix-filtering principle, used by
PPJoin / the MapReduce set-similarity joins of Vernica et al.,
SIGMOD'10): for Jaccard J(a,b) >= t the overlap must satisfy
|a ∩ b| >= ceil(t * |s|) for each side s (since
J = o/(|a|+|b|-o) >= t gives o >= t/(1+t) * (|a|+|b|) >= t * |s|),
so an ordered set that contributes none of its first
|s| - ceil(t*|s|) + 1 tokens to the intersection cannot clear the
overlap bound — the intersection would have to fit inside the
remaining ceil(t*|s|) - 1 tokens. Candidate recall is therefore
exactly 100%; the exact-Jaccard verification step makes precision
100% too, so the output equals the brute-force all-pairs answer.

Exactness contract: the threshold is handled as a RATIONAL num/den
(Fraction(str(t))), so every comparison — prefix length, size filter,
final Jaccard test — is integer arithmetic on both engines; no float
ever decides membership (ceil(sz * float(0.6)) can land on the wrong
integer at representation boundaries). The emitted ``jaccard`` column
is one IEEE division of integers: bit-deterministic cross-engine.

Scale shape (100 TB story):
- token df histogram: map-side-combining groupBy over exploded
  tokens; Zipf makes the result small relative to the corpus.
- global order attach: equi-join token->df. The token stream is
  Zipf-skewed, so this is the canonical AQE skew-join case (and the
  vocabulary is NOT broadcast: at open-corpus scale it doesn't fit).
- prefix index: per-set sort + slice, scan-local.
- candidate join: equi-join on PREFIX tokens only. Prefixes are the
  globally RAREST tokens of each set, so posting lists in this join
  are short by construction — this is the whole point: the frequent
  tokens that explode the naive inverted index never enter the join.
- size filter: J >= t additionally forces t*|b| <= |a| (for
  |a| <= |b|), applied inside the join before the distinct.
- verification: join candidate ids back to full sorted token arrays,
  array_intersect / array_union — vectorized JVM, no Python.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.arrayops import (
    sliding_grams,
)


def tokenize_distinct(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, toks array<string>) with toks = distinct lowercase words.
    Single-space split matches the fixture contract pinned by
    tests/test_schema_contract.py (and every text oracle)."""
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(text_col)), " "), lambda w: w != F.lit("")
        )
    )
    return df.select(F.col(id_col).alias("id"), toks.alias("toks"))


def shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, toks array<string>) with toks = distinct word n-gram
    shingles — the same shingling as operators/dedup.py (space-joined
    lowercase word windows; short docs collapse to one truncated
    shingle), so thresholds are comparable across the near-dup
    family."""
    # coalesce keeps the pre-r14 null-text result ([""], one empty
    # truncated shingle) now that the window builder propagates null
    w = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " ")
    # short docs collapse to ONE truncated shingle (the whole doc),
    # the dedup-family convention; sliding_grams alone would give [].
    # The zip shape avoids re-splitting the text once per window
    # position (operators/arrayops re-evaluation note, r14).
    sh = F.array_distinct(
        F.when(F.size(w) >= n, sliding_grams(w, n, " ")).otherwise(
            F.array(F.array_join(w, " "))
        )
    )
    return df.select(F.col(id_col).alias("id"), sh.alias("toks"))


def _rational(threshold: float) -> tuple[int, int]:
    frac = Fraction(str(threshold))
    if not 0 < frac <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    return frac.numerator, frac.denominator


def prefix_filter_jaccard_join(
    sets: DataFrame, threshold: float = 0.6
) -> DataFrame:
    """All pairs (id_a < id_b) with word-set Jaccard >= threshold.

    ``sets`` is (id, toks array<string>); output
    (id_a, id_b, inter, union_n, jaccard) — inter/union_n BIGINT,
    jaccard one integer division (bit-deterministic).
    """
    from pyspark import StorageLevel

    num, den = _rational(threshold)

    tok = sets.select("id", F.explode("toks").alias("tok"))
    dfreq = tok.groupBy("tok").agg(F.count("*").alias("df"))

    # Rarest-first global order: sort each set by (df asc, tok asc).
    # sort_array on struct<df,tok> orders lexicographically by field —
    # exactly the (df, tok) order, making the per-set order total and
    # deterministic even among equal-df tokens.
    #
    # Persisted (r20): three consumers read this frame — the prefix
    # index and BOTH sides of the verification join — and each would
    # otherwise re-derive the whole subtree (shingle scan, token
    # explode, df histogram shuffle, order-attach join, collect_list
    # shuffle: Catalyst does not share subtrees across join inputs).
    # One materialization cuts the operator from 3x to 1x of that
    # chain; MEMORY_AND_DISK because the frame is corpus-proportional
    # (sorted shingle arrays) and spilling beats recomputing two
    # shuffles + a join per extra consumer.
    ordered = (
        tok.join(dfreq, "tok")
        .groupBy("id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"],
            ).alias("toks")
        )
        .withColumn("sz", F.size("toks"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # Prefix length |s| - ceil(t*|s|) + 1, in integer arithmetic:
    # ceil(sz * num / den) = (sz * num + den - 1) div den -- SQL
    # integer `div`, not `/`+floor, so no float is involved anywhere
    # (Spark `/` is double division; exact here only below ~2^50).
    # >= 1 for non-empty sets because ceil(t*sz) <= sz when t <= 1.
    min_overlap = F.expr(f"(sz * {num} + {den} - 1) div {den}")
    pref = ordered.select(
        "id",
        "sz",
        F.explode(F.slice("toks", 1, F.col("sz") - min_overlap + 1)).alias(
            "tok"
        ),
    )

    # Candidates: shared prefix token + Jaccard length filter
    # (J >= t with |a| <= |b| forces t * |b| <= |a|, i.e.
    # |a| * den >= |b| * num — integer-exact, no ceil needed).
    x, y = pref.alias("x"), pref.alias("y")
    cand = (
        x.join(y, "tok")
        .filter(F.col("x.id") < F.col("y.id"))
        .filter(
            (F.col("x.sz") * den >= F.col("y.sz") * num)
            & (F.col("y.sz") * den >= F.col("x.sz") * num)
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )

    a = ordered.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    b = ordered.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("long")
    union = F.size(F.array_union("toks_a", "toks_b")).cast("long")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("inter", inter)
        .withColumn("union_n", union)
        # J >= t <=> inter * den >= union_n * num: integer-exact.
        .filter(F.col("inter") * den >= F.col("union_n") * num)
        .withColumn(
            "jaccard", F.col("inter").cast("double") / F.col("union_n")
        )
        .select("id_a", "id_b", "inter", "union_n", "jaccard")
    )


def inverted_index_candidates(sets: DataFrame) -> DataFrame:
    """The naive full-inverted-index candidate set (every pair sharing
    ANY token) — the comparison baseline for the prefix filter's
    candidate-count reduction; used by tests, not by queries."""
    tok = sets.select("id", F.explode("toks").alias("tok"))
    x, y = tok.alias("x"), tok.alias("y")
    return (
        x.join(y, "tok")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def prefix_length(set_size: int, threshold: float) -> int:
    """Python-side mirror of the prefix-length rule, for tests."""
    num, den = _rational(threshold)
    return set_size - (set_size * num + den - 1) // den + 1
