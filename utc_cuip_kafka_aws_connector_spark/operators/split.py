"""Leakage-safe dataset splitting: cut train/val/test along
near-duplicate components, not rows.

A hash split of ROWS leaks: two near-copies of the same document land
in train and test and the eval overstates generalization — the same
failure mode ``operators/decontam.py`` guards against for external
benchmarks, but internal to the corpus. The fix is standard: split by
GROUP, where a group is the connected component the dedup family
already computes (``dedup_clusters`` / ``semantic_dedup`` /
``near_dup_clusters`` all emit ``(id, component, keep)``), so every
near-duplicate cluster lands wholly in one split.

Mechanics: each row's group key is its component (its own id when it
was never matched — components are min-ids, so singletons are their
own group); the split is ``xxhash64(component, seed)`` mapped to
[0, 1) and cut at the cumulative fractions. Deterministic (same seed
=> same assignment, layout-independent — the operators/ordering.py
contract), one broadcast-or-shuffle equi-join of docs to their
component, no collects.

Estimates, not quotas: splits hit their fractions in expectation
(weighted by GROUP sizes); exact-count splits would need a global
sort and break the "adding a document never moves an old one"
stability property that makes incremental corpus versions comparable
across releases — the property tests pin that stability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# xxhash64 -> uniform [0, 1): shift to non-negative 2^63 space first
_HASH_SPAN = float(1 << 64)


def _unit_hash(col, seed: int):
    h = F.xxhash64(col, F.lit(int(seed)))
    return (h.cast("double") + F.lit(float(1 << 63))) / F.lit(_HASH_SPAN)


def md5_unit_hash(col: Column) -> Column:
    """Engine-portable [0, 1) hash: the first 8 hex chars of
    md5(string(col)) as an integer, scaled by 2^-32. Every value is
    an exact multiple of 2^-32, so a cut at an exactly-representable
    binary fraction (0.75, 0.125, ...) compares identically to a
    lexicographic comparison of the hex prefix against the cut's
    8-hex-digit image — which is how a SQL oracle on another engine
    reproduces the assignment bit-for-bit (the q82 md5-threshold
    pattern). The xxhash64 default stays the production path; this
    exists for ``unit_hash=`` injection where cross-engine exactness
    matters more than hash speed."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("double")
        / F.lit(4294967296.0)
    )


def leakage_safe_split(
    df: DataFrame,
    components: DataFrame,
    fractions: dict[str, float],
    seed: int = 0,
    id_col: str = "doc_id",
    comp_col: str = "component",
    unit_hash=None,
) -> DataFrame:
    """``df`` plus (``component``, ``split``): every row of the same
    near-dup component receives the same split label. ``components``
    is any (id, component) frame from the dedup family; ids absent
    from it are singletons (their own component). ``fractions`` maps
    split name -> weight (normalized internally); iteration order of
    the dict fixes the cut order, so pass it in a stable order.
    ``unit_hash`` (Column -> Column mapping the component key to a
    double in [0, 1)) overrides the seeded-xxhash64 default — e.g.
    ``md5_unit_hash`` when the assignment must be reproducible on an
    engine without Spark's xxhash64; ``seed`` is ignored then (fold
    the seed into the override if it needs one)."""
    if not fractions:
        raise ValueError("fractions must name at least one split")
    total = float(sum(fractions.values()))
    if total <= 0 or any(v < 0 for v in fractions.values()):
        raise ValueError(f"fractions must be positive: {fractions}")

    comp = components.select(
        F.col(id_col).alias("_sp_id"), F.col(comp_col).alias("_sp_comp")
    )
    joined = df.join(comp, df[id_col] == F.col("_sp_id"), "left").drop("_sp_id")
    grouped = joined.withColumn(
        "component", F.coalesce(F.col("_sp_comp"), F.col(id_col))
    ).drop("_sp_comp")

    u = (
        unit_hash(F.col("component"))
        if unit_hash is not None
        else _unit_hash(F.col("component"), seed)
    )
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return grouped.withColumn("split", expr)


def split_report(assigned: DataFrame) -> DataFrame:
    """(split, n_rows, n_components, fraction) — the realized cut.

    One pass: the corpus total is the sum of the per-split counts, so
    it comes from the 3-row aggregate via a broadcast crossJoin instead
    of a separate ``assigned.count()`` that re-ran the whole component
    lineage a second time (r20; guide §2.4 shared subtrees). The
    fraction is the same IEEE double: ``n_rows / total`` divides two
    exactly-representable integers either way."""
    per_split = assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("component").alias("n_components"),
    )
    total = per_split.select(F.sum("n_rows").alias("_total"))
    return (
        per_split.crossJoin(F.broadcast(total))
        .withColumn("fraction", F.col("n_rows") / F.col("_total").cast("double"))
        .drop("_total")
        .orderBy("split")
    )
