"""Weighted sampling WITHOUT replacement — the fixed-size draw the
curation tier lacked (operators/sampling.py's hash_sample is
Bernoulli: every row decides independently, so the output SIZE
varies; a training-mixture spec that says "exactly 1M documents,
weighted by quality" needs a without-replacement draw).

Algorithm: Efraimidis & Spirakis 2006 ("Weighted random sampling with
a reservoir") — give row i the key ``ln(u_i) / w_i`` with
``u_i ~ U(0,1)`` and keep the ``n`` LARGEST keys; the selected set is
distributed exactly as sequential weighted draws without replacement.
One ordering statistic per row makes it embarrassingly parallel: the
distributed form is not a reservoir at all but a TOP-N BY KEY —
Spark's TakeOrderedAndProject (per-partition heaps, merge at the
driver; no global sort, no shuffle of the data itself) or, per
stratum, one window over the stratum hash partitioning.

Determinism (the sampling.py doctrine): ``u_i`` is not an RNG draw
but a content hash — 13 hex chars of ``md5(id || ':' || seed)``
mapped into (0,1) — so the same (id, seed) selects the same rows
across partitioning, retries, and engines. 16^13 < 2^53, so the hash
integer is exact as a double. The only non-portable step is ``ln``
(IEEE libm, ~1-ulp platform variance): a cross-engine tie at the
selection boundary would need two keys within an ulp, which content
hashing makes astronomically unlikely; the ordering is bit-stable on
any one platform. Keys are independent of ``n``, so samples NEST:
the top-5 draw is a strict subset of the top-10 draw at the same
seed — mixture ablations share documents, exactly like the nested
Bernoulli thresholds in sampling.py.

Rows with NULL, NaN, or non-positive weight are dropped (a zero-weight row
can never be drawn; passing one is a spec error, not a sample
member), and NULL ids are dropped with them (no content to hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from utc_cuip_kafka_aws_connector_spark.operators.hashdraw import (
    md5_uniform,
)


def es_key(id_col: str | Column, weight_col: str | Column, seed: int = 0) -> Column:
    """The Efraimidis-Spirakis ordering key ``ln(u)/w`` (LARGER is
    more likely selected) with the deterministic content-hash
    uniform (hashdraw.md5_uniform, open interval: ``ln`` needs
    u strictly inside (0,1) so the key stays finite and strictly
    negative)."""
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = md5_uniform(i, str(int(seed)), open_interval=True)
    return F.log(u) / w.cast("double")


def weighted_sample_n(
    df: DataFrame,
    n: int,
    id_col: str,
    weight_col: str,
    strata_col: str | None = None,
    seed: int = 0,
    key_col: str | None = None,
) -> DataFrame:
    """Exactly ``n`` rows drawn without replacement with probability
    proportional to weight — globally, or per stratum when
    ``strata_col`` is given (the per-language / per-source budget
    form). Strata (or the corpus) smaller than ``n`` return all
    their eligible rows. Original columns pass through; ``key_col``
    optionally exposes the ordering key for audit.

    Plan shape: the global draw is TakeOrderedAndProject on
    (key desc, id asc) — no shuffle of the data, driver holds n rows
    of metadata only, so keep ``n`` driver-sized (millions of narrow
    rows, not billions); the stratified draw is one hash shuffle on
    the stratum + a per-stratum top-n window. A deterministic id
    tie-break makes duplicate weights reproducible."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    key = es_key(id_col, weight_col, seed)
    # NaN weights would PASS `> 0` (Spark orders NaN above every
    # number) and their NaN keys would sort first, hijacking the
    # sample — excluded explicitly alongside nulls/non-positives
    wd = F.col(weight_col).cast("double")
    eligible = df.filter(
        F.col(id_col).isNotNull()
        & F.col(weight_col).isNotNull()
        & ~F.isnan(wd)
        & (wd > 0)
    ).withColumn("__es_key", key)

    if strata_col is None:
        out = eligible.orderBy(
            F.col("__es_key").desc(), F.col(id_col).asc()
        ).limit(n)
    else:
        w = W.partitionBy(strata_col).orderBy(
            F.col("__es_key").desc(), F.col(id_col).asc()
        )
        out = (
            eligible.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= n)
            .drop("__rk")
        )
    if key_col is not None:
        return out.withColumnRenamed("__es_key", key_col)
    return out.drop("__es_key")


def weighted_sample_targets(
    df: DataFrame,
    targets: DataFrame,
    id_col: str,
    weight_col: str,
    strata_col: str,
    target_col: str = "target",
    seed: int = 0,
    key_col: str | None = None,
) -> DataFrame:
    """Per-stratum draw sizes from a TARGETS table — the mixture-
    assembly form: ``unimax_allocation`` (or ``temperature_weights``
    with a budget) emits per-group counts; this draws exactly that
    many rows per group, weighted, without replacement. Strata absent
    from ``targets`` (or with NULL/non-positive targets) contribute
    nothing; strata smaller than their target return all eligible
    rows.

    Plan shape: the targets table is mixture-sized, so it BROADCASTS
    onto the corpus (one scan-local join — no shuffle added by the
    join itself), then the same single window as the fixed-n draw.
    Same key arithmetic, so a draw at one target nests inside a draw
    at a larger one."""
    t = targets.select(
        F.col(strata_col).alias("__stratum"),
        F.floor(F.col(target_col).cast("double")).cast("long").alias("__n"),
    ).filter(F.col("__stratum").isNotNull() & (F.col("__n") > 0))
    wd = F.col(weight_col).cast("double")
    eligible = (
        df.filter(
            F.col(id_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & ~F.isnan(wd)
            & (wd > 0)
            & F.col(strata_col).isNotNull()
        )
        .join(
            F.broadcast(t),
            F.col(strata_col).eqNullSafe(F.col("__stratum")),
        )
        .drop("__stratum")
        .withColumn("__es_key", es_key(id_col, weight_col, seed))
    )
    w = W.partitionBy(strata_col).orderBy(
        F.col("__es_key").desc(), F.col(id_col).asc()
    )
    out = (
        eligible.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.col("__n"))
        .drop("__rk", "__n")
    )
    if key_col is not None:
        return out.withColumnRenamed("__es_key", key_col)
    return out.drop("__es_key")
