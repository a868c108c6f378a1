"""Deterministic content-hash sampling for training-data curation.

Why not ``df.sample()``: Spark's Bernoulli sample draws from a
per-partition RNG seeded by (seed, partition index), so the selected
rows CHANGE whenever the data is repartitioned, a file splits
differently, or a task retries on a different split boundary. For a
100 TB corpus feeding a training run that is a reproducibility bug:
two runs of "the same 10% sample" disagree. Content-hash sampling
decides per ROW from a hash of its id -- reproducible across
partitioning, retries, engines, and even re-ingestion of the same
data, and it composes: the 5% sample is a strict subset of the 20%
sample (thresholds are nested), so mixture ablations share documents.

Portability: the hash is ``md5(cast(id as string))`` and the draw is
the first 8 hex chars compared against a hex threshold STRING. md5
produces identical lowercase hex in Spark, DuckDB, Python, and
PostgreSQL, so an oracle (or a later re-run in another engine) selects
the exact same rows -- no float arithmetic, no RNG state anywhere.

Scale: a sample is a scan-local FILTER (no shuffle, no state); Spark
evaluates it inside the scan stage and prunes rows before anything
downstream. Stratified rates compile to one CASE expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16**8  # the draw is uniform over 8 hex chars


def hash_threshold(fraction: float) -> str:
    """Hex-string threshold such that P(md5_prefix < threshold) ==
    round(fraction * 16^8) / 16^8 (exact to ~2.3e-10)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(min(int(round(fraction * _HEX_SPACE)), _HEX_SPACE - 1), "08x")


def hash_draw(id_col: str | Column) -> Column:
    """The uniform draw: first 8 lowercase-hex chars of md5(id)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(c.cast("string")), 1, 8)


def _keep(id_col: str | Column, fraction: float) -> Column:
    """Keep-predicate for one rate. fraction == 1.0 is special-cased to
    literal TRUE: the hex threshold space tops out at 'ffffffff' and a
    plain `<` would drop the ~2.3e-10 of rows whose md5 prefix is
    exactly that -- a 100% sample must be exact, not almost-exact."""
    if fraction >= 1.0:
        return F.lit(True)
    return hash_draw(id_col) < F.lit(hash_threshold(fraction))


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose hash draw
    falls below the fraction threshold. Pure filter -- no shuffle."""
    return df.filter(_keep(id_col, fraction))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling -- the data-mixture primitive
    (e.g. keep 100% of English, 20% of everything else, 0% of a
    blocked source). Compiles to one CASE over the stratum column;
    still a scan-local filter. Rate-1.0 strata keep every row exactly
    (see ``_keep``)."""
    pred: Column = _keep(id_col, default_rate)
    for value, rate in sorted(rates.items()):
        pred = F.when(F.col(strata_col) == value, _keep(id_col, rate)).otherwise(pred)
    return df.filter(pred)


def temperature_weights(
    df: DataFrame,
    group_col: str = "lang",
    size_col: str = "n_tokens",
    tau: float = 0.5,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-based mixture weights over group sizes -- the
    multilingual-training rebalancing rule w_g = n_g^tau / sum n^tau
    (tau < 1 upsamples small groups, tau = 1 keeps natural
    proportions). With ``budget`` also emits each group's target
    count round(budget * w_g).

    Determinism contract: tau = 0.5 and tau = 1.0 are bit-exact
    cross-engine (sqrt is IEEE correctly-rounded; identity trivially
    so) and the normalizer is an ORDERED fold over the sorted group
    list, so float summation order is pinned -- double addition is
    not associative and an unordered sum would hash-differently per
    partitioning. Arbitrary tau uses pow(), whose last-ulp behavior
    is library-specific: fine operationally, not oracle-exact.

    Scale: the input is one row per GROUP (languages, domains --
    dozens), so the fold and cross-join are driver-trivial; the
    heavy part (computing n_g) is the caller's partial-agg groupBy."""
    if tau == 1.0:
        powered = F.col(size_col).cast("double")
    elif tau == 0.5:
        powered = F.sqrt(F.col(size_col))
    else:
        powered = F.pow(F.col(size_col).cast("double"), F.lit(float(tau)))
    w = df.select(F.col(group_col), F.col(size_col), powered.alias("_p"))
    tot = w.select(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct(group_col, "_p"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_p"],
        ).alias("_tot")
    )
    out = w.crossJoin(tot).select(
        group_col,
        size_col,
        (F.col("_p") / F.col("_tot")).alias("weight"),
    )
    if budget is not None:
        out = out.withColumn(
            "target", F.round(F.col("weight") * F.lit(int(budget))).cast("long")
        )
    return out
