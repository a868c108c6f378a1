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
