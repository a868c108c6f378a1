"""Skew-robust join: salt the hot side so one heavy key spreads over
many reducers instead of melting a single task.

When to reach for this at 100 TB: AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`) already repartitions oversized
SHUFFLE partitions at runtime and should be the first line of defense.
Explicit salting still wins when (a) the small side is too big to
broadcast but small enough to replicate ``salt_buckets`` times, and
(b) a single join KEY (not merely partition) is hot -- AQE cannot
split one key's hash bucket across tasks for a sort-merge join,
salting can.

Mechanics: the big side gets ``salt = pmod(xxhash64(salt_on), n)``
-- content-derived, so retries and re-runs salt identically (no RNG).
The small side is replicated once per salt value (an explode over a
literal array -- no shuffle; n copies of the SMALL side only). The
equi-join then runs on (key, salt): the hot key's rows now land in n
different reducers. Result set is provably identical to the unsalted
join: every (big_row, small_row) match still meets exactly once, in
the bucket chosen by big_row's salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``on``, salted into
    ``salt_buckets`` sub-keys. ``salt_on`` is a big-side column whose
    hash spreads the hot key (any near-unique column works; a row's
    salt must only be deterministic, not unique). Supports inner and
    left joins (each big row carries exactly one salt, so left-outer
    null-extension is preserved)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt_buckets)).cast("int")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return b.join(s, [*on, "__salt"], how).drop("__salt")
