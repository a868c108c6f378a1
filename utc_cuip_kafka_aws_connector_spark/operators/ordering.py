"""Deterministic training-data ordering: seeded epoch shuffles and
quality curricula.

The last step before shard-writing a training corpus is deciding the
ORDER rows are consumed in, and at 100 TB that order must be (a) a
real global permutation — not "whatever partition order the last
shuffle left" — and (b) REPRODUCIBLE: a resumed or re-run job must
regenerate byte-identical shards (the same determinism contract as
everything in this repo), while successive epochs must decorrelate.
``rand()`` fails (a): it is seeded per-partition, so the permutation
changes with the partition layout. The standard fix is hash-based:

- ``epoch_shuffle``: order key = ``xxhash64(id, seed, epoch)`` — a
  pure function of ROW IDENTITY and the (seed, epoch) pair, so the
  permutation is independent of layout, cluster size, or history.
  One range shuffle materializes it (``repartitionByRange`` + sort
  within partitions — the write-friendly form: shard files come out
  globally ordered without a single-task global sort).
- ``curriculum_order``: easy-to-hard scheduling (Bengio et al. 2009)
  — ``n_stages`` quality buckets via ``ntile`` over the score, rows
  shuffled hash-deterministically WITHIN each stage. Stage is the
  leading sort key, so training consumes stage 1 first.

Both return the input columns plus an ``order_key`` the caller can
range-write by; nothing is collected, and the only corpus-scale
operation is the one range shuffle any global ordering costs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def shuffle_key(id_col: str, seed: int, epoch: int):
    """The deterministic permutation key: xxhash64 of (row id, seed,
    epoch). Ties are impossible for distinct ids under a fixed
    (seed, epoch) short of a 64-bit collision; ``id_col`` breaks even
    those deterministically."""
    return F.xxhash64(F.col(id_col), F.lit(int(seed)), F.lit(int(epoch)))


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    epoch: int = 0,
    n_partitions: int | None = None,
) -> DataFrame:
    """``df`` globally ordered by the (seed, epoch) permutation, with
    the key exposed as ``order_key``. Layout-independent: any input
    partitioning yields the identical row order."""
    keyed = df.withColumn("order_key", shuffle_key(id_col, seed, epoch))
    parts = (
        keyed.repartitionByRange(n_partitions, "order_key", id_col)
        if n_partitions
        else keyed.repartitionByRange("order_key", id_col)
    )
    return parts.sortWithinPartitions("order_key", id_col)


def curriculum_order(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_stages: int = 4,
    seed: int = 0,
    epoch: int = 0,
    descending: bool = True,
    method: str = "exact",
    rel_err: float = 0.001,
) -> DataFrame:
    """Curriculum ordering: rows bucketed into ``n_stages`` by
    ``score_col`` (``descending=True`` = highest-quality first),
    hash-shuffled within each stage, ``stage`` and ``order_key``
    exposed.

    ``method="exact"`` (the oracle-friendly gate contract, q123):
    ntile over the total order — equal-population stages, ONE
    unpartitioned window sort of (score, id).

    ``method="approx"`` (the corpus-scale path, r13 — the trade-off
    the exact form's docstring always promised): stage thresholds
    from ``approxQuantile(rel_err)`` (Greenwald-Khanna, one
    aggregation pass, no sort) and a codegen'd threshold-count
    projection. Stages are equal-population only to ``rel_err``, and
    score TIES land in one stage together instead of splitting to
    balance counts — the behavioral differences vs ntile, and why
    the gate pins the exact form. HONESTY CAVEAT on the module's
    reproducibility contract: GK quantile summaries merge per
    partition, so the cut values (and documents within ``rel_err``
    of a boundary) can differ across partition LAYOUTS — approx
    stage ids are deterministic for a fixed layout, exact ones for
    any layout; pin the input layout (or use method="exact") when
    byte-identical resume matters. Null scores take the stage the
    exact path's null ordering gives them (DESC = last, ASC =
    first); an empty or all-null frame stages gracefully."""
    if n_stages < 1:
        raise ValueError(f"n_stages must be >= 1, got {n_stages}")
    if method not in ("exact", "approx"):
        raise ValueError(f"method must be exact|approx, got {method!r}")
    # null scores mirror the exact path's ntile ordering: DESC puts
    # nulls last (worst stage), ASC puts them first (stage 1)
    null_stage = n_stages if descending else 1
    if method == "approx":
        cuts: list[float] = []
        if n_stages > 1:
            qs = [i / n_stages for i in range(1, n_stages)]
            cuts = df.stat.approxQuantile(score_col, qs, rel_err)
        # no cuts => n_stages == 1, an empty frame, or an all-null
        # score column: every (null-scored) row takes its policy
        # stage, gracefully — the exact path's behavior, not an error
        expr = F.lit(1)
        for t in cuts:
            cond = (
                F.col(score_col) < F.lit(t)
                if descending
                else F.col(score_col) > F.lit(t)
            )
            expr = expr + cond.cast("int")
        staged = df.withColumn(
            "stage",
            F.when(
                F.col(score_col).isNull(), F.lit(null_stage)
            ).otherwise(expr),
        )
    else:
        order = F.desc(score_col) if descending else F.asc(score_col)
        staged = df.withColumn(
            "stage", F.ntile(n_stages).over(W.orderBy(order, F.asc(id_col)))
        )
    keyed = staged.withColumn("order_key", shuffle_key(id_col, seed, epoch))
    return keyed.repartitionByRange("stage", "order_key", id_col).sortWithinPartitions(
        "stage", "order_key", id_col
    )
