"""Quality-filter calibration: precision/recall curves and threshold
selection for score-based corpus gates.

``nb_log_odds`` (and any other quality score in the repo) is only
actionable once a THRESHOLD is chosen, and the right threshold is a
product decision ("keep 95% precision" / "keep 40% of the corpus"),
not a constant. This module turns a scored, labeled holdout into
that decision, Spark-first:

- ``pr_curve`` — one global sort of the holdout by score (descending;
  the only corpus-sized operation, and a holdout is evaluation-sized
  by definition) + running aggregates: at every distinct score s the
  curve row holds precision/recall/keep-rate of the rule
  ``score >= s``. Running positives come from an unbounded-preceding
  window; ties collapse to the LAST row of their score group (a
  threshold cannot split equal scores — the curve is over achievable
  operating points only).
- ``threshold_for_precision`` / ``threshold_for_recall`` /
  ``threshold_for_keep_rate`` — driver-small pickers over the curve:
  the most permissive threshold still meeting the target (or the
  strictest available when nothing does, flagged).

Monotonicity caveat stated rather than hidden: recall and keep-rate
are monotone in the threshold, precision is NOT — the pickers
therefore scan the full curve, not binary-search it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def pr_curve(
    scored: DataFrame,
    label_col: str,
    score_col: str = "log_odds",
    positive=True,
) -> DataFrame:
    """(threshold, kept, positives_kept, precision, recall,
    keep_rate) for every achievable operating point of the rule
    ``score >= threshold``, ordered by descending threshold."""
    total = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col(label_col) == F.lit(positive)).cast("long")
        ).alias("pos"),
    ).first()
    if total.n == 0:
        raise ValueError("empty holdout")
    if not total.pos:
        raise ValueError("holdout has no positive examples")
    running = W.orderBy(F.desc("threshold")).rowsBetween(
        W.unboundedPreceding, 0
    )
    curve = (
        scored.select(
            F.col(score_col).alias("threshold"),
            (F.col(label_col) == F.lit(positive)).cast("long").alias("_y"),
        )
        .withColumn("kept", F.count(F.lit(1)).over(running))
        .withColumn("positives_kept", F.sum("_y").over(running))
        # ties: only the LAST row of each score group is achievable
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("threshold").orderBy(F.desc("kept"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            "threshold",
            "kept",
            "positives_kept",
            (F.col("positives_kept") / F.col("kept")).alias("precision"),
            (F.col("positives_kept") / F.lit(total.pos)).alias("recall"),
            (F.col("kept") / F.lit(total.n)).alias("keep_rate"),
        )
        .orderBy(F.desc("threshold"))
    )
    return curve


def _pick(curve: DataFrame, cond, order_desc: bool) -> dict:
    rows = curve.filter(cond).collect()
    met = bool(rows)
    pool = rows if rows else curve.collect()
    best = min(pool, key=lambda r: r.threshold) if met else max(
        pool, key=lambda r: r.threshold
    )
    out = best.asDict()
    out["target_met"] = met
    return out


def threshold_for_precision(curve: DataFrame, target: float) -> dict:
    """The most permissive threshold whose precision still reaches
    ``target`` (max recall subject to the precision floor); when no
    point reaches it, the strictest available point with
    ``target_met=False``."""
    return _pick(curve, F.col("precision") >= target, order_desc=False)


def threshold_for_recall(curve: DataFrame, target: float) -> dict:
    """The strictest threshold whose recall reaches ``target``
    (max precision subject to the recall floor)."""
    rows = curve.filter(F.col("recall") >= target).collect()
    met = bool(rows)
    pool = rows if rows else curve.collect()
    best = max(pool, key=lambda r: r.threshold) if met else min(
        pool, key=lambda r: r.threshold
    )
    out = best.asDict()
    out["target_met"] = met
    return out


def threshold_for_keep_rate(curve: DataFrame, target: float) -> dict:
    """The strictest threshold keeping at least ``target`` of the
    corpus (budgeted gating)."""
    rows = curve.filter(F.col("keep_rate") >= target).collect()
    met = bool(rows)
    pool = rows if rows else curve.collect()
    best = max(pool, key=lambda r: r.threshold) if met else min(
        pool, key=lambda r: r.threshold
    )
    out = best.asDict()
    out["target_met"] = met
    return out
