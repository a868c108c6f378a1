"""Weak-supervision label model — data programming (Ratner et al.,
"Snorkel: Rapid Training Data Creation with Weak Supervision",
VLDB 2018): K noisy labeling functions (LFs) vote {-1, 0, +1}
(0 = abstain) per document; a generative model learns each LF's
accuracy WITHOUT ground truth and aggregates the votes into
calibrated probabilistic labels, which beat naive majority vote
exactly when LF quality varies.

Model (the classic independent-LF binary setting): class prior
pi = P(y=+1); per-LF accuracy alpha_k = P(lambda_k = y | lambda_k
!= 0); LF propensity is modeled class-independent, so it cancels
from the posterior:

    P(y | lambda) ~ P(y) * prod_{k: lambda_k != 0}
                    (alpha_k if lambda_k == y else 1 - alpha_k)

EM: the E-step is ONE codegen projection over the corpus (vote
array zipped against broadcast log-alpha literal arrays, ordered
log-sum fold — no UDF); the M-step is ONE posexplode + groupBy(lf)
aggregation (K * N rows, map-side combined, K-row result to the
driver). ``n_iter`` iterations = ``n_iter`` corpus passes, so at
100 TB fit on a sample (the K+1 learned parameters transfer — the
projection.py PCA fit-on-sample pattern) and run the single
``label_posteriors`` scoring pass over the full corpus.

Float note: M-step sums are shuffle aggregations (non-ordered),
so fitted parameters carry ~1e-12 run-to-run jitter — pytest-grade
evidence (tolerance differentials), not a hash-exact oracle
surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double_array(vals) -> "F.Column":
    return F.array(*[F.lit(float(v)) for v in vals])


def _check_votes(df: DataFrame, votes_col: str, n_lfs: int) -> None:
    bad = df.filter(
        F.col(votes_col).isNull()
        | (F.size(F.col(votes_col)) != n_lfs)
        | F.exists(
            F.col(votes_col), lambda v: ~v.isin(-1, 0, 1) | v.isNull()
        )
    ).limit(1)
    if bad.count() > 0:
        raise ValueError(
            f"{votes_col} must be non-null arrays of length {n_lfs} "
            "with every vote in {-1, 0, 1}"
        )


def majority_vote(
    df: DataFrame, votes_col: str = "votes", out_col: str = "mv_label"
) -> DataFrame:
    """Baseline aggregation: sign of the non-abstain vote sum
    (+1 / -1), null when tied or all-abstain. One ordered fold,
    scan-local."""
    s = F.aggregate(
        F.col(votes_col), F.lit(0), lambda acc, v: acc + v
    )
    return df.withColumn(
        out_col,
        F.when(s > 0, F.lit(1)).when(s < 0, F.lit(-1)).otherwise(
            F.lit(None).cast("int")
        ),
    )


def lf_summary(df: DataFrame, votes_col: str = "votes") -> DataFrame:
    """Per-LF diagnostics (Snorkel's LFAnalysis): (lf, coverage,
    overlaps, conflicts) — fraction of docs the LF labels, labels
    alongside >=1 other LF, and disagrees with >=1 other non-abstain
    LF. One posexplode + per-doc window-free self-stats via the
    precomputed row aggregates; integer-exact counts. Every LF gets
    a row — an LF that always abstains reports all zeros."""
    n = df.count()
    if n == 0:
        raise ValueError("empty corpus")
    first = df.select(F.size(F.col(votes_col)).alias("k")).first()
    n_lfs = int(first["k"]) if first["k"] is not None else 0
    pos_cnt = F.aggregate(
        F.col(votes_col), F.lit(0),
        lambda acc, v: acc + F.when(v == 1, 1).otherwise(0),
    )
    neg_cnt = F.aggregate(
        F.col(votes_col), F.lit(0),
        lambda acc, v: acc + F.when(v == -1, 1).otherwise(0),
    )
    ex = (
        df.select(
            pos_cnt.alias("_pos"),
            neg_cnt.alias("_neg"),
            F.posexplode(F.col(votes_col)).alias("lf", "vote"),
        )
        .filter(F.col("vote") != 0)
        .select(
            "lf",
            ((F.col("_pos") + F.col("_neg")) > 1).cast("long").alias("_ovl"),
            (
                F.when(F.col("vote") == 1, F.col("_neg") > 0).otherwise(
                    F.col("_pos") > 0
                )
            ).cast("long").alias("_cfl"),
        )
    )
    spark = df.sparkSession
    all_lfs = spark.range(n_lfs).select(F.col("id").cast("int").alias("lf"))
    stats = ex.groupBy("lf").agg(
        (F.count("*") / F.lit(float(n))).alias("coverage"),
        (F.sum("_ovl") / F.lit(float(n))).alias("overlaps"),
        (F.sum("_cfl") / F.lit(float(n))).alias("conflicts"),
    )
    return (
        all_lfs.join(stats, "lf", "left")
        .select(
            "lf",
            *[
                F.coalesce(F.col(c), F.lit(0.0)).alias(c)
                for c in ("coverage", "overlaps", "conflicts")
            ],
        )
        .orderBy("lf")
    )


def _posterior_col(votes_col: str, pi: float, alphas: list[float]):
    """log-odds -> P(y=+1 | votes) as one codegen expression:
    ordered fold of per-LF log-likelihood ratios over the vote
    array, abstains contributing zero."""
    llr = _as_double_array(
        [math.log(a) - math.log1p(-a) for a in alphas]
    )
    logit = F.aggregate(
        F.zip_with(
            F.col(votes_col), llr, lambda v, r: v.cast("double") * r
        ),
        F.lit(math.log(pi) - math.log1p(-pi)),
        lambda acc, x: acc + x,
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))


def fit_label_model(
    df: DataFrame,
    votes_col: str = "votes",
    n_lfs: int | None = None,
    n_iter: int = 25,
    init_alpha: float = 0.7,
    alpha_floor: float = 1e-3,
) -> dict:
    """Learn {"pi": float, "alphas": [K floats]} by EM. ``n_lfs``
    defaults to the first row's vote-array length; vote arrays are
    validated up front (ragged / out-of-domain raise). Accuracies
    are clamped to [alpha_floor, 1 - alpha_floor] so a degenerate
    LF cannot produce infinite log-odds; symmetric init (0.5 prior,
    uniform ``init_alpha``) keeps the fit deterministic up to float
    aggregation jitter. Each iteration is one E-projection + one
    K-row M-aggregation over ``df`` — persist the input upstream if
    it is expensive to recompute, and fit on a sample at corpus
    scale (module docstring)."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0.0 < init_alpha < 1.0:
        raise ValueError(f"init_alpha must be in (0,1), got {init_alpha}")
    first = df.select(F.size(F.col(votes_col)).alias("k")).first()
    if first is None:
        raise ValueError("empty corpus")
    if n_lfs is None:
        if first["k"] is None:
            raise ValueError(f"{votes_col} is null on the first row")
        n_lfs = int(first["k"])
    if n_lfs < 1:
        raise ValueError(f"need at least one labeling function, got {n_lfs}")
    _check_votes(df, votes_col, n_lfs)

    pi = 0.5
    alphas = [float(init_alpha)] * n_lfs
    lo, hi = float(alpha_floor), 1.0 - float(alpha_floor)
    for _ in range(n_iter):
        p = _posterior_col(votes_col, pi, alphas)
        ex = (
            df.select(
                p.alias("_p"),
                F.posexplode(F.col(votes_col)).alias("lf", "vote"),
            )
            # pi update rides the exploded frame: every doc repeats
            # n_lfs times, so sum(_p)/n_lfs recovers the plain sum
            .select(
                "lf",
                "vote",
                "_p",
                F.when(F.col("vote") == 1, F.col("_p"))
                .when(F.col("vote") == -1, 1.0 - F.col("_p"))
                .otherwise(F.lit(0.0))
                .alias("_correct"),
            )
        )
        stats = (
            ex.groupBy("lf")
            .agg(
                F.sum("_correct").alias("c"),
                F.sum((F.col("vote") != 0).cast("double")).alias("n"),
                F.sum("_p").alias("psum"),
                F.count("*").alias("rows"),
            )
            .collect()
        )
        total_p = sum(r["psum"] for r in stats)
        total_rows = sum(r["rows"] for r in stats)
        pi = min(max(total_p / total_rows, lo), hi)
        new_alphas = list(alphas)
        for r in stats:
            if r["n"] > 0:
                new_alphas[r["lf"]] = min(max(r["c"] / r["n"], lo), hi)
        alphas = new_alphas
    return {"pi": float(pi), "alphas": [float(a) for a in alphas]}


def label_posteriors(
    df: DataFrame,
    params: dict,
    votes_col: str = "votes",
    out_col: str = "p_pos",
    validate: bool = True,
) -> DataFrame:
    """Score pass: P(y=+1 | votes) under fitted ``params`` — one
    codegen projection, no shuffle, no UDF. All-abstain rows get
    exactly the prior. ``validate`` runs an up-front domain check
    (one extra corpus pass); pass False on a corpus-scale run whose
    votes the fit already validated — a malformed row then scores
    null instead of raising."""
    alphas = list(params["alphas"])
    if validate:
        _check_votes(df, votes_col, len(alphas))
    return df.withColumn(
        out_col, _posterior_col(votes_col, float(params["pi"]), alphas)
    )
