"""Preference-pair construction — the RLHF/DPO training-data op
(reward-model and direct-preference training consume (prompt, chosen,
rejected) pairs built from scored candidate responses; the standard
recipes are best-vs-worst per prompt, best-vs-rest, and all ordered
pairs above a score margin — e.g. InstructGPT's ranking data,
Ouyang et al. 2022, and the DPO formulation, Rafailov et al. 2023).

Input model: one row per candidate response —
``(prompt_col, id_col, score_col[, text_col])`` — many responses per
prompt. Output: one row per training pair —
``(prompt, chosen_id, rejected_id, margin[, chosen_text,
rejected_text])`` — with a strict, deterministic ordering contract
(ties NEVER pair; every tie-break is by response id).

Scale shape: every strategy shuffles on ``prompt_col`` exactly once —
``best_worst``/``best_rest`` are per-prompt windows, ``all_pairs`` is
a self-EQUI-join on the prompt key (per-prompt response counts are
small and bounded in practice — the join is |prompt| * k^2, never
corpus x corpus). Zero UDFs: the whole plan is codegen
filter/window/join, so Catalyst pushes the score/validity predicates
into the scan. Fully SQL-expressible (window + self-join), so the op
carries an exact DuckDB oracle in the parity suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_STRATEGIES = ("best_worst", "best_rest", "all_pairs")


def _validated(
    df: DataFrame,
    prompt_col: str,
    id_col: str,
    score_col: str,
    text_col: str | None,
) -> DataFrame:
    """Normalized candidate frame (prompt, rid, score[, text]); rows
    with a null prompt, id, or score — or a NaN score — are dropped:
    an unscored or unkeyed response can neither rank nor pair,
    silently grouping nulls would fabricate a phantom prompt, and a
    NaN score would win every Spark ordering."""
    cols = [
        F.col(prompt_col).alias("prompt"),
        F.col(id_col).alias("rid"),
        F.col(score_col).cast("double").alias("score"),
    ]
    if text_col is not None:
        cols.append(F.col(text_col).alias("text"))
    # NaN scores would WIN every ordering (Spark sorts NaN above all
    # numbers) and emit NaN-margin pairs — dropped with the nulls
    return df.select(*cols).filter(
        F.col("prompt").isNotNull()
        & F.col("rid").isNotNull()
        & F.col("score").isNotNull()
        & ~F.isnan(F.col("score"))
    )


def preference_pairs(
    df: DataFrame,
    prompt_col: str = "prompt_id",
    id_col: str = "response_id",
    score_col: str = "score",
    text_col: str | None = None,
    strategy: str = "best_worst",
    min_margin: float = 0.0,
    max_pairs_per_prompt: int | None = None,
) -> DataFrame:
    """(prompt, chosen_id, rejected_id, margin[, chosen_text,
    rejected_text]): preference pairs from scored responses.

    ``margin`` = chosen score - rejected score and is ALWAYS strictly
    positive: tied scores never form a pair (a tie carries no
    preference signal; emitting it would teach the model noise), and
    ``min_margin`` > 0 additionally requires ``margin >= min_margin``.

    Strategies:

    - ``best_worst``: one pair per prompt — the top-scored response
      (ties broken by smallest ``rid``) against the bottom-scored one
      (ties broken by LARGEST ``rid``, so a two-way tie at a prompt's
      only two scores yields no self-pair and no pair at all).
    - ``best_rest``: the top response (same winner rule) against
      every other response that clears the margin, weakest rejected
      first when capped.
    - ``all_pairs``: every ordered pair that clears the margin —
      the full ranking signal, |responses|^2 per prompt; cap it.

    ``max_pairs_per_prompt`` keeps the largest-margin pairs per
    prompt (ties by rejected ``rid`` asc, then chosen ``rid`` asc —
    fully deterministic).

    When ``text_col`` is given, the pair carries both texts and
    pairs whose texts are equal (null-safe) are dropped — two
    identical strings with different scores are labeling noise, not
    a preference.

    Rows with null prompt/id/score are excluded (documented in
    :func:`_validated`). Duplicate ``(prompt, rid)`` keys are the
    caller's bug; each duplicate ranks independently."""
    if strategy not in _STRATEGIES:
        raise ValueError(
            f"strategy must be one of {_STRATEGIES}, got {strategy!r}"
        )
    if min_margin < 0:
        raise ValueError(f"min_margin must be >= 0, got {min_margin}")
    if max_pairs_per_prompt is not None and max_pairs_per_prompt < 1:
        raise ValueError(
            f"max_pairs_per_prompt must be >= 1, got {max_pairs_per_prompt}"
        )

    cand = _validated(df, prompt_col, id_col, score_col, text_col)
    has_text = text_col is not None

    def chosen_side(c: DataFrame) -> DataFrame:
        cols = [
            F.col("prompt"),
            F.col("rid").alias("chosen_id"),
            F.col("score").alias("c_score"),
        ]
        if has_text:
            cols.append(F.col("text").alias("chosen_text"))
        return c.select(*cols)

    def rejected_side(c: DataFrame) -> DataFrame:
        cols = [
            F.col("prompt"),
            F.col("rid").alias("rejected_id"),
            F.col("score").alias("r_score"),
        ]
        if has_text:
            cols.append(F.col("text").alias("rejected_text"))
        return c.select(*cols)

    if strategy == "all_pairs":
        pairs = chosen_side(cand).join(rejected_side(cand), "prompt")
    else:
        w_best = W.partitionBy("prompt").orderBy(
            F.col("score").desc(), F.col("rid").asc()
        )
        best = (
            cand.withColumn("rk", F.row_number().over(w_best))
            .filter(F.col("rk") == 1)
            .drop("rk")
        )
        if strategy == "best_worst":
            w_worst = W.partitionBy("prompt").orderBy(
                F.col("score").asc(), F.col("rid").desc()
            )
            rest = (
                cand.withColumn("rk", F.row_number().over(w_worst))
                .filter(F.col("rk") == 1)
                .drop("rk")
            )
        else:  # best_rest: everything, self excluded by margin+id below
            rest = cand
        pairs = chosen_side(best).join(rejected_side(rest), "prompt")

    margin = F.col("c_score") - F.col("r_score")
    pairs = pairs.filter(
        (F.col("chosen_id") != F.col("rejected_id"))
        & (margin > 0)
        & (margin >= F.lit(float(min_margin)))
    )
    if has_text:
        pairs = pairs.filter(
            ~F.col("chosen_text").eqNullSafe(F.col("rejected_text"))
        )

    out_cols = [
        "prompt",
        "chosen_id",
        "rejected_id",
        margin.alias("margin"),
    ]
    if has_text:
        out_cols += ["chosen_text", "rejected_text"]
    out = pairs.select(*out_cols)

    if max_pairs_per_prompt is not None:
        w_cap = W.partitionBy("prompt").orderBy(
            F.col("margin").desc(),
            F.col("rejected_id").asc(),
            F.col("chosen_id").asc(),
        )
        out = (
            out.withColumn("rk", F.row_number().over(w_cap))
            .filter(F.col("rk") <= max_pairs_per_prompt)
            .drop("rk")
        )
    return out


def best_of_n(
    df: DataFrame,
    prompt_col: str = "prompt_id",
    id_col: str = "response_id",
    score_col: str = "score",
    text_col: str | None = None,
    n: int = 1,
    min_score: float | None = None,
) -> DataFrame:
    """(prompt, response_id, score, rank[, text]): rejection sampling
    / best-of-n selection — keep each prompt's top ``n`` responses by
    (score desc, id asc), the SFT-side complement of
    ``preference_pairs`` (best-of-n distillation trains directly on
    the winners; e.g. the rejection-sampling fine-tuning stage in
    Llama 2, Touvron et al. 2023, and WebGPT's best-of-n baseline,
    Nakano et al. 2021).

    Eligibility matches the pairing functions exactly (``_validated``:
    null prompt/id/score and NaN scores drop); ``min_score`` — a
    reward-model acceptance threshold — filters BEFORE ranking, so a
    prompt whose every response fails it emits nothing (the
    rejection in rejection sampling) rather than promoting its
    least-bad response. ``rank`` is 1-based and deterministic under
    ties (id asc — the same id-order artifact ``prompt_response_
    stats``'s top_is_tied column exists to count).

    Scale shape: one prompt-key exchange for the window; the
    threshold is a codegen predicate pushed at the scan. Fully
    SQL-expressible (window + filter) — carries an exact DuckDB
    differential in the test suite, staged for a future gate."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    base = _validated(df, prompt_col, id_col, score_col, text_col)
    if min_score is not None:
        base = base.filter(F.col("score") >= float(min_score))
    w = W.partitionBy("prompt").orderBy(
        F.col("score").desc(), F.col("rid").asc()
    )
    out_cols = [
        "prompt",
        F.col("rid").alias("response_id"),
        "score",
        "rank",
    ]
    if text_col is not None:
        out_cols.append("text")
    return (
        base.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select(*out_cols)
    )


def prompt_response_stats(
    df: DataFrame,
    prompt_col: str = "prompt_id",
    id_col: str = "response_id",
    score_col: str = "score",
) -> DataFrame:
    """(prompt, n_responses, n_scored, score_min, score_max,
    score_spread, top_is_tied): per-prompt diagnostics for deciding
    pairing strategy and margin — ``top_is_tied`` flags prompts whose
    maximum score is shared by >1 response (the winner there is an
    id-order artifact; a data card should count them). One map-side-
    combined aggregate; null AND NaN scores count in ``n_responses``
    only — NaN is nulled out up front (Spark orders NaN as
    equal-and-greatest, so a raw NaN would become score_max, poison
    score_spread, and make top_is_tied report the NaN rows), keeping
    these diagnostics on exactly the rows ``preference_pairs``
    considers eligible."""
    base = df.filter(
        F.col(prompt_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(prompt_col).alias("prompt"),
        F.col(id_col).alias("rid"),
        F.when(
            ~F.isnan(F.col(score_col).cast("double")),
            F.col(score_col).cast("double"),
        ).alias("s"),
    )
    # window + groupBy share the prompt hash partitioning — one
    # exchange, reused (null comparison -> null -> count_if skips it,
    # so an unscored prompt reports top_is_tied = false)
    is_top = F.col("s") == F.max("s").over(W.partitionBy("prompt"))
    return (
        base.withColumn("is_top", is_top)
        .groupBy("prompt")
        .agg(
            F.count("rid").alias("n_responses"),
            F.count("s").alias("n_scored"),
            F.min("s").alias("score_min"),
            F.max("s").alias("score_max"),
            (F.max("s") - F.min("s")).alias("score_spread"),
            (F.count_if("is_top") > 1).alias("top_is_tied"),
        )
    )
