"""Epoch materialization — turn a per-group mixture ALLOCATION into
the actual repeated corpus (the missing last step of the mixture
toolkit: temperature/UniMax/DoReMi/targets decide how many epochs of
each group to train on; this operator materializes those epochs as
rows, the standard "upsample by repetition" used when the trainer
consumes a flat dataset rather than a weighted sampler).

Semantics: for a group allocated ``e`` epochs, every document
appears ``floor(e)`` times (replica ids 0..floor-1) plus ONE more
replica with probability ``frac(e)``, decided deterministically per
document by the hashdraw kernel (md5 of ``id:floor:salt``) — so a
group at 2.4 epochs repeats every doc twice and a content-stable
40% of docs a third time. Fractional-only allocations (e < 1)
degenerate to a plain deterministic subsample, so DOWN-sampling
rides the same contract. Groups absent from the allocation (or
allocated 0) are dropped — the allocation IS the mixture.

Nesting: the fractional draw is keyed by (id, floor(e), salt), so
raising an allocation within the same integer part (2.4 -> 2.7)
STRICTLY GROWS each group's replica multiset — ablations at nearby
budgets share documents, the same nesting law as hash_sample
thresholds and the reservoir keys. Crossing an integer boundary
re-draws the fractional tier (the old fractional replicas become
guaranteed ones; a fresh draw decides the new fraction).

Scale shape: ONE broadcast join of the mixture-sized allocation
table onto the corpus + one explode of a per-row replica array —
scan-local, no corpus shuffle, output size = sum_g n_g * e_g by
construction. The explode multiplies rows, never widens them;
downstream writers see replica as an ordinary column (include it in
dedup keys ONLY if repeated epochs must survive dedup).

Reference parity note: the reference pipeline has no mixture tier;
this closes SURVEY §2.D's mixtures family (weights -> epochs ->
rows: mixture_weights/unimax/doremi plan, reservoir draws exact
counts, materialize_epochs repeats).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.hashdraw import (
    md5_uniform_key,
)


def allocation_from_weights(
    weights: DataFrame,
    sizes: DataFrame,
    budget: float,
    group_col: str = "lang",
    weight_col: str = "weight",
    size_col: str = "n_tokens",
    max_epochs: float | None = None,
    epochs_ceiling: float = 1000.0,
    localize: bool = True,
) -> DataFrame:
    """(group, n_units, epochs): convert a sampling MIXTURE (weights
    summing to 1 — doremi_weights' output, temperature_weights, a
    hand-written mix) into the epoch allocation ``materialize_epochs``
    consumes: epochs_g = weight_g * budget / n_g. The glue between
    weight-shaped planners and row materialization (unimax emits
    epochs directly and skips this step).

    The mixture precondition is ENFORCED, not just stated (ADVICE
    r17): weights must be finite, non-negative, and sum to 1 within
    1e-6 — a non-mixture input (raw counts, un-normalized scores)
    silently rescales the budget by its sum, which is never what the
    caller meant. Validation costs one aggregate over the WEIGHTS
    table only (O(1) driver data — review r18; a second tiny lookup
    fetches the offending group name on failure), never a corpus
    pass.

    ``max_epochs`` optionally caps each group (the UniMax concern —
    a high weight on a tiny group otherwise materializes dozens of
    repeats); capped surplus is simply UNUSED, stated in the epochs
    column, matching unimax_allocation's surplus semantics rather
    than silently re-spreading. Independent of that cap,
    ``epochs_ceiling`` is a loud sanity bound (the repo's max_*
    refusal contract): if any group's computed epochs exceeds it,
    the call raises instead of materializing per-row F.sequence
    arrays thousands of entries wide — raise the ceiling explicitly
    for a genuinely extreme run. One join of two mixture-sized
    tables; groups missing a size (or sized <= 0) are dropped —
    nothing to repeat.

    With ``localize=True`` (the default — NOTE: a deliberate
    semantics choice, called out here per ADVICE r18) the returned
    allocation is a driver-built frame: the join runs ONCE here —
    incl. whatever corpus lineage ``sizes`` carries — the ceiling
    check rides that same single action, and downstream consumers
    like materialize_epochs's own validation collect do NOT
    re-trigger the sizes aggregation (review r18 — the --budget CLI
    path previously scanned the corpus twice). Cardinality is
    guarded CHEAPLY first (ADVICE r18): the weights-side validation
    aggregate also counts groups, so a >1M-group mixture is refused
    BEFORE anything is collected, not after the driver holds ~1M
    rows. ``localize=False`` keeps the allocation as lazy
    distributed lineage for callers that want it (the ceiling check
    then rides one small max() aggregate; the sizes lineage
    recomputes for downstream actions unless the caller persists)."""
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if max_epochs is not None and max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    if epochs_ceiling <= 0:
        raise ValueError(
            f"epochs_ceiling must be > 0, got {epochs_ceiling}"
        )
    w = weights.select(
        F.col(group_col).alias("__g"),
        F.col(weight_col).cast("double").alias("__w"),
    ).filter(F.col("__g").isNotNull())
    bad_w = (
        F.col("__w").isNull()
        | F.isnan(F.col("__w"))
        | (F.abs(F.col("__w")) == float("inf"))
        | (F.col("__w") < 0)
    )
    stats = w.agg(
        F.count(F.when(bad_w, 1)).alias("n_bad"),
        F.sum(F.when(~bad_w, F.col("__w"))).alias("total"),
        F.count(F.lit(1)).alias("n_groups"),
    ).first()
    if stats["n_groups"] > 1_000_000:
        raise ValueError(
            f"allocation_from_weights: {stats['n_groups']} weight "
            f"rows; group_col={group_col!r} looks high-cardinality "
            "(the allocation is mixture-sized by contract)"
        )
    if stats["n_bad"]:
        offender = w.filter(bad_w).limit(1).collect()[0]
        raise ValueError(
            f"weight for group {offender['__g']!r} is invalid: "
            f"{offender['__w']!r} (need a finite value >= 0; "
            f"{stats['n_bad']} such row(s))"
        )
    total = stats["total"] or 0.0
    if abs(total - 1.0) > 1e-6:
        raise ValueError(
            f"weights sum to {total!r}, not 1 — not a mixture. "
            "Normalize upstream (mixture planners emit weights "
            "summing to 1); passing raw counts here would silently "
            "rescale the budget."
        )
    s = sizes.select(
        F.col(group_col).alias("__g"),
        F.col(size_col).cast("double").alias("__n"),
    ).filter(
        F.col("__g").isNotNull()
        & F.col("__n").isNotNull()
        & (F.col("__n") > 0)
    )
    e = F.col("__w") * F.lit(float(budget)) / F.col("__n")
    if max_epochs is not None:
        e = F.least(e, F.lit(float(max_epochs)))
    out = w.join(s, "__g").select(
        F.col("__g").alias(group_col),
        F.col("__n").alias("n_units"),
        e.alias("epochs"),
    )
    def _refuse_past_ceiling(worst):
        if worst is not None and worst > epochs_ceiling:
            raise ValueError(
                f"computed epochs reach {worst:.1f}, past "
                f"epochs_ceiling={epochs_ceiling} — a tiny group under "
                "a high weight (materializing it would explode per-row "
                "replica arrays). Cap with max_epochs, or raise "
                "epochs_ceiling deliberately."
            )

    if not localize:
        # lazy path: the ceiling check rides one mixture-sized max()
        # aggregate; the allocation lineage stays distributed
        _refuse_past_ceiling(out.agg(F.max("epochs")).first()[0])
        return out
    # ONE action computes the join (and the sizes lineage); the
    # ceiling check and the localized return ride it together. The
    # cardinality was refused up-front from the weights aggregate;
    # the limit here is only a backstop against duplicate group keys
    # multiplying the join
    rows = out.limit(1_000_001).collect()
    if len(rows) > 1_000_000:
        raise ValueError(
            f"allocation_from_weights: allocation has >1M rows despite "
            f"{stats['n_groups']} weight rows — duplicate "
            f"{group_col!r} keys in weights or sizes"
        )
    _refuse_past_ceiling(max((r["epochs"] for r in rows), default=None))
    return out.sparkSession.createDataFrame(rows, out.schema)


def materialize_epochs(
    df: DataFrame,
    alloc: DataFrame,
    group_col: str = "lang",
    epochs_col: str = "epochs",
    id_col: str = "doc_id",
    salt: str = "epochs",
    validate_unique_ids: bool = False,
) -> DataFrame:
    """Input columns + ``replica`` (long, 0-based): the corpus with
    each group's rows repeated per its allocation (see module
    docstring). ``alloc`` must hold ONE row per group (duplicate
    groups would silently double-materialize — refused loudly) with
    a non-negative, non-null epochs value; rows of ``df`` with a
    NULL group or id are dropped (no allocation can address them).

    ``id_col`` is assumed UNIQUE within each group (the same
    assumption the reservoir/sampling modules state): duplicate
    (group, id) corpus rows share one fractional-draw key, so their
    fractional replicas correlate — all copies of a duplicated id
    gain or skip the extra epoch TOGETHER rather than independently
    (integer-part replicas are unaffected). Pass
    ``validate_unique_ids=True`` to refuse duplicates loudly instead
    (one extra corpus aggregate — a count-distinct-shaped groupBy —
    so it is opt-in, not the default scan)."""
    if "replica" in df.columns:
        raise ValueError(
            "materialize_epochs generates a 'replica' column which the "
            "input already has -- rename or drop it first"
        )
    a = alloc.select(
        F.col(group_col).alias("__g"),
        F.col(epochs_col).cast("double").alias("__e"),
    ).filter(F.col("__g").isNotNull())
    # mixture-sized by contract: validate driver-side (duplicates and
    # bad epochs are configuration bugs, not data to tolerate)
    rows = a.limit(1_000_001).collect()
    if len(rows) > 1_000_000:
        raise ValueError(
            f"materialize_epochs: allocation has >1M groups; "
            f"group_col={group_col!r} looks high-cardinality"
        )
    seen = set()
    for r in rows:
        if r["__g"] in seen:
            raise ValueError(
                f"duplicate group {r['__g']!r} in the allocation — one "
                "row per group (did you pass the corpus instead?)"
            )
        seen.add(r["__g"])
        e = r["__e"]
        if e is None or math.isnan(e) or math.isinf(e) or e < 0:
            raise ValueError(
                f"allocation for group {r['__g']!r} has invalid "
                f"epochs={e!r} (need a finite value >= 0)"
            )

    base = df.filter(
        F.col(group_col).isNotNull() & F.col(id_col).isNotNull()
    )
    if validate_unique_ids:
        dup = (
            base.groupBy(group_col, id_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            r = dup[0]
            raise ValueError(
                f"materialize_epochs: duplicate id {r[id_col]!r} in "
                f"group {r[group_col]!r} ({r['count']} rows) — "
                "fractional draws are keyed by (id, floor, salt), so "
                "duplicates would correlate; dedup first or use a "
                "unique id column"
            )
    j = base.join(
        F.broadcast(a), base[group_col] == F.col("__g"), "inner"
    ).drop("__g")
    flr = F.floor(F.col("__e")).cast("long")
    frac = F.col("__e") - flr.cast("double")
    guaranteed = F.when(
        flr > 0, F.sequence(F.lit(0).cast("long"), flr - 1)
    ).otherwise(F.array().cast("array<long>"))
    # fractional tier: one deterministic draw per (id, floor, salt) —
    # floor in the key gives the nesting law the docstring states
    extra = md5_uniform_key(
        F.concat(
            F.col(id_col).cast("string"),
            F.lit(":"),
            flr.cast("string"),
            F.lit(f":{salt}"),
        )
    ) < frac
    replicas = F.when(
        extra, F.concat(guaranteed, F.array(flr))
    ).otherwise(guaranteed)
    return (
        j.withColumn("replica", F.explode(replicas))
        .drop("__e")
    )
