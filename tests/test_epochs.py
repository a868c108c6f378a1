"""operators/epochs.py: epoch materialization (allocation -> rows).

Evidence: an exact pure-Python differential of the full replica
multiset (floor tier + the md5 fractional draw, the hashdraw 13-hex
kernel replicated with hashlib), the nesting law within an integer
part (2.4 -> 2.7 strictly grows every group's multiset), exact
per-group counts (floor*n + |{u < frac}| — deterministic, not
statistical), drop semantics (unallocated/zero groups, null
group/id rows), the loud-validation contract (duplicate groups,
NaN/negative/null epochs, replica collision), and a plan pin
(broadcast join + explode, no corpus shuffle).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.epochs import (
    materialize_epochs,
)
from utc_cuip_kafka_aws_connector_spark.operators.hashdraw import (
    HEX_CHARS,
    SPACE,
)


def _u(doc_id, flr, salt="epochs"):
    h = hashlib.md5(f"{doc_id}:{flr}:{salt}".encode()).hexdigest()
    return int(h[:HEX_CHARS], 16) / SPACE


def _python_replicas(doc_id, e, salt="epochs"):
    flr = int(e)
    reps = list(range(flr))
    if _u(doc_id, flr, salt) < (e - flr):
        reps.append(flr)
    return reps


def _fixture(spark, n=300):
    rows = [
        (i, ["web", "code", "books", "junk"][i % 4]) for i in range(n)
    ]
    rows += [(None, "web"), (9001, None)]  # dropped: null id / group
    return spark.createDataFrame(rows, "doc_id long, lang string")


ALLOC = [("web", 2.4), ("code", 1.0), ("books", 0.3)]  # junk: absent


def test_matches_python_replay_exactly(spark):
    df = _fixture(spark)
    alloc = spark.createDataFrame(ALLOC, "lang string, epochs double")
    got = {}
    for r in materialize_epochs(df, alloc).collect():
        got.setdefault(r["doc_id"], []).append(r["replica"])
    e_of = dict(ALLOC)
    want = {}
    for r in df.collect():
        if r["doc_id"] is None or r["lang"] is None or r["lang"] not in e_of:
            continue
        reps = _python_replicas(r["doc_id"], e_of[r["lang"]])
        if reps:
            want[r["doc_id"]] = reps
    assert {k: sorted(v) for k, v in got.items()} == want
    # exact per-group counts: floor*n + |{u < frac}|
    counts = {
        r["lang"]: r["n"]
        for r in materialize_epochs(df, alloc)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_web = 75  # 300 docs % 4
    extra_web = sum(1 for i in range(300) if i % 4 == 0 and _u(i, 2) < 0.4)
    assert counts["web"] == 2 * n_web + extra_web
    assert counts["code"] == 75  # exactly one epoch, no draw
    assert counts.get("books", 0) == sum(
        1 for i in range(300) if i % 4 == 2 and _u(i, 0) < 0.3
    )
    assert "junk" not in counts  # unallocated group dropped


def test_nesting_within_integer_part(spark):
    df = _fixture(spark)
    lo = spark.createDataFrame([("web", 2.4)], "lang string, epochs double")
    hi = spark.createDataFrame([("web", 2.7)], "lang string, epochs double")
    key = lambda r: (r["doc_id"], r["replica"])  # noqa: E731
    got_lo = {key(r) for r in materialize_epochs(df, lo).collect()}
    got_hi = {key(r) for r in materialize_epochs(df, hi).collect()}
    assert got_lo < got_hi  # strict growth, same floor


def test_zero_and_subsample_allocations(spark):
    df = _fixture(spark)
    alloc = spark.createDataFrame(
        [("web", 0.0), ("code", 0.5)], "lang string, epochs double"
    )
    out = materialize_epochs(df, alloc)
    assert out.filter(F.col("lang") == "web").count() == 0
    # pure subsample: every kept row is replica 0, count matches the
    # deterministic draw
    code = out.filter(F.col("lang") == "code").collect()
    assert all(r["replica"] == 0 for r in code)
    assert len(code) == sum(
        1 for i in range(300) if i % 4 == 1 and _u(i, 0) < 0.5
    )


def test_validation_errors(spark):
    df = _fixture(spark)
    dup = spark.createDataFrame(
        [("web", 1.0), ("web", 2.0)], "lang string, epochs double"
    )
    with pytest.raises(ValueError, match="duplicate group"):
        materialize_epochs(df, dup)
    for bad in (float("nan"), float("inf"), -1.0, None):
        alloc = spark.createDataFrame(
            [("web", bad)], "lang string, epochs double"
        )
        with pytest.raises(ValueError, match="invalid"):
            materialize_epochs(df, alloc)
    with pytest.raises(ValueError, match="replica"):
        materialize_epochs(
            df.withColumn("replica", F.lit(0)),
            spark.createDataFrame([("web", 1.0)], "lang string, epochs double"),
        )


def test_plan_is_broadcast_join_no_corpus_shuffle(spark):
    from tests.plan_utils import formatted_plan

    df = _fixture(spark)
    alloc = spark.createDataFrame(ALLOC, "lang string, epochs double")
    plan = formatted_plan(materialize_epochs(df, alloc))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Generate" in plan  # the explode


def test_allocation_from_weights_arithmetic_and_cap(spark):
    """weights -> epochs glue: epochs = w * budget / n, optional
    UniMax-style cap with surplus UNUSED; missing/empty sizes drop."""
    from utc_cuip_kafka_aws_connector_spark.operators.epochs import (
        allocation_from_weights,
    )

    w = spark.createDataFrame(
        [("web", 0.5), ("code", 0.4), ("ghost", 0.1)],
        "lang string, weight double",
    )
    s = spark.createDataFrame(
        [("web", 1000.0), ("code", 100.0), ("empty", 0.0)],
        "lang string, n_tokens double",
    )
    got = {
        r["lang"]: r
        for r in allocation_from_weights(w, s, budget=1000.0).collect()
    }
    assert set(got) == {"web", "code"}  # ghost unsized, empty zero-sized
    assert got["web"]["epochs"] == pytest.approx(0.5)   # 500 / 1000
    assert got["code"]["epochs"] == pytest.approx(4.0)  # 400 / 100
    capped = {
        r["lang"]: r["epochs"]
        for r in allocation_from_weights(
            w, s, budget=1000.0, max_epochs=2.0
        ).collect()
    }
    assert capped["code"] == pytest.approx(2.0)  # surplus unused
    assert capped["web"] == pytest.approx(0.5)   # uncapped unchanged
    with pytest.raises(ValueError, match="budget"):
        allocation_from_weights(w, s, budget=0.0)
    with pytest.raises(ValueError, match="max_epochs"):
        allocation_from_weights(w, s, budget=1.0, max_epochs=0.0)


def test_unimax_to_epochs_contract(spark):
    """The column contract holds end-to-end: unimax_allocation's
    (group, epochs) feeds materialize_epochs unmodified, and the
    materialized per-group counts obey the exact size law."""
    from utc_cuip_kafka_aws_connector_spark.operators.epochs import (
        materialize_epochs,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.unimax import (
        unimax_allocation,
    )

    df = spark.createDataFrame(  # exactly 75 docs per lang, 4 langs
        [(i, ["web", "code", "books", "junk"][i % 4]) for i in range(300)],
        "doc_id long, lang string",
    )
    sizes = df.groupBy("lang").count().withColumnRenamed("count", "n_tokens")
    alloc = unimax_allocation(
        sizes, budget=450.0, max_epochs=2.0, pre_aggregated=True
    )
    out = materialize_epochs(df, alloc)
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    epochs = {r["lang"]: r["epochs"] for r in alloc.collect()}
    for g, e in epochs.items():
        flr = int(e)
        assert flr * 75 <= counts.get(g, 0) <= (flr + 1) * 75, (g, e)
    # exact budget shape: 4 langs x 75 docs, budget 450, cap 2.0 ->
    # fair share 112.5 < cap*75=150, so every lang gets 1.5 epochs
    assert all(e == pytest.approx(1.5) for e in epochs.values())


def test_allocation_weights_must_be_a_mixture(spark):
    """ADVICE r17: the docstring's mixture precondition is enforced —
    negative / NaN weights and a sum away from 1 refuse loudly
    instead of silently rescaling the budget."""
    from utc_cuip_kafka_aws_connector_spark.operators.epochs import (
        allocation_from_weights,
    )

    s = spark.createDataFrame(
        [("web", 1000.0), ("code", 100.0)], "lang string, n_tokens double"
    )
    bad_sum = spark.createDataFrame(
        [("web", 0.5), ("code", 0.2)], "lang string, weight double"
    )
    with pytest.raises(ValueError, match="not a mixture"):
        allocation_from_weights(bad_sum, s, budget=100.0)
    negative = spark.createDataFrame(
        [("web", 1.5), ("code", -0.5)], "lang string, weight double"
    )
    with pytest.raises(ValueError, match="invalid"):
        allocation_from_weights(negative, s, budget=100.0)
    nan = spark.createDataFrame(
        [("web", float("nan")), ("code", 1.0)], "lang string, weight double"
    )
    with pytest.raises(ValueError, match="invalid"):
        allocation_from_weights(nan, s, budget=100.0)
    # a 1e-7 drift is within tolerance (doremi/temperature outputs
    # are float-normalized, never exactly 1)
    near = spark.createDataFrame(
        [("web", 0.6), ("code", 0.4 + 5e-8)], "lang string, weight double"
    )
    assert allocation_from_weights(near, s, budget=100.0).count() == 2


def test_allocation_epochs_ceiling_refuses_loudly(spark):
    """ADVICE r17: a high weight on a tiny group must refuse at the
    sanity ceiling rather than materialize huge per-row replica
    arrays; max_epochs (capped, surplus unused) and an explicitly
    raised ceiling are the two sanctioned outs."""
    from utc_cuip_kafka_aws_connector_spark.operators.epochs import (
        allocation_from_weights,
    )

    w = spark.createDataFrame(
        [("tiny", 0.9), ("web", 0.1)], "lang string, weight double"
    )
    s = spark.createDataFrame(
        [("tiny", 2.0), ("web", 1_000_000.0)],
        "lang string, n_tokens double",
    )
    # tiny: 0.9 * 1e7 / 2 = 4.5M epochs >> 1000
    with pytest.raises(ValueError, match="epochs_ceiling"):
        allocation_from_weights(w, s, budget=1e7)
    capped = {
        r["lang"]: r["epochs"]
        for r in allocation_from_weights(
            w, s, budget=1e7, max_epochs=4.0
        ).collect()
    }
    assert capped["tiny"] == pytest.approx(4.0)
    raised = allocation_from_weights(
        w, s, budget=1e7, epochs_ceiling=5e6
    ).count()
    assert raised == 2
    with pytest.raises(ValueError, match="epochs_ceiling"):
        allocation_from_weights(w, s, budget=1e7, epochs_ceiling=0.0)


def test_duplicate_ids_refused_when_validated(spark):
    """ADVICE r17 (carried): duplicate (group, id) corpus rows share
    a fractional-draw key — correlated replicas. Documented by
    default; validate_unique_ids=True refuses loudly."""
    df = spark.createDataFrame(
        [(1, "web"), (1, "web"), (2, "web")], "doc_id long, lang string"
    )
    alloc = spark.createDataFrame([("web", 1.5)], "lang string, epochs double")
    # default: tolerated (docstring states the correlation), and the
    # duplicate's copies draw IDENTICALLY — together in or out
    reps = [
        r["replica"]
        for r in materialize_epochs(df, alloc).collect()
        if r["doc_id"] == 1
    ]
    assert sorted(reps) in ([0, 0], [0, 0, 1, 1])
    with pytest.raises(ValueError, match="duplicate id"):
        materialize_epochs(df, alloc, validate_unique_ids=True)


def test_allocation_from_weights_localize_false_stays_lazy(spark):
    """ADVICE r18: localize=False returns the distributed allocation
    (same rows, lazy lineage) and the ceiling still refuses through
    its one small aggregate."""
    from utc_cuip_kafka_aws_connector_spark.operators.epochs import (
        allocation_from_weights,
    )

    w = spark.createDataFrame(
        [("en", 0.8), ("de", 0.2)], "lang string, weight double"
    )
    s = spark.createDataFrame(
        [("en", 100.0), ("de", 50.0)], "lang string, n_tokens double"
    )
    lazy = allocation_from_weights(w, s, budget=100.0, localize=False)
    local = allocation_from_weights(w, s, budget=100.0)
    assert sorted(map(tuple, lazy.collect())) == sorted(
        map(tuple, local.collect())
    )
    # lazy lineage keeps the weights-sizes join; the localized frame
    # is a flat driver-built scan with no join left in it
    assert "Join" in lazy._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in local._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError, match="epochs_ceiling"):
        allocation_from_weights(
            w, s, budget=100000.0, localize=False, epochs_ceiling=10.0
        )


def test_allocation_from_weights_duplicate_group_keys_backstop(spark):
    """The localized collect's limit is a backstop against duplicate
    group keys multiplying the join — the refusal message names the
    cause (the >1M-groups case is refused earlier, before any
    collect, from the weights-side aggregate)."""
    from utc_cuip_kafka_aws_connector_spark.operators.epochs import (
        allocation_from_weights,
    )

    w = spark.createDataFrame(
        [("en", 0.5), ("en", 0.5)], "lang string, weight double"
    )
    s = spark.createDataFrame(
        [("en", 100.0)], "lang string, n_tokens double"
    )
    # duplicate keys do not trip the 1M backstop at this size; the
    # allocation simply carries both rows (documented: weights is a
    # mixture table, one row per group, validated upstream)
    assert allocation_from_weights(w, s, budget=100.0).count() == 2
