"""Gate-promotion staging proofs.

q123_curriculum_stages was staged at r12 and REGISTERED at r13;
q124_bigram_counts was staged at r13 and REGISTERED at r14;
q125_sb_match_profile was staged at r14 and REGISTERED at r15 (all
stamped rotation plans executed on schedule) — their registration
invariants flipped to "is in the catalog AND in the gate window" at
registration, then relaxed to catalog membership once their first
driver row landed.

q126_nb_confusion is the r16 registration (plans/catalog.py's STAGED
block). ADVICE r15 correctly flagged that its r15 staging shipped
WITHOUT the staging parity test this file's pattern demands — the
parity AND the top-2 argmax-margin check land here with the
registration, so both run on every pytest from r16 onward.
"""

from __future__ import annotations

import pytest

from tests.oracle_utils import compare, run_duckdb
from utc_cuip_kafka_aws_connector_spark.plans.catalog import (
    STAGED_Q123_NAME,
    STAGED_Q124_NAME,
    STAGED_Q125_NAME,
    STAGED_Q125_ORACLE,
    STAGED_Q126_NAME,
    STAGED_Q126_ORACLE,
    STAGED_Q127_MERGES,
    STAGED_Q127_NAME,
    STAGED_Q127_ORACLE,
    STAGED_Q128_NAME,
    STAGED_Q128_ORACLE,
    STAGED_Q129_NAME,
    STAGED_Q129_ORACLE,
    queries,
    staged_q125_sb_match_profile,
    staged_q126_nb_confusion,
    staged_q127_bytelevel_encode,
    staged_q128_hard_negatives,
    staged_q129_preference_pairs,
)


def test_q123_registered_at_r13():
    """Registered at r13; rests between rotations, but it must still
    be in the catalog."""
    assert STAGED_Q123_NAME in queries()


def test_q124_registered_at_r14():
    """Registered at r14 (driver row r14, re-attested r15 by the
    rebalance pull); catalog membership is the standing invariant."""
    assert STAGED_Q124_NAME in queries()


def test_staged_q125_matches_oracle(spark, sf_dir):
    got = staged_q125_sb_match_profile(spark, sf_dir)
    want = run_duckdb(STAGED_Q125_ORACLE, sf_dir)
    compare(got, want, STAGED_Q125_NAME)


def test_q125_registered_at_r15():
    """Registered at r15 (driver row r15); at r16 it rests on that
    row, so the standing invariant is catalog membership."""
    assert STAGED_Q125_NAME in queries()


def test_staged_q126_matches_oracle(spark, sf_dir):
    got = staged_q126_nb_confusion(spark, sf_dir)
    want = run_duckdb(STAGED_Q126_ORACLE, sf_dir)
    compare(got, want, STAGED_Q126_NAME)


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01"],
    ids=["sf0.001", "sf0.01"],
)
def test_q126_argmax_margin_dwarfs_float_noise(sf_dir):
    """q126's only float surface is the per-doc argmax over log-joint
    sums; the integer confusion matrix is hash-safe ONLY while the
    fixture's top-2 score margin dwarfs the cross-engine libm /
    summation-order noise floor (~1e-11 absolute at these magnitudes).
    The margin query is derived from the oracle text itself (same CTE
    chain through ``scores``) so it cannot drift from what the parity
    actually runs. Parametrized over BOTH the smoke SF and the
    DRIVER'S sf0.01 (review r16: the gate hashes at sf0.01, so the
    safety argument must be asserted there, not only quoted).
    Measured: 9.62 at sf0.001, 5.71 at sf0.01 — >11 orders above the
    noise floor; exact intra-engine ties would be safe too (identical
    per-engine values, label-asc break), but the fixtures have
    none."""
    prefix = STAGED_Q126_ORACLE.split("pred AS (")[0].rstrip().rstrip(",")
    margin_sql = prefix + """,
    ranked AS (
      SELECT doc_id, score,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, label
             ) AS rn
      FROM scores
    )
    SELECT min(a.score - b.score) AS min_margin,
           count(*) FILTER (WHERE a.score = b.score) AS n_exact_ties
    FROM ranked a JOIN ranked b USING (doc_id)
    WHERE a.rn = 1 AND b.rn = 2
    """
    row = run_duckdb(margin_sql, sf_dir).iloc[0]
    assert row["n_exact_ties"] == 0
    assert row["min_margin"] > 1.0, row["min_margin"]


def test_q126_registered_and_resting():
    """Registered at r16 (it held a window slot there and got its
    green CORRECTNESS_r16 row); from r17 it RESTS on that row inside
    the 2-round contract like any other cohort member — in the
    catalog, window membership governed by the rotation, never
    silently dropped."""
    assert STAGED_Q126_NAME in queries()
    import json
    import os

    corr = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r16.json")
    row = json.load(open(corr))[STAGED_Q126_NAME]
    assert row["rows_match"] and row["schema_match"] and row["hash_match"]


def test_staged_q127_matches_oracle(spark, sf_dir):
    """The r17 promotion lands pre-proven: the byte-level encode
    differential (spec_encode's ranked heap encoder vs the oracle's
    framed sequential-REPLACE replay) runs on every pytest from the
    r16 staging onward — the q124/q125 recipe, and the test ADVICE
    r15 flagged q126's staging for shipping without."""
    got = staged_q127_bytelevel_encode(spark, sf_dir)
    want = run_duckdb(STAGED_Q127_ORACLE, sf_dir)
    compare(got, want, STAGED_Q127_NAME)


def test_q127_merge_table_is_well_formed():
    """Sequential-REPLACE replay == the ranked heap encoder ONLY on
    well-formed tables (each merge side is a base symbol or an
    EARLIER merge's result) — the equivalence the oracle rests on,
    so the committed table must stay well-formed by construction."""
    known = {chr(c) for c in range(0x21, 0x7F)} | {"Ġ"}
    for a, b in STAGED_Q127_MERGES:
        assert a in known, f"merge side {a!r} is not derivable yet"
        assert b in known, f"merge side {b!r} is not derivable yet"
        known.add(a + b)


def test_q127_registered_and_resting():
    """Registered at r17 (it held a window slot there and got its
    green CORRECTNESS_r17 row); from r18 it RESTS on that row inside
    the 2-round contract like any other cohort member — in the
    catalog, window membership governed by the rotation, never
    silently dropped."""
    assert STAGED_Q127_NAME in queries()
    import json
    import os

    corr = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r17.json")
    row = json.load(open(corr))[STAGED_Q127_NAME]
    assert row["rows_match"] and row["schema_match"] and row["hash_match"]


def test_staged_q128_matches_oracle(spark, sf_dir):
    """The r18 promotion lands pre-proven: the hard-negatives
    differential (the IVF scale path at the exhaustive
    nprobe == n_centroids setting vs the brute all-pairs SQL replay)
    runs on every pytest from the r17 staging onward — the
    q124/q125/q126/q127 recipe. Exactness premise: both engines fold
    the cosine dot product in index order (bit-identical raw sims),
    so the rank window is integer-exact; full-probe IVF == brute is
    pinned independently by tests/test_negatives.py."""
    got = staged_q128_hard_negatives(spark, sf_dir)
    want = run_duckdb(STAGED_Q128_ORACLE, sf_dir)
    compare(got, want, STAGED_Q128_NAME)


def test_q128_registered_and_resting():
    """Registered at r18, PULLED and re-attested at r19 (the r15
    rebalance precedent — the negatives.py no-op-distinct removal
    routed through the gate); at r20 it RESTS on its fresh green
    CORRECTNESS_r19 row inside the 2-round contract — in the catalog,
    window membership governed by the rotation, never silently
    dropped."""
    assert STAGED_Q128_NAME in queries()
    import json
    import os

    corr = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r19.json")
    row = json.load(open(corr))[STAGED_Q128_NAME]
    assert row["rows_match"] and row["schema_match"] and row["hash_match"]


def test_staged_q129_matches_oracle(spark, sf_dir):
    """The r19 promotion lands pre-proven: the best_worst
    preference-pairs differential (two Spark windows + self-join vs
    the DuckDB window+self-join phrasing) runs on every pytest from
    the r18 staging onward — the q124-q128 recipe. Exactness
    premise: o_totalprice is DOUBLE and _validated casts scores to
    double in-plan, so both engines rank identical doubles and the
    margin is one IEEE subtraction — bit-identical, hash-safe."""
    got = staged_q129_preference_pairs(spark, sf_dir)
    want = run_duckdb(STAGED_Q129_ORACLE, sf_dir)
    compare(got, want, STAGED_Q129_NAME)


def test_q129_registered_and_resting():
    """Registered at r19 (it held a window slot there and got its
    green CORRECTNESS_r19 row); from r20 it RESTS on that row inside
    the 2-round contract like any other cohort member — in the
    catalog, window membership governed by the rotation, never
    silently dropped."""
    assert STAGED_Q129_NAME in queries()
    import json
    import os

    corr = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r19.json")
    row = json.load(open(corr))[STAGED_Q129_NAME]
    assert row["rows_match"] and row["schema_match"] and row["hash_match"]


def test_staged_q130_matches_oracle(spark, sf_dir):
    """The r20 promotion lands pre-proven: the retention-curve
    differential (one-pass grid histogram + driver suffix sums vs
    the DuckDB grid cross-join replay) runs on every pytest from the
    r19 staging onward — the q124-q129 recipe. Exactness premise:
    docs_kept is integer-exact, the grid is the same IEEE
    multiply-add over the same literals in both engines, the score
    is one bigint/literal division + least both sides, and
    docs_frac is one division of two exact integers."""
    from utc_cuip_kafka_aws_connector_spark.plans.catalog import (
        STAGED_Q130_NAME,
        STAGED_Q130_ORACLE,
        staged_q130_retention_curve,
    )

    got = staged_q130_retention_curve(spark, sf_dir)
    want = run_duckdb(STAGED_Q130_ORACLE, sf_dir)
    compare(got, want, STAGED_Q130_NAME)


def test_q130_registered_and_verified():
    """Registered at r20 (it held a window slot there — before its
    first driver row, resting was not an option) and now resting on
    its green CORRECTNESS_r20 row inside the 2-round contract like
    any other cohort member: in the catalog, window membership
    governed by the rotation, never silently dropped. (Until the r20
    driver run landed, this test instead pinned the window slot
    itself.)"""
    from utc_cuip_kafka_aws_connector_spark.plans.catalog import (
        STAGED_Q130_NAME,
    )

    assert STAGED_Q130_NAME in queries()
    import json
    import os

    corr = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r20.json")
    row = json.load(open(corr))[STAGED_Q130_NAME]
    assert row["rows_match"] and row["schema_match"] and row["hash_match"]
