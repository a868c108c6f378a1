"""operators/prefpairs.py: preference-pair construction.

Evidence: exact pure-Python differential for all three strategies on
a randomized scored-responses fixture (margins, tie-breaks, and caps
all reach the comparison), a DuckDB window+self-join differential for
best_worst (pins SQL-expressibility ahead of any gate promotion),
tie/margin/identical-text exclusion semantics, null-row dropping,
cap determinism, and a physical-plan check that the hot path stays
UDF-free codegen.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.plan_utils import formatted_plan
from utc_cuip_kafka_aws_connector_spark.operators.prefpairs import (
    preference_pairs,
    prompt_response_stats,
)


def _fixture(spark, seed=11, n_prompts=12, max_resp=6):
    """Scored responses with planted ties, singleton prompts, and
    duplicate texts so every exclusion rule fires."""
    rng = np.random.default_rng(seed)
    rows = []
    rid = 0
    for p in range(n_prompts):
        n = int(rng.integers(1, max_resp + 1))
        for _ in range(n):
            # coarse grid -> frequent exact ties
            score = float(rng.integers(0, 5)) / 2.0
            text = f"t{int(rng.integers(0, 3))}"
            rows.append((f"p{p:02d}", rid, score, text))
            rid += 1
    df = spark.createDataFrame(
        rows, "prompt_id string, response_id long, score double, text string"
    )
    return df, rows


def _py_pairs(rows, strategy, min_margin=0.0, text=False, cap=None):
    by_p = {}
    for p, rid, s, t in rows:
        by_p.setdefault(p, []).append((rid, s, t))
    out = []
    for p, cands in by_p.items():
        if strategy == "all_pairs":
            chosen = cands
            rest = cands
        else:
            chosen = [min(cands, key=lambda c: (-c[1], c[0]))]
            if strategy == "best_worst":
                rest = [min(cands, key=lambda c: (c[1], -c[0]))]
            else:
                rest = cands
        for c in chosen:
            for r in rest:
                m = c[1] - r[1]
                if c[0] == r[0] or m <= 0 or m < min_margin:
                    continue
                if text and c[2] == r[2]:
                    continue
                out.append((p, c[0], r[0], m))
    if cap is not None:
        by_prompt = {}
        for row in out:
            by_prompt.setdefault(row[0], []).append(row)
        out = []
        for p, pr in by_prompt.items():
            pr.sort(key=lambda r: (-r[3], r[2], r[1]))
            out.extend(pr[:cap])
    return sorted(out)


def _got(df_pairs):
    return sorted(
        (r.prompt, r.chosen_id, r.rejected_id, r.margin)
        for r in df_pairs.collect()
    )


@pytest.mark.parametrize("strategy", ["best_worst", "best_rest", "all_pairs"])
def test_strategy_matches_python_reference(spark, strategy):
    df, rows = _fixture(spark)
    got = _got(preference_pairs(df, strategy=strategy))
    assert got == _py_pairs(rows, strategy)


@pytest.mark.parametrize("strategy", ["best_rest", "all_pairs"])
def test_min_margin_and_cap(spark, strategy):
    df, rows = _fixture(spark, seed=5)
    got = _got(
        preference_pairs(
            df, strategy=strategy, min_margin=1.0, max_pairs_per_prompt=2
        )
    )
    assert got == _py_pairs(rows, strategy, min_margin=1.0, cap=2)
    assert all(m >= 1.0 for *_, m in got)


def test_identical_text_pairs_dropped(spark):
    df, rows = _fixture(spark, seed=3)
    got = _got(
        preference_pairs(df, text_col="text", strategy="all_pairs")
    )
    assert got == _py_pairs(rows, "all_pairs", text=True)
    # the text fixture only has 3 distinct strings, so the rule fired
    assert len(got) < len(_py_pairs(rows, "all_pairs", text=False))


def test_ties_never_pair(spark):
    df = spark.createDataFrame(
        [("p", 1, 2.0), ("p", 2, 2.0), ("p", 3, 2.0)],
        "prompt_id string, response_id long, score double",
    )
    for strategy in ("best_worst", "best_rest", "all_pairs"):
        assert preference_pairs(df, strategy=strategy).count() == 0


def test_singleton_prompt_and_null_rows_dropped(spark):
    df = spark.createDataFrame(
        [
            ("p", 1, 3.0),
            ("p", 2, None),  # unscored: can't pair
            (None, 3, 1.0),  # unkeyed: dropped
            ("q", 4, 9.0),  # singleton: no partner
        ],
        "prompt_id string, response_id long, score double",
    )
    assert preference_pairs(df, strategy="all_pairs").count() == 0


def test_text_columns_carried(spark):
    df = spark.createDataFrame(
        [("p", 1, 2.0, "good"), ("p", 2, 1.0, "bad")],
        "prompt_id string, response_id long, score double, text string",
    )
    [r] = preference_pairs(df, text_col="text").collect()
    assert (r.chosen_text, r.rejected_text, r.margin) == ("good", "bad", 1.0)


def test_best_worst_matches_duckdb_window_oracle(spark):
    """The gate-promotion dry run: the Spark plan vs a DuckDB
    window+self-join phrasing over the identical rows."""
    df, rows = _fixture(spark, seed=23, n_prompts=20)
    pdf = pd.DataFrame(
        rows, columns=["prompt_id", "response_id", "score", "text"]
    )
    con = duckdb.connect()
    try:
        con.register("responses", pdf)
        oracle = con.execute(
            """
            WITH best AS (
              SELECT prompt_id, response_id, score FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY prompt_id
                  ORDER BY score DESC, response_id ASC) AS rk
                FROM responses) WHERE rk = 1),
            worst AS (
              SELECT prompt_id, response_id, score FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY prompt_id
                  ORDER BY score ASC, response_id DESC) AS rk
                FROM responses) WHERE rk = 1)
            SELECT b.prompt_id AS prompt, b.response_id AS chosen_id,
                   w.response_id AS rejected_id, b.score - w.score AS margin
            FROM best b JOIN worst w USING (prompt_id)
            WHERE b.response_id <> w.response_id AND b.score - w.score > 0
            """
        ).fetchall()
    finally:
        con.close()
    assert _got(preference_pairs(df)) == sorted(oracle)


def test_plan_is_udf_free_codegen(spark):
    df, _ = _fixture(spark)
    plan = formatted_plan(preference_pairs(df, strategy="all_pairs"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_prompt_response_stats(spark):
    df = spark.createDataFrame(
        [
            ("p", 1, 2.0),
            ("p", 2, 2.0),
            ("p", 3, None),
            ("q", 4, 5.0),
            ("q", 5, 1.0),
        ],
        "prompt_id string, response_id long, score double",
    )
    got = {r.prompt: r for r in prompt_response_stats(df).collect()}
    p, q = got["p"], got["q"]
    assert (p.n_responses, p.n_scored, p.top_is_tied) == (3, 2, True)
    assert (q.n_responses, q.score_spread, q.top_is_tied) == (2, 4.0, False)


def test_validation_errors(spark):
    df, _ = _fixture(spark)
    with pytest.raises(ValueError, match="strategy"):
        preference_pairs(df, strategy="nope")
    with pytest.raises(ValueError, match="min_margin"):
        preference_pairs(df, min_margin=-1)
    with pytest.raises(ValueError, match="max_pairs_per_prompt"):
        preference_pairs(df, max_pairs_per_prompt=0)


def test_nan_scores_excluded(spark):
    """A NaN score sorts above every number in Spark and would become
    'chosen' in every pair (review r16) — dropped like nulls."""
    df = spark.createDataFrame(
        [("p", 1, 1.0), ("p", 2, 2.0), ("p", 3, float("nan"))],
        "prompt_id string, response_id long, score double",
    )
    [r] = preference_pairs(df, strategy="best_worst").collect()
    assert (r.chosen_id, r.rejected_id, r.margin) == (2, 1, 1.0)


def test_prompt_response_stats_nan_hygiene(spark):
    """ADVICE r16: a NaN score must count in n_responses ONLY, like
    null (Spark orders NaN equal-and-greatest, so un-nulled NaN
    became score_max, poisoned score_spread, and made top_is_tied
    reflect the NaN rows -- against the module's eligibility rules,
    which preference_pairs already enforces)."""
    df = spark.createDataFrame(
        [
            ("p", 1, 2.0),
            ("p", 2, float("nan")),
            ("p", 3, 5.0),
            ("n", 4, float("nan")),
            ("n", 5, float("nan")),
        ],
        "prompt_id string, response_id long, score double",
    )
    got = {r.prompt: r for r in prompt_response_stats(df).collect()}
    p = got["p"]
    assert (p.n_responses, p.n_scored) == (3, 2)
    assert (p.score_min, p.score_max, p.score_spread) == (2.0, 5.0, 3.0)
    assert p.top_is_tied is False
    n = got["n"]  # all-NaN prompt == all-null prompt: unscored
    assert (n.n_responses, n.n_scored) == (2, 0)
    assert n.score_min is None and n.score_max is None
    assert n.top_is_tied is False


def test_best_of_n_matches_duckdb_window_oracle(spark):
    """best_of_n's exact DuckDB differential (window + filter —
    SQL-expressible, the gate-staging dry run): same eligibility as
    the pairing functions, threshold-before-rank, deterministic
    (score desc, id asc) ranks."""
    import random

    rng = random.Random(11)
    rows = []
    for p in range(20):
        for r in range(rng.randint(1, 6)):
            rows.append((f"p{p}", p * 100 + r, round(rng.uniform(0, 10), 3)))
    rows += [
        (None, 9999, 5.0),            # null prompt: dropped
        ("p0", None, 5.0),            # null id: dropped
        ("p1", 9998, None),           # null score: dropped
        ("p2", 9997, float("nan")),   # NaN score: dropped
    ]
    df = spark.createDataFrame(
        rows, "prompt_id string, response_id long, score double"
    )
    from utc_cuip_kafka_aws_connector_spark.operators.prefpairs import (
        best_of_n,
    )

    got = (
        best_of_n(df, n=2, min_score=2.0)
        .orderBy("prompt", "rank")
        .collect()
    )
    con = duckdb.connect()
    con.register("resp", df.toPandas())
    want = con.execute(
        """
        SELECT prompt_id AS prompt, response_id, score, rank FROM (
          SELECT prompt_id, response_id, score,
                 row_number() OVER (PARTITION BY prompt_id
                                    ORDER BY score DESC, response_id) AS rank
          FROM resp
          WHERE prompt_id IS NOT NULL AND response_id IS NOT NULL
            AND score IS NOT NULL AND NOT isnan(score)
            AND score >= 2.0)
        WHERE rank <= 2
        ORDER BY prompt, rank
        """
    ).fetchall()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert (g["prompt"], g["response_id"], g["rank"]) == (w[0], w[1], w[3])
        assert g["score"] == pytest.approx(w[2], abs=0)


def test_best_of_n_rejects_whole_prompt_below_threshold(spark):
    """A prompt with no response above min_score emits NOTHING — the
    rejection in rejection sampling — and ties rank by id asc."""
    from utc_cuip_kafka_aws_connector_spark.operators.prefpairs import (
        best_of_n,
    )

    df = spark.createDataFrame(
        [("p", 1, 0.5), ("p", 2, 0.4), ("q", 3, 3.0), ("q", 4, 3.0)],
        "prompt_id string, response_id long, score double",
    )
    got = best_of_n(df, n=1, min_score=1.0).collect()
    assert len(got) == 1
    assert (got[0]["prompt"], got[0]["response_id"]) == ("q", 3)
    with pytest.raises(ValueError, match="n must be"):
        best_of_n(df, n=0)
    # text column rides through when given
    dft = df.withColumn("text", F.concat(F.lit("t"), F.col("response_id")))
    row = best_of_n(
        dft, n=1, text_col="text"
    ).filter(F.col("prompt") == "q").head()
    assert row["text"] == "t3"


def test_best_of_n_plan_is_codegen_single_exchange(spark):
    """The hot path stays UDF-free and shuffles on the prompt key
    exactly once (window only — no join, no second exchange)."""
    from utc_cuip_kafka_aws_connector_spark.operators.prefpairs import (
        best_of_n,
    )

    df = spark.createDataFrame(
        [("p", 1, 1.0)], "prompt_id string, response_id long, score double"
    )
    plan = formatted_plan(best_of_n(df, n=3, min_score=0.5))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    import re

    nodes = re.findall(r"\(\d+\) Exchange", plan)
    assert len(nodes) == 1, plan
