"""Retrieval quality evaluation: recall@k, precision@k, MRR, nDCG.

The repo now has three retrieval surfaces (BM25 in
operators/retrieval.py, the ANN stack in operators/annindex.py, the
compressed tiers in quantize/pq) whose tests each hand-roll a recall
computation. This module is the shared, batch-scale evaluator: given
a RANKED result table and a relevance-judgment table, produce the
standard metrics (as defined in any IR text — Manning et al. 2008
ch.8) per query and averaged, entirely as joins + aggregations:

- results: (query, id, rank) — rank 1-based, one row per returned id;
- truth:   (query, id[, grade]) — the judged-relevant set, optional
  graded relevance for nDCG (binary grade 1 assumed when absent).

Shapes: one equi-join of results to truth on (query, id) — both
sides are evaluation-sized (n_queries x k and n_queries x judged),
never corpus-sized — then per-query aggregates and one tiny global
mean. Metrics per query:

  recall@k    |top-k hits| / min(|relevant|, k')  with k' = k (the
              textbook form: denominator |relevant| capped at k only
              when cap_recall=True, the "R-capped" variant used when
              |relevant| > k makes 1.0 unreachable)
  precision@k |top-k hits| / k
  mrr         1 / rank of the first relevant result (0 if none)
  ndcg@k      DCG@k / IDCG@k, gain = grade, discount = log2(rank+1)

Floats here are diagnostics, not gate artifacts — no decimal-exact
contract needed (and none claimed)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def retrieval_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    grade_col: str | None = None,
    cap_recall: bool = False,
) -> DataFrame:
    """Per-query (query, n_relevant, hits, recall, precision, mrr,
    ndcg) at cutoff ``k``. Queries present in ``truth`` but absent
    from ``results`` score zero (they were asked and not answered);
    result-only queries are dropped (nothing to judge against)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    grade = (
        F.col(grade_col).cast("double")
        if grade_col
        else F.lit(1.0)
    )
    t = truth.select(
        F.col(query_col).alias("q"),
        F.col(id_col).alias("d"),
        grade.alias("g"),
    )
    ideal = t.withColumn(
        "irank", F.row_number().over(W.partitionBy("q").orderBy(F.desc("g"), F.asc("d")))
    ).filter(F.col("irank") <= k)
    per_q_truth = t.groupBy("q").agg(F.count(F.lit(1)).alias("n_relevant"))
    idcg = ideal.groupBy("q").agg(
        F.sum(F.col("g") / F.log2(F.col("irank") + 1)).alias("idcg")
    )

    r = results.select(
        F.col(query_col).alias("q"),
        F.col(id_col).alias("d"),
        F.col(rank_col).cast("long").alias("rank"),
    ).filter(F.col("rank") <= k)
    hits = r.join(t, ["q", "d"])
    per_q_hits = hits.groupBy("q").agg(
        F.count(F.lit(1)).alias("hits"),
        F.min("rank").alias("first_hit"),
        F.sum(F.col("g") / F.log2(F.col("rank") + 1)).alias("dcg"),
    )
    denom = (
        F.least(F.col("n_relevant"), F.lit(k))
        if cap_recall
        else F.col("n_relevant")
    )
    return (
        per_q_truth.join(per_q_hits, "q", "left")
        .join(idcg, "q", "left")
        .select(
            F.col("q").alias(query_col),
            "n_relevant",
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            (F.coalesce(F.col("hits"), F.lit(0)) / denom).alias("recall"),
            (F.coalesce(F.col("hits"), F.lit(0)) / F.lit(k)).alias("precision"),
            F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0)).alias("mrr"),
            F.coalesce(
                F.col("dcg") / F.col("idcg"), F.lit(0.0)
            ).alias("ndcg"),
        )
    )


def mean_metrics(per_query: DataFrame, query_col: str = "query_id") -> DataFrame:
    """One row: the macro-average of every metric column (each query
    weighted equally, the standard reporting convention)."""
    cols = [c for c in per_query.columns if c not in (query_col, "n_relevant", "hits")]
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        *[F.avg(c).alias(c) for c in cols],
    )
