"""BM25 lexical retrieval over a document corpus.

Relevance-based data selection — score every document against a small
set of probe queries and keep the top-k per query — is a standard
LLM-curation step (quality-by-relevance filtering, eval-set
neighborhood mining) and the classic text-retrieval workload the
reference's pandas scan (df_manager.py:54-66) could only express as a
full-corpus Python loop. Here it is three hash aggregations and one
Zipf-skewed equi-join, all JVM-side.

Scoring: the Okapi BM25 family
    score(q, d) = sum over t in q of idf(t) * tf_part(t, d)
    tf_part = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
with the LOG-FREE idf variant idf = (N - df + 0.5) / (df + 0.5).
Default k1 = 1.5 (standard range 1.2-2.0) is chosen so k1, k1 + 1,
b, and 1 - b are ALL exactly representable binary fractions — no
literal-parsing ulp games between engines.
Production BM25 wraps that ratio in ln(); libm's ln is not correctly
rounded across platforms, which matters here only because the gate
verifies value-exact cross-engine equality (same reasoning as
operators/text.py::tf_idf_top_terms). The ratio is a monotone
transform of the standard idf, so rankings agree qualitatively; the
plan shape — the part that matters at 100 TB — is identical.

Float-determinism contract (see plans/catalog.py header): every
per-term contribution is a fixed tree of IEEE +,*,/ on integers and
two corpus scalars (N, avgdl = one integer-sum division) — all
correctly-rounded ops, so contributions are bit-identical
cross-engine. The per-document score folds contributions in SORTED
term order (F.aggregate over sort_array here; list_aggregate over
``list(... ORDER BY term)`` in the oracle), pinning float summation
order exactly as operators/sampling.py::temperature_weights does.

Scale shape (r20: TWO corpus passes, was four):
- postings (doc, term, tf): explode + map-side-combining groupBy,
  consumed exactly once (by the probe-term slice) — no recompute,
  no persist.
- dl: explode + map-side-combining per-doc count, persisted
  (MEMORY_AND_DISK — bytes per doc) because both the corpus scalars
  and the contribution join read it; N and avgdl are two scalars
  from dl (crossJoin of a 1-row frame == broadcast).
- query-term join: the probe query set is tiny -> BROADCAST to the
  postings stream FIRST; df is then a term-partitioned window count
  over the matched slice only — the full-vocabulary dfreq aggregate
  and its Zipf-skewed join never run (df of a term is the same
  integer whether counted over the slice or the full index).
- top-k per query: row_number window partitioned by query_id over
  at most |queries| * N scored rows, then filter — the standard
  distributed top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents per probe query by log-free-idf BM25.

    ``queries`` is (query_id string, query string); output
    (query_id, doc_id, score double, rnk int) with rnk 1..k ordered
    by score desc, doc_id asc (total order -> deterministic top-k).
    Query terms absent from the corpus contribute 0 (inner join
    drops them); documents matching no query term are not scored.
    """
    from pyspark import StorageLevel

    words = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda w: w != F.lit("")
    )
    toks = docs.select(F.col(id_col), F.explode(words).alias("term"))
    # Two corpus passes total (was four): one builds the postings
    # index -- whose ONLY consumer below is the probe-term slice, so
    # it is never recomputed and needs no persist -- and one builds
    # the per-doc length table. dl IS persisted: it is two-consumer
    # (corpus scalars + the contribution join), a few bytes per
    # document, and without the persist each consumer would re-run
    # the corpus explode (r20; guide §5 reuse rule -- cache the tiny
    # reused frame, recompute nothing corpus-sized twice). An earlier
    # r20 variant persisted the postings index itself; measured
    # SLOWER at bench scale (materialization stall beats the saved
    # passes) and unnecessary once df comes from the window below.
    postings = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    corpus = dl.select(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )

    qterms = (
        queries.select(
            "query_id",
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower(F.col("query")), " "),
                        lambda w: w != F.lit(""),
                    )
                )
            ).alias("term"),
        )
    )

    # Contribution tree mirrored token-for-token by the SQL oracle:
    # idf      = (n_docs - df + 0.5) / (df + 0.5)
    # tf_part  = (tf * (k1+1)) / (tf + k1 * ((1-b) + b * dl / avgdl))
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    # df (docs containing the term) is needed ONLY for probe terms:
    # restrict the postings stream to them first (broadcast semi-shape)
    # and compute df as a count over a term-partitioned window -- one
    # Exchange over the matched slice replaces the full-corpus dfreq
    # aggregation plus its join (guide §2.3: never aggregate rows the
    # query provably discards). Same integers: the window counts every
    # (doc, term) posting of the term corpus-wide.
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    ).withColumn(
        "df", F.count("*").over(W.partitionBy("term"))
    )
    contrib = (
        matched.join(F.broadcast(qterms), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .select(
            "query_id",
            id_col,
            "term",
            (idf * tf_part).alias("_c"),
        )
    )

    scored = contrib.groupBy("query_id", id_col).agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "_c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_c"],
        ).alias("score")
    )
    win = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "score", "rnk")
    )
