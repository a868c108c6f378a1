"""Distributed BPE merge-table TRAINING (Sennrich et al. 2016,
arXiv:1508.07909 — the public byte-pair-encoding algorithm).

``operators.tokenizer`` APPLIES a learned merge table; this module
LEARNS one from the corpus, completing the tokenizer story: train
here, encode with ``bpe_token_count``. (The reference repo has no
tokenizer at all — its closest analogue is the whitespace field split
in run.py's payload handling; token-aware curation is part of this
engine's §2.D training-data surface.)

Algorithm (classic Sennrich, restated as the operator contract):
words start as character sequences; k times, count every ADJACENT
symbol pair across the corpus weighted by word frequency (all
positions count — "aaa" contributes (a,a) twice), merge the
most-frequent pair everywhere (ties broken by lexicographically
smallest (lhs, rhs) — Sennrich's pseudocode leaves ties unspecified;
pinning them is what makes training deterministic and cross-engine
checkable), and record it. The learned list is well-formed by
construction: each side of merge k is a character or the product of
an earlier merge, exactly what ``tokenizer.bpe_token_count`` requires.

Scale design: ONE corpus-scale shuffle total — the word histogram —
collapses the 100 TB text stream to its Zipf vocabulary before any
iteration starts (Sennrich trains on the word->freq dict, not the
stream). The k merge iterations then run on that (word, freq) table
entirely JVM-side: segmentation state is the same US-framed string
the q112 oracle pins (``\\x1f sym \\x1f\\x1f sym ... \\x1f``), pair
extraction is split + transform/explode (no Python), the per-
iteration argmax is an orderBy/limit(1) over the pair-count
aggregate — a ONE-ROW collect, driver-small by construction — and
resegmentation is a literal string REPLACE of the framed pair, which
on framed strings is exactly the left-to-right non-overlapping merge
(the q112 contract, shared verbatim by the DuckDB oracle replay and
the pure-Python reference trainer in tests/test_bpetrain.py). The
vocab table is persisted once and the framed base re-derived per
iteration from k accumulated replaces — O(k^2) cheap string rewrites
over vocab rows, no lineage blowup, no checkpointing needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # ASCII unit separator: cannot occur in tokenized words

TRAIN_SCHEMA = (
    "merge_rank long, lhs string, rhs string, merged string, pair_count long"
)


def _framed(word_col):
    """``\\x1f c1 \\x1f\\x1f c2 \\x1f\\x1f ... \\x1f`` — one frame char on
    each side of every symbol, so a literal REPLACE of
    ``frame(a)+frame(b)`` can never match across symbol boundaries or
    on a shared prefix (the q112 framing)."""
    return F.concat(
        F.lit(SEP),
        F.regexp_replace(word_col, "(?<=.)(?=.)", SEP + SEP),
        F.lit(SEP),
    )


def word_histogram(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the whitespace-tokenized corpus — the single
    corpus-scale shuffle of training (map-side combined groupBy on a
    Zipf-bounded key space)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pair_counts(seg: DataFrame) -> DataFrame:
    """(a, b, cnt): every adjacent symbol pair in the current framed
    segmentation, weighted by word frequency. All positions count
    (overlap included), matching the classic get_stats."""
    pairs = F.expr(
        "CASE WHEN size(syms) < 2 THEN array() "
        "ELSE transform(sequence(1, size(syms) - 1), "
        "  i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b)) "
        "END"
    )
    return (
        seg.withColumn(
            "syms", F.split(F.expr("substring(s, 2, length(s) - 2)"), SEP + SEP)
        )
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    merge table as (merge_rank, lhs, rhs, merged, pair_count) rows,
    merge_rank 1-based in learn order. Stops early (fewer rows) if
    the corpus runs out of adjacent pairs. Every count is an integer
    and every tie deterministic, so the table is bit-identical across
    engines and runs."""
    spark = df.sparkSession
    base = (
        word_histogram(df, text_col)
        .withColumn("s", _framed(F.col("word")))
        .select("freq", "s")
        .persist()
    )
    try:
        base.count()  # materialize the one corpus-scale shuffle
        seg = base
        learned: list[tuple[int, str, str, str, int]] = []
        for rank in range(1, n_merges + 1):
            pick = (
                _pair_counts(seg)
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not pick:
                break
            a, b, cnt = pick[0].a, pick[0].b, int(pick[0].cnt)
            learned.append((rank, a, b, a + b, cnt))
            seg = seg.withColumn(
                "s",
                F.replace(
                    "s",
                    F.lit(SEP + a + SEP + SEP + b + SEP),
                    F.lit(SEP + a + b + SEP),
                ),
            )
        return spark.createDataFrame(learned, TRAIN_SCHEMA)
    finally:
        base.unpersist()


def bpe_train_merges(
    df: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> list[tuple[str, str]]:
    """The learned table as the ``[(lhs, rhs), ...]`` list (rank
    order) that ``tokenizer.bpe_token_count`` consumes — train here,
    encode there."""
    rows = bpe_train(df, n_merges, text_col).orderBy("merge_rank").collect()
    return [(r.lhs, r.rhs) for r in rows]
