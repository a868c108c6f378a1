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

Round 9 adds the collect-when-small fast path: when the histogram's
row count fits a driver budget (default 2M rows), the k iterations
run on the driver via a heap+index Sennrich trainer instead of ~2
Spark jobs per merge — bit-identical output (differential-tested),
and the practical difference between "8 merges in a test" and "a 32k
merge production vocabulary" (64k sequential jobs vs seconds). See
``bpe_train``'s docstring for the crossover argument.
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


def _driver_train(
    wf: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """The collect-when-small trainer: classic Sennrich over a
    driver-resident (word, freq) vocab, with the two standard
    accelerations that make large merge counts practical — a
    pair -> affected-words index (only words containing the winning
    pair are re-segmented and only their pair counts change) and a
    lazily-invalidated max-heap over pair counts (argmax without
    rescanning the stats dict per merge). Bit-identical to the
    distributed path and to tests/test_bpetrain.py's naive reference
    trainer: integer counts, ties broken (count DESC, lhs, rhs) —
    the heap key (-cnt, lhs, rhs) realizes exactly that order."""
    import heapq
    from collections import defaultdict

    segs = [list(w) for w, _ in wf]
    freqs = [f for _, f in wf]
    stats: dict[tuple[str, str], int] = defaultdict(int)
    index: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, (s, f) in enumerate(zip(segs, freqs)):
        for pair in zip(s, s[1:]):
            stats[pair] += f
            index[pair].add(i)
    heap = [(-c, a, b) for (a, b), c in stats.items()]
    heapq.heapify(heap)
    out: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        # pop stale entries (count changed since push); every count
        # change pushes a fresh entry, so the true maximum is always
        # present and the first VALID pop is the deterministic argmax
        while heap:
            nc, a, b = heap[0]
            if -nc > 0 and stats.get((a, b), 0) == -nc:
                break
            heapq.heappop(heap)
        if not heap:
            break
        cnt = -heap[0][0]
        a, b = heap[0][1], heap[0][2]
        out.append((rank, a, b, a + b, cnt))

        def _bump(pair: tuple[str, str], delta: int, i: int) -> None:
            stats[pair] += delta
            if stats[pair] > 0:
                heapq.heappush(heap, (-stats[pair], pair[0], pair[1]))
            if delta > 0:
                index[pair].add(i)

        for i in sorted(index.pop((a, b), ())):
            s, f = segs[i], freqs[i]
            if not any(
                s[j] == a and s[j + 1] == b for j in range(len(s) - 1)
            ):
                continue  # stale index entry: pair already merged away
            for pair in zip(s, s[1:]):
                _bump(pair, -f, i)
            merged, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    merged.append(a + b)
                    j += 2
                else:
                    merged.append(s[j])
                    j += 1
            segs[i] = merged
            for pair in zip(merged, merged[1:]):
                _bump(pair, f, i)
        stats.pop((a, b), None)
    return out


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
    driver_vocab_rows: int | None = 2_000_000,
    histogram: DataFrame | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    merge table as (merge_rank, lhs, rhs, merged, pair_count) rows,
    merge_rank 1-based in learn order. Stops early (fewer rows) if
    the corpus runs out of adjacent pairs. Every count is an integer
    and every tie deterministic, so the table is bit-identical across
    engines, runs, and the two execution paths below.

    Collect-when-small (the crossover that makes production vocab
    sizes plausible): training always starts with the ONE
    corpus-scale shuffle — the word histogram, which collapses even a
    100 TB text stream to its Zipf vocabulary. After that, Sennrich
    iterations are vocab-sized work, and the right engine depends
    only on the vocab row count: the distributed path costs ~2 Spark
    jobs per merge (pair-count aggregate + 1-row argmax collect), so
    a 32k-merge vocabulary would mean ~64k sequential jobs — hours of
    scheduler floor even though each job is cheap — while the
    heap+index driver trainer (``_driver_train``) handles millions of
    merges over a collected vocab in seconds. Default crossover
    2M rows (~tens of MB of (word, freq) on the driver — the same
    order as a broadcast dimension); above it, the iterations stay
    distributed on the persisted vocab so a pathological vocabulary
    that cannot fit the driver still trains. ``None`` forces the
    distributed path (used by the differential tests that pin the
    two paths bit-identical).

    ``histogram`` substitutes a caller-built (word, freq) frame for
    the whitespace histogram — how ``bytelevel.byte_level_train``
    reuses this merge loop over byte-symbol pieces; the symbols are
    opaque here, so the loop and its determinism guarantees carry
    over unchanged."""
    spark = df.sparkSession
    hist = (
        histogram if histogram is not None else word_histogram(df, text_col)
    ).persist()
    try:
        n_vocab = hist.count()  # materialize the one corpus-scale shuffle
        if driver_vocab_rows is not None and n_vocab <= driver_vocab_rows:
            learned = _driver_train(
                [(r.word, int(r.freq)) for r in hist.collect()], n_merges
            )
            return spark.createDataFrame(learned, TRAIN_SCHEMA)
        seg = hist.withColumn("s", _framed(F.col("word"))).select("freq", "s")
        learned = []
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
        hist.unpersist()


def bpe_train_merges(
    df: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> list[tuple[str, str]]:
    """The learned table as the ``[(lhs, rhs), ...]`` list (rank
    order) that ``tokenizer.bpe_token_count`` consumes — train here,
    encode there."""
    rows = bpe_train(df, n_merges, text_col).orderBy("merge_rank").collect()
    return [(r.lhs, r.rhs) for r in rows]
