"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard (SURVEY §2.B "LLM-data-pipeline operators").

Scale design:
- Shingling + MinHash signatures + SimHash are computed in ONE
  Arrow-batched ``mapInPandas`` pass. Built-in higher-order functions
  can express the same math, but they evaluate interpreted
  (~micro-seconds per element) -- at 100 TB that is 30 ms/doc of
  expression-tree walking vs ~0.2 ms/doc in numpy. The UDF emits
  compact long arrays; everything relational downstream (band-bucket
  joins, Jaccard verification, group-bys) stays JVM-side.
- The kernel is batch-vectorized, not per-token Python: tokens are
  factorized to vocabulary codes in C (``pd.factorize``), the digest
  runs once per DISTINCT word per batch (Zipf: |vocab| << |tokens|),
  and MinHash minima reduce over the whole batch's flattened shingle
  array with ``np.minimum.reduceat`` -- one vectorized sweep per hash
  function, O(8 MB) peak scratch regardless of batch size.
- The only shuffles are the band-bucket equi-join and the group-bys --
  hash-partitioned, AQE-skew-splittable. No cross joins anywhere:
  candidate volume, not corpus size^2, drives cost.

MinHash family: ``h_i(s) = mix64((s XOR b_i) * a_i)`` with odd
``a_i`` and ``mix64`` the SplitMix64 finalizer. Every step is a
bijection on Z_2^64 (xor; odd multiply mod 2^64; mix64), so each
``h_i`` is a deterministic permutation of the 64-bit shingle space --
the standard practical MinHash construction. (An earlier affine-mod-
Mersenne variant silently wrapped mod 2^64 before the mod, voiding
its universality claim; the permutation family has no such trap.)
Banding parameters are arguments, tuned so P(candidate) ~ 1-(1-s^r)^b.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_C = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _word_hash(word: str) -> int:
    return int.from_bytes(hashlib.blake2b(word.encode(), digest_size=8).digest(), "big")


def _mix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer: a bijection on uint64, vectorized.

    Multiplication wraps mod 2**64 BY DESIGN (ring arithmetic);
    errstate only silences numpy's overflow RuntimeWarning, the
    values are bit-identical with or without it."""
    with np.errstate(over="ignore"):
        x = x ^ (x >> np.uint64(30))
        x = x * np.uint64(0xBF58476D1CE4E5B9)
        x = x ^ (x >> np.uint64(27))
        x = x * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _combine_shingles(wh: np.ndarray, n: int) -> np.ndarray:
    """Reference semantics for the batch-vectorized shingle pass in
    ``sketch_documents``: distinct polynomial combines of n
    consecutive word hashes (whole doc if < n words). Kept as the
    readable single-doc spec; tests assert the batched pass agrees."""
    with np.errstate(over="ignore"):  # mod-2**64 polynomial, wraps by design
        if len(wh) < n:
            acc = np.uint64(0)
            for h in wh:
                acc = acc * _C + h
            return np.array([acc], dtype=np.uint64)
        g = np.zeros(len(wh) - n + 1, dtype=np.uint64)
        for j in range(n):
            g = g * _C + wh[j : len(wh) - n + 1 + j]
        return np.unique(g)


def _minhash_params(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(12345)
    a = rng.randint(0, 1 << 62, size=num_hashes).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 1 << 62, size=num_hashes).astype(np.uint64)
    return a, b


def sketch_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    simhash_bits: int = 64,
) -> DataFrame:
    """One vectorized pass per Arrow batch producing, per document:
    ``sh``   distinct shingle hashes (array<long>, for exact Jaccard),
    ``sig``  MinHash signature        (array<long>),
    ``simhash64``  SimHash fingerprint (long).

    Input fans out to the default parallelism ONLY when the scan is
    actually narrower (one local parquet file = one partition would
    serialize the CPU-bound sketch kernel). When the source already
    carries >= defaultParallelism splits — every real corpus at scale
    — the round-robin repartition is a pure corpus-sized shuffle of
    raw text and is skipped (guide §2.4 remove shuffles outright; the
    q94/decontam precedent). Per-row outputs are partitioning-
    independent: the kernel is deterministic per document and every
    downstream consumer is an orderless join/aggregate.
    """
    a, b = _minhash_params(num_hashes)

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            toks = pdf[text_col].astype(str).str.lower().str.split()
            # empty docs get a sentinel token so offsets stay aligned
            toks = toks.map(lambda t: t if t else ["\x00"])
            # Vectorized word hashing: factorize tokens to vocabulary
            # codes (C-side); blake2b runs once per DISTINCT word per
            # batch, then a single fancy-index rebuilds the token
            # hash stream. This is the fix for the per-token Python
            # digest loop that dominated the sketch at scale.
            flat = toks.explode()
            codes, uniques = pd.factorize(flat)
            uh = np.fromiter(
                (_word_hash(w) for w in uniques), dtype=np.uint64, count=len(uniques)
            )
            wh_flat = uh[codes]
            lens = toks.map(len).to_numpy(dtype=np.int64)
            ndocs = len(lens)
            total = len(wh_flat)
            offs_w = np.zeros(ndocs + 1, dtype=np.int64)
            np.cumsum(lens, out=offs_w[1:])
            doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), lens)

            # --- shingles: whole batch at once, zero per-doc loops ---
            # Polynomial-combine every length-n window of the FLAT
            # token-hash stream, then mask out windows that straddle a
            # document boundary. Short docs (< n tokens) fall back to
            # a whole-doc combine, matching _combine_shingles.
            n = shingle_n
            with np.errstate(over="ignore"):  # mod-2**64, wraps by design
                if total >= n:
                    g = np.zeros(total - n + 1, dtype=np.uint64)
                    for j in range(n):
                        g = g * _C + wh_flat[j : total - n + 1 + j]
                    inside = doc_of[: total - n + 1] == doc_of[n - 1 :]
                    win_doc = doc_of[: total - n + 1][inside]
                    win_g = g[inside]
                else:
                    win_doc = np.empty(0, dtype=np.int64)
                    win_g = np.empty(0, dtype=np.uint64)
                short = np.flatnonzero(lens < n)
                if len(short):
                    acc = np.zeros(len(short), dtype=np.uint64)
                    for j in range(int(lens[short].max())):
                        live = lens[short] > j
                        acc[live] = acc[live] * _C + wh_flat[offs_w[short[live]] + j]
                    win_doc = np.concatenate([win_doc, short])
                    win_g = np.concatenate([win_g, acc])
            # per-doc sorted-unique without a loop: lexsort by (doc,
            # shingle), keep first occurrence of each pair.
            order = np.lexsort((win_g, win_doc))
            d_s, g_s = win_doc[order], win_g[order]
            keep = np.ones(len(d_s), dtype=bool)
            keep[1:] = (d_s[1:] != d_s[:-1]) | (g_s[1:] != g_s[:-1])
            d_u, g_u = d_s[keep], g_s[keep]
            counts = np.bincount(d_u, minlength=ndocs)  # every doc has >=1 shingle
            bounds = np.cumsum(counts)
            sh_out = np.split(g_u.view(np.int64), bounds[:-1])

            # --- simhash: 64 vectorized bit passes (O(total) memory,
            # no tokens-x-bits matrix): votes_b = 2*ones_b - len ---
            sim = np.zeros(ndocs, dtype=np.uint64)
            for bit in range(simhash_bits):
                ones = np.add.reduceat(
                    ((wh_flat >> np.uint64(bit)) & np.uint64(1)).astype(np.int64),
                    offs_w[:-1],
                )
                sim |= (2 * ones > lens).astype(np.uint64) << np.uint64(bit)
            sim_out = sim.view(np.int64)

            # MinHash over the whole batch at once: apply permutation
            # h_i to the flat unique-shingle array (already per-doc
            # contiguous from the lexsort), segment-minimum back per
            # doc. One vectorized sweep per hash function.
            if num_hashes:
                offs_s = np.zeros(ndocs, dtype=np.int64)
                offs_s[1:] = bounds[:-1]
                sig_mat = np.empty((num_hashes, ndocs), dtype=np.uint64)
                with np.errstate(over="ignore"):  # mod-2**64, wraps by design
                    for h in range(num_hashes):
                        sig_mat[h] = np.minimum.reduceat(
                            _mix64((g_u ^ b[h]) * a[h]), offs_s
                        )
                sig_rows = list(np.ascontiguousarray(sig_mat.T).view(np.int64))
            else:  # caller only needs sh/simhash -- skip signatures
                sig_rows = [np.empty(0, dtype=np.int64)] * ndocs

            yield pd.DataFrame(
                {
                    "doc": pdf[id_col],
                    "sh": sh_out,
                    "sig": sig_rows,
                    "simhash64": sim_out,
                }
            )

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    narrow = df.select(F.col(id_col), F.col(text_col))
    # Streaming inputs (the incremental-dedup monitor feeds micro-
    # batches through here) cannot be partition-probed (.rdd raises on
    # an unstarted streaming plan) and their micro-batches are small
    # by construction — keep the unconditional fan-out there.
    if narrow.isStreaming or narrow.rdd.getNumPartitions() < n_parts:
        narrow = narrow.repartition(n_parts)
    return narrow.mapInPandas(
        sketch, schema="doc long, sh array<long>, sig array<long>, simhash64 long"
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact dedup on content hash: keeps the lowest id per md5(text).

    groupBy(hash) -> min(id) is the partial-aggregating formulation:
    at 100 TB the map-side combine collapses duplicates before the
    shuffle, unlike a window row_number which must sort every group.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding + exact-Jaccard
    verification of candidates (sketches from ``sketch_documents``;
    band hashing, self equi-join, and verification are JVM-side)."""
    assert num_hashes % bands == 0
    r = num_hashes // bands

    # The sketch frame feeds three plan branches (band rows + both
    # verification joins); cache it so the expensive pass over the raw
    # text runs once. It is ~1 KB/doc -- negligible vs the corpus.
    docs = sketch_documents(df, id_col, text_col, shingle_n, num_hashes).cache()

    band_rows = docs.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda k: F.hash(F.slice("sig", k * r + 1, r)),
            )
        ).alias("band", "band_hash"),
    )

    a = band_rows.select(F.col("doc").alias("doc_a"), "band", "band_hash")
    b = band_rows.select(F.col("doc").alias("doc_b"), "band", "band_hash")
    cand = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    sh_a = docs.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    jacc = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b"))
    )
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str = "text", bits: int = 64) -> DataFrame:
    """SimHash fingerprint: per token, a 64-bit hash contributes +-1 to
    each bit position; the sign vector packs into a single long.
    Hamming distance between fingerprints approximates token-multiset
    cosine -- and is therefore invariant under token reordering, the
    metamorphic property q47's oracle checks. Computed in the shared
    vectorized sketch pass with MinHash signatures disabled."""
    return sketch_documents(df, id_col, text_col, num_hashes=0, simhash_bits=bits).select(
        F.col("doc").alias(id_col), "simhash64"
    )


def _free_checkpoint_blocks(sc, blocks: list) -> None:
    """Unpersist checkpoint blocks without the JVM's 'locally
    checkpointed ... cannot be recomputed after unpersisting' WARN:
    the blocks being freed are exactly the rounds the loop has
    already superseded, so the caution is benign here but reads like
    a fault in a driver log. The block's concrete RDD-class logger
    (the WARN's source) is dropped to ERROR for the duration of the
    synchronous unpersist call and restored to its prior effective
    level. The quieting is COSMETIC, so any failure reaching into
    the log4j2 API (relocated/shaded classes, a different logging
    backend on the driver classpath — ADVICE r15) must never fail
    the free: fall back to plain unpersist and accept the WARN.
    Module-level (not a closure) so the fallback is unit-testable
    with a fake SparkContext."""
    if not blocks:
        return
    quieted: dict = {}
    try:
        jvm = sc._jvm
        log_mgr = jvm.org.apache.logging.log4j.LogManager
        configurator = jvm.org.apache.logging.log4j.core.config.Configurator
        error_lvl = jvm.org.apache.logging.log4j.Level.ERROR
        names = {b.rdd().getClass().getName() for b in blocks}
        prev = {n: log_mgr.getLogger(n).getLevel() for n in names}
        for n in names:
            configurator.setLevel(n, error_lvl)
            quieted[n] = prev[n]
    except Exception:
        # restore any logger ALREADY dropped to ERROR before the
        # failure (a py4j hiccup mid-loop must not permanently mute
        # genuine WARNs from those RDD classes), then free with the
        # WARN
        for n, lvl in quieted.items():
            try:
                configurator.setLevel(n, lvl)
            except Exception:
                pass
        for b in blocks:
            b.unpersist()
        return
    try:
        for b in blocks:
            b.unpersist()
    finally:
        # guard EACH restore like the except branch does (ADVICE r17,
        # landed at the r19 unfreeze): one setLevel failing mid-loop
        # must neither skip the remaining restores nor propagate out
        # of a cosmetic helper
        for n, lvl in prev.items():
            try:
                configurator.setLevel(n, lvl)
            except Exception:
                pass


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 25,
    reliable_checkpoint: bool = False,
    checkpoint_dir: str | None = None,
    on_nonconvergence: str = "raise",
) -> DataFrame:
    """Connected components of an undirected pair graph: returns
    (node, component) where ``component`` is the minimum node id
    reachable from ``node``. This is the step that turns near-dup
    PAIRS into dedup CLUSTERS (transitive closure: A~B, B~C puts A
    and C in one group even if the A-C pair was never emitted).

    Algorithm: iterative min-label propagation with pointer jumping.
    Each round a node takes the min of its own label and its
    neighbors' labels (one hash-shuffle join + partial-agg min), then
    compresses paths by replacing its label with its label's label
    (a second equi-join -- the "pointer jump" that makes convergence
    O(log diameter) instead of O(diameter), the same contraction idea
    as the large-star/small-star MapReduce algorithm). Near-dup
    graphs have tiny components, so 3-4 rounds typically suffice;
    the loop stops at the first round with zero label changes.

    The r21 loop shape (guide §1.2): each round is one checkpoint
    materialization of the NEIGHBOR-MIN step plus a block-scan change
    count over it -- the zero-change test runs BEFORE the jump, since
    a step no-op means every edge's endpoints already share a label,
    so labels are constant per component (labels only ever originate
    inside their component) and the jump is provably a no-op too. The
    final round therefore skips its jump join outright; non-final
    jumps evaluate lazily off the round's checkpointed step frame.
    Round 1 needs no seed-labels frame (comp == node makes the
    neighbor min just min(b) per endpoint), so its init distinct +
    checkpoint and two label joins collapse into one aggregate.

    100 TB design: every step is an equi-join/groupBy on the label
    key -- hash-partitioned, AQE-skew-splittable, no driver-side
    state. A checkpoint truncates the plan each round so the
    lineage does not grow with iterations (an iterative-join plan
    left unchecked doubles in depth per round and eventually
    overwhelms the optimizer).

    Durability: the default ``localCheckpoint`` stores blocks on
    executors -- fast, but an executor loss mid-run is unrecoverable
    (the truncated lineage cannot recompute) and fails the job. For
    hours-long runs over billions of edges pass
    ``reliable_checkpoint=True`` (optionally with ``checkpoint_dir``
    to call ``setCheckpointDir`` first): rounds then persist to the
    fault-tolerant checkpoint directory (HDFS/S3) and survive
    executor loss, at the cost of a filesystem write per round.

    Non-convergence is NEVER silent: if ``max_iter`` rounds exhaust
    while labels are still changing (an adversarially long chain --
    pointer jumping converges in O(log diameter), so 25 rounds cover
    any graph with diameter < ~2^25, but a pathological input or a
    too-small ``max_iter`` can still run out), the default
    ``on_nonconvergence="raise"`` aborts with the round count; pass
    ``"warn"`` to get the partial labels with a loud log instead
    (downstream dedup would silently under-merge clusters otherwise).
    Note the budget accounting: convergence is DETECTED by observing
    a zero-change round, so a graph that needs exactly ``max_iter``
    productive rounds still raises -- the effective budget is
    ``max_iter - 1`` productive rounds plus the verification round.
    Provision one extra round rather than cutting it exact.
    """
    if on_nonconvergence not in ("raise", "warn"):
        raise ValueError(f"on_nonconvergence must be 'raise' or 'warn', got {on_nonconvergence!r}")
    sc = edges.sparkSession.sparkContext
    if reliable_checkpoint:
        if checkpoint_dir is not None:
            sc.setCheckpointDir(checkpoint_dir)
        elif sc._jsc.sc().checkpointDir().isEmpty():
            raise ValueError(
                "reliable_checkpoint=True needs a checkpoint dir: pass "
                "checkpoint_dir= or call sparkContext.setCheckpointDir first"
            )

    def _free_blocks(blocks: list) -> None:
        _free_checkpoint_blocks(sc, blocks)

    def _cut(df: DataFrame) -> tuple[DataFrame, list]:
        """Eagerly checkpoint ``df`` and return the cut DataFrame plus
        the storage blocks the cut created (java RDD handles), so the
        loop can free a round's blocks once the next round is
        materialized. DataFrame.unpersist() only talks to the cache
        manager and cannot release checkpoint blocks, so we diff the
        context's persistent-RDD registry around the eager call (the
        driver is single-threaded here, so the diff is exactly the
        checkpoint RDD)."""
        before = set(sc._jsc.getPersistentRDDs().keys())
        if reliable_checkpoint:
            cut = df.checkpoint(eager=True)
        else:
            cut = df.localCheckpoint(eager=True)
        after = sc._jsc.getPersistentRDDs()
        return cut, [after[k] for k in after.keys() if k not in before]

    # Materialize the edge list ONCE before symmetrizing: the union
    # below consumes it twice, and without the checkpoint the (often
    # expensive) upstream pair-generation plan would execute twice.
    e, e_blocks = _cut(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # The loop runs over edge ENDPOINTS only -- for near-dup graphs
    # that is a tiny fraction of the corpus. Singleton nodes (no
    # edges) never change label, so they join in once at the end
    # instead of riding through every iteration.
    #
    # r21 loop shape (guide §1.2 the-distributed-algorithm first):
    # (a) Each round checkpoints the NEIGHBOR-MIN step result and
    # detects convergence on it, before the pointer jump: a step
    # no-op means every edge's endpoints already share a label, which
    # makes labels constant per component (labels only ever originate
    # inside the component), so the jump is provably a no-op too --
    # the final round skips its jump join outright, and the
    # checkpointed step result IS the fixed point. The change count
    # is a limit(1).count() over the ALREADY-CHECKPOINTED step frame
    # -- a block scan, not a recompute. (An observe()-metric fusion
    # that eliminated even that job was built and REVERTED: a
    # CollectMetrics node left in a session intermittently poisoned
    # LATER unrelated jobs with `NotSerializableException:
    # ObservationManager` -- reproduced against Spark 4.1 on the
    # MLlib path; do not resurrect without a fix upstream.)
    # (b) The jump join is LAZY over the round's checkpointed step
    # frame (it is re-evaluated by the next round's two consumers, a
    # cheap self-join of two narrow checkpointed columns, instead of
    # being its own eager materialization). (c) Round 1 needs no
    # seed-labels frame at all: comp == node initially, so the
    # neighbor min is just min(b) per endpoint -- the init distinct +
    # checkpoint and the first round's two label joins collapse into
    # one aggregate.
    labels = None
    labels_blocks: list = []
    for _ in range(max_iter):
        if labels is None:
            stepped = sym.groupBy("a").agg(F.min("b").alias("min_nb")).select(
                F.col("a").alias("node"),
                F.col("a").alias("old_comp"),
                F.least("a", "min_nb").alias("comp"),
            )
        else:
            nb_min = (
                sym.join(
                    labels.select(F.col("node").alias("b"), F.col("comp").alias("nb_comp")), "b"
                )
                .groupBy("a")
                .agg(F.min("nb_comp").alias("min_nb"))
            )
            stepped = labels.join(
                nb_min.select(F.col("a").alias("node"), "min_nb"), "node", "left"
            ).select(
                "node",
                F.col("comp").alias("old_comp"),
                F.least("comp", F.coalesce("min_nb", "comp")).alias("comp"),
            )
        stepped_cut, stepped_blocks = _cut(stepped)
        changed = (
            stepped_cut.filter(F.col("comp") != F.col("old_comp"))
            .limit(1)
            .count()
        )
        # The previous round's checkpoint blocks are dead now that
        # this round is materialized -- free them so a many-round run
        # over a big graph holds TWO rounds of label storage at peak,
        # not max_iter rounds' worth.
        _free_blocks(labels_blocks)
        labels_blocks = stepped_blocks
        if changed == 0:
            labels = stepped_cut.drop("old_comp")
            break
        # pointer jump: comp <- label(comp); compresses chains so a
        # min label crosses 2^k hops after k rounds. Lazy on purpose:
        # both next-round consumers re-derive it from the checkpointed
        # step frame.
        labels = (
            stepped_cut.alias("s")
            .join(
                stepped_cut.select(
                    F.col("node").alias("comp"), F.col("comp").alias("comp2")
                ).alias("j"),
                "comp",
                "left",
            )
            .select("node", F.coalesce("comp2", "comp").alias("comp"))
        )
    else:
        msg = (
            f"connected_components did not converge in max_iter={max_iter} rounds; "
            "labels are PARTIAL (some components carry more than one label). "
            "Raise max_iter (each round doubles the compressed-path reach) or pass "
            "on_nonconvergence='warn' to accept partial labels."
        )
        if on_nonconvergence == "raise":
            _free_blocks(e_blocks + labels_blocks)
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
        if labels is None:  # max_iter == 0: the pre-loop identity labels
            # cut (not lazy): the edge blocks are freed below, so the
            # returned lineage must not reach through sym into them
            labels, labels_blocks = _cut(
                sym.select(F.col("a").alias("node"))
                .distinct()
                .withColumn("comp", F.col("node"))
            )
    # The final labels are checkpointed (independent of the edge
    # materialization), so the edge blocks can be freed too.
    _free_blocks(e_blocks)
    out = labels.select("node", F.col("comp").alias("component"))
    if nodes is not None:
        out = (
            nodes.select(F.col(node_col).alias("node"))
            .distinct()
            .join(out, "node", "left")
            .select("node", F.coalesce("component", F.col("node")).alias("component"))
        )
    return out


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "doc_a",
    dst: str = "doc_b",
    reliable_checkpoint: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Cluster-level dedup decision: every document mapped to its
    near-dup component (singletons included -- a doc with no near-dup
    is its own component) plus ``keep`` = is this the canonical
    (minimum-id) survivor. Filtering ``keep`` yields the deduplicated
    corpus; grouping by ``component`` yields cluster sizes.
    ``reliable_checkpoint``/``checkpoint_dir`` pass through to
    ``connected_components`` for executor-loss-tolerant long runs."""
    comp = connected_components(
        pairs,
        src=src,
        dst=dst,
        nodes=df.select(F.col(id_col).alias("node")),
        reliable_checkpoint=reliable_checkpoint,
        checkpoint_dir=checkpoint_dir,
    )
    return comp.select(
        F.col("node").alias(id_col),
        "component",
        (F.col("node") == F.col("component")).alias("keep"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted shingle
    index (explode -> self equi-join on shingle -> count co-occurrences
    -> |A∩B| / (|A|+|B|-|A∩B|)).

    The default (``max_df=None``) is PROVABLY COMPLETE: any pair with
    Jaccard above a positive threshold shares >= 1 shingle and so
    meets in the index -- this is the verification-grade ground truth
    mode, safe only on bounded corpora. At scale, pass an explicit
    ``max_df`` (e.g. 1000) to drop stop-shingles (document frequency
    > max_df) from the *index* only: without it the self equi-join is
    O(sum df(s)^2) and one ubiquitous boilerplate shingle produces a
    quadratic candidate set at 100 TB. Jaccard is still EXACT over
    full shingle sets regardless, so precision never degrades; recall
    loss is confined to pairs whose shared shingles are ALL
    ultra-common (df > max_df) -- for near-dup thresholds >= 0.5 such
    pairs share a third of their shingles, so any non-boilerplate
    overlap keeps them. Prefer minhash_lsh_pairs beyond small corpora.

    Scoring is COUNT-BASED (the r20-verified rewrite, guide §2.3
    shuffle-fewer-bytes): the co-count of the complete index IS
    |A∩B|, and |A∪B| = |A|+|B|-|A∩B|, so the pair scorer joins two
    narrow integer size columns instead of re-shipping both full
    shingle arrays through the candidate joins. Under ``max_df`` the
    rare co-count misses exactly the shared COMMON shingles, which
    are counted back exactly from per-doc common-only arrays --
    bounded by the (tiny, boilerplate-sized) common vocabulary, never
    the full shingle sets. Same integers, same single IEEE division:
    values are bit-identical to the array formulation.
    """
    from pyspark.sql.window import Window as W

    docs = (
        sketch_documents(df, id_col, text_col, shingle_n, num_hashes=0)
        .select("doc", "sh")
        .cache()
    )
    meta = docs.select("doc", F.size("sh").alias("n_sh"))
    inv = docs.select("doc", F.explode("sh").alias("s"))
    if max_df is None:
        co = (
            inv.alias("x")
            .join(inv.alias("y"), "s")
            .filter(F.col("x.doc") < F.col("y.doc"))
            .groupBy(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
            .agg(F.count("*").alias("n_common"))
        )
        extra = F.lit(0)
    else:
        # ONE shuffle of the index (a shingle-partitioned window count)
        # serves the rare filter, BOTH self-join sides, and the
        # common-shingle slice below. At scale the self-join reuses
        # that hash partitioning on s (no further index exchange;
        # identical shuffle subtrees dedupe at runtime); at local
        # fixture sizes AQE broadcasts the smaller side instead.
        inv_df = inv.withColumn(
            "df", F.count(F.lit(1)).over(W.partitionBy("s"))
        )
        inv_rare = inv_df.filter(F.col("df") <= max_df).select("doc", "s")
        co = (
            inv_rare.alias("x")
            .join(inv_rare.alias("y"), "s")
            .filter(F.col("x.doc") < F.col("y.doc"))
            .groupBy(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
            .agg(F.count("*").alias("n_common"))
        )
        # exact correction for shared stop-shingles: per-doc arrays of
        # COMMON (df > max_df) shingles only -- linear in the corpus to
        # build, and each array is bounded by the common vocabulary
        # (ubiquitous boilerplate is few DISTINCT shingles by
        # definition). Fused into the sizes frame so the candidate
        # stream still pays exactly two narrow joins.
        common_arr = (
            inv_df.filter(F.col("df") > max_df)
            .groupBy("doc")
            .agg(F.collect_list("s").alias("cm"))
        )
        empty = F.array().cast("array<long>")
        meta = meta.join(common_arr, "doc", "left").select(
            "doc", "n_sh", F.coalesce("cm", empty).alias("cm")
        )
        extra = F.size(F.array_intersect("cm_a", "cm_b"))
    # narrow per-doc metadata (sizes + optional common-shingle arrays)
    # joins back onto the candidate stream once per side
    m_a = meta.toDF(*[f"{c}_a" for c in meta.columns])
    m_b = meta.toDF(*[f"{c}_b" for c in meta.columns])
    scored = (
        co.join(m_a, "doc_a")
        .join(m_b, "doc_b")
        .withColumn("n_common", F.col("n_common") + extra)
    )
    jacc = F.col("n_common").cast("double") / (
        F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_common")
    )
    return (
        scored.withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
