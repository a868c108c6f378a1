"""PageRank over an edge table: link-based authority for curation
weighting.

Web pipelines weight domains by link authority (the original
PageRank use, Page et al. 1999; OpenWebText's karma threshold and
the quality priors of crawl frontiers are the same idea), and this
repo already runs one iterative pointer-chasing algorithm at scale —
``dedup.connected_components``. PageRank is its weighted sibling and
completes the iterative family:

    rank_{t+1}(v) = (1 - d) / N + d * ( dangling_t / N
                     + sum_{u -> v} rank_t(u) / outdeg(u) )

Spark shape per iteration: one equi-join of the rank frame to the
edge table on the source (contributions = rank/outdeg), one groupBy
on the destination, a driver-small dangling-mass aggregate (ONE
double), and a checkpoint to truncate lineage — the exact
connected_components discipline. ``checkpoint_dir=`` switches the
truncation from executor-local blocks to reliable storage for
hours-long runs (see ``pagerank``'s docstring); the same knob lands
on connected_components when dedup.py's gate cohort rotates back
into the window (the stamped r13 plan). Convergence is the
L1 delta against the previous iteration, a one-row aggregate;
iteration stops at ``tol`` or ``max_iter`` (raising if unconverged,
like connected_components, so a silent half-converged rank table
cannot leak into curation weights).

Floats here are iterative approximations — no hash-exact contract
claimed; the differential test pins agreement with a pure-Python
reference to 1e-9 per node, which holds because both sides run the
same number of synchronous iterations in double precision and the
per-node contribution sums are tiny (tie-free test graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 40,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, rank) over the distinct nodes of ``edges``; ranks sum
    to 1. Duplicate edges count once (the web-graph convention:
    a link exists or it does not).

    ``checkpoint_dir`` selects RELIABLE checkpointing: each
    iteration's state is written to that path (HDFS/object store on a
    cluster) instead of executor-local storage, so an executor loss
    partway through an hours-long run replays from the last persisted
    state rather than losing lineage AND data — localCheckpoint (the
    default, right for local mode and short jobs) stores blocks only
    on the executors that computed them. Same truncation discipline
    either way; the differential test pins both paths identical."""
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    nodes = _ckpt(
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    links = _ckpt(e.join(outdeg, "s"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(max_iter):
        contrib = (
            links.join(ranks, links["s"] == ranks["node"])
            .select(
                F.col("d").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass: rank held by nodes with no out-links,
        # redistributed uniformly (the standard correction) -- one
        # driver-small double
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["s"], "left_anti")
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        )
        new_ranks = _ckpt(
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
        delta = (
            new_ranks.join(
                ranks.select(F.col("node"), F.col("rank").alias("prev")), "node"
            )
            .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))))
            .first()[0]
        )
        ranks = new_ranks
        if delta < tol:
            return ranks
    raise RuntimeError(
        f"pagerank did not converge below {tol} in {max_iter} iterations "
        f"(last delta {delta:.3e}); raise max_iter or tol"
    )


def domain_authority(
    edges: DataFrame,
    src_url: str = "src_url",
    dst_url: str = "dst_url",
    **kw,
) -> DataFrame:
    """(domain, rank): PageRank over the REGISTERED-DOMAIN graph of a
    URL link table — the curation-grade signal (page-level graphs are
    noisy and enormous; domain-level is what quality priors use).
    Self-links (intra-domain) are dropped."""
    from utc_cuip_kafka_aws_connector_spark.operators.urlops import (
        registered_domain,
    )

    dom = edges.select(
        registered_domain(src_url).alias("s"),
        registered_domain(dst_url).alias("d"),
    ).filter(F.col("s") != F.col("d"))
    return pagerank(dom, "s", "d", **kw).withColumnRenamed("node", "domain")
