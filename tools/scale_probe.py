"""Scaling-exponent probe: time selected catalog queries at every
available scale factor and fit t ~ sf^alpha.

The bench guards absolute regressions; this tool guards the SHAPE —
an operator whose candidate generation quietly went quadratic shows
alpha ~ 2 long before a single-sf number looks alarming. Fixture sfs
span 100x (0.001 -> 0.1), enough to separate linear (alpha ~ 1) from
quadratic (alpha ~ 2) cleanly; constant engine overhead pulls small
queries BELOW 1, so the useful signal is "alpha well under 2", not
"alpha == 1".

    python tools/scale_probe.py [query ...]   # default: the scale-claim set

Prints one line per query: per-sf seconds and the fitted alpha
(least-squares slope of log t vs log sf), then a JSON summary line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # runnable as `python tools/scale_probe.py`
    sys.path.insert(0, REPO)

# Queries whose 100 TB story makes an explicit subquadratic claim
# (candidate generation / scan-locality), worth shape-guarding.
DEFAULT_QUERIES = [
    "q40_exact_dedup",
    "q46_minhash_lsh_pairs",
    "q103_near_dup_full_table",
    "q106_document_chunking",
    "q113_prefix_jaccard_join",
    "q98_token_shards",
    "q114_bm25_retrieval",
    "q115_zorder_layout",
    # round 8: the skipping-driven read (scan-locality claim) and
    # distributed BPE training (one histogram shuffle claim)
    "q117_clustered_skipping_read",
    "q118_bpe_train",
    # round 9: heavy hitters (k-bounded summary shuffle claim) and
    # the guard-wired semantic dedup (bounded sum_c |c|^2 claim)
    "q119_heavy_hitters",
    "q110_semantic_dedup",
]

SF_DIRS = [
    ("/root/testdata/sf0.001", 0.001),
    ("/root/testdata/sf0.01", 0.01),
    ("/root/testdata/sf0.1", 0.1),
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG
    from utc_cuip_kafka_aws_connector_spark.session import get_spark

    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 1
    spark = get_spark(app_name="scale_probe")

    def clear() -> None:
        spark.catalog.clearCache()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist()

    # warm the engine over every (query, sf) once, untimed
    for name in names:
        for sf_dir, _ in SF_DIRS:
            if os.path.isdir(sf_dir):
                CATALOG[name].builder(spark, sf_dir).collect()
                clear()

    out = {}
    for name in names:
        pts = []
        for sf_dir, sf in SF_DIRS:
            if not os.path.isdir(sf_dir):
                continue
            clear()
            t0 = time.perf_counter()
            CATALOG[name].builder(spark, sf_dir).collect()
            pts.append((sf, time.perf_counter() - t0))
            clear()
        if len(pts) < 2:
            # a slope needs two scale factors; emit alpha=null instead
            # of a ZeroDivisionError (round-7 ADVICE)
            out[name] = {
                "sec": {str(sf): round(t, 3) for sf, t in pts},
                "alpha": None,
            }
            print(
                f"{name:<32s} need at least two scale-factor fixture dirs "
                f"to fit a slope ({len(pts)} present)",
                file=sys.stderr,
            )
            continue
        xs = [math.log(sf) for sf, _ in pts]
        ys = [math.log(t) for _, t in pts]
        n = len(pts)
        mx, my = sum(xs) / n, sum(ys) / n
        alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        out[name] = {
            "sec": {str(sf): round(t, 3) for sf, t in pts},
            "alpha": round(alpha, 2),
        }
        times = "  ".join(f"sf{sf}={t:.2f}s" for sf, t in pts)
        print(f"{name:<32s} {times}  alpha={alpha:+.2f}", file=sys.stderr)

    print(json.dumps({"metric": "scaling_exponents", "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
