"""Count-Min sketch store: mergeable per-key frequency estimates.

The sketch-store family so far answers distincts (operators/
cardinality.py, HLL) and hot keys (heavyhitters/hotkeys,
Misra-Gries). The remaining standard question is a point FREQUENCY
estimate for ANY key — "roughly how often has this token/user/URL
appeared", across slices and versions, without storing the key
space. Count-Min (Cormode & Muthukrishnan 2005) is the textbook
answer and is linear, so it composes exactly like the HLL store:

- ``cms_sketch`` — one pass: every partition folds its rows into a
  (depth x width) counter matrix (vectorized np.add.at per hash
  row), partial matrices SUM under the final aggregate. Per group,
  the stored row is width*depth longs (~32 KiB at the defaults).
- ``cms_merge`` — matrices add: any union of stored sketch rows is
  the sketch of the concatenated data, exactly (integer sums), so
  daily append + any-slice rollup work like cardinality's.
- ``cms_query`` — driver-side point estimates: min over depth rows.
  Guarantee (the published one): est >= true, and
  est <= true + eps * N with probability >= 1 - delta, for
  eps = e / width, delta = exp(-depth). One-sided — the same
  "never lies low" shape as every conservative bound in this repo.

Hashing is pandas' 64-bit siphash of the value string, then one
splitmix64 finalizer per depth row over (hash XOR row-salt) —
deterministic across runs, partitions, and engines (the determinism
contract), no Python row loop. The non-linear finalizer is what
makes the depth rows INDEPENDENT: a plain ``(h * odd_salt) % width``
is an invertible linear map of the shared hash, so two keys that
collide in one row collide in every row (for any width coprime to
the salts — including every power of two, where only ``h mod width``
matters) and min-over-depth degenerates to depth=1 (ADVICE r9). With
the finalizer, a row-0 collision says nothing about row 1, which is
exactly the pairwise-independence shape the published
``P[est > true + eps*N] <= e^-depth`` bound needs
(Cormode & Muthukrishnan 2005), and
tests/test_cms.py::test_depth_rows_are_decorrelated pins it.

Stored rows are SELF-DESCRIBING: (depth, width) ride beside the
counter array, ``cms_merge`` refuses to add matrices of different
geometry, and ``cms_query`` takes NO default geometry — the caller
must pass the stored row's depth/width (equal-area geometries like
2x2048 vs 4x1024 are indistinguishable from array length, so a
default would reshape silently into garbage estimates; ADVICE r9).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALTS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0x2545F4914F6CDD1D,
     0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53],
    dtype=np.uint64,
)

# Hash-scheme version stored beside every sketch row. A Count-Min
# matrix is only meaningful under the EXACT probe scheme that built
# it: querying counters written by a different scheme returns
# arbitrary cells and silently breaks the est >= true guarantee.
# v2 = siphash + per-row splitmix64 finalizer (the r10 decorrelation);
# the retired pre-r10 linear-probe scheme is v1 and its rows carry no
# version column at all — they fail loudly on the missing column /
# required argument instead of being mis-queried (ADVICE r10).
_HASH_V = 2


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """The splitmix64 finalizer (Steele/Lea/Flood 2014, public): a
    bijective avalanche mixer — every output bit depends non-linearly
    on every input bit, so reducing mod a power-of-two width keeps
    rows decorrelated. uint64 wraparound is the algorithm."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _rows_cols(values: pd.Series, depth: int, width: int):
    h = pd.util.hash_array(values.astype(str).to_numpy(dtype=object)).astype(
        np.uint64
    )
    with np.errstate(over="ignore"):
        return [
            _splitmix64(h ^ _SALTS[d]) % np.uint64(width) for d in range(depth)
        ]


def cms_sketch(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    max_groups_per_partition: int = 2048,
) -> DataFrame:
    """(keys..., depth, width, n_rows, cms) — one Count-Min matrix
    per key group, built map-side (one matrix per partition per
    group) and SUMMED in the aggregate via a commutative binary fold
    expressed as elementwise array addition over the flattened
    counters.

    Memory contract: the per-partition accumulator holds one
    depth x width x 8-byte matrix PER GROUP SEEN IN THAT PARTITION —
    the intended group keys are low-cardinality slices (day, source,
    shard), ~32 KiB each at the defaults. A high-cardinality key
    would OOM the executor silently, so the accumulator refuses
    loudly past ``max_groups_per_partition`` (2048 ≈ 64 MiB at the
    defaults; ADVICE r9): repartition by the group key first — each
    partition then holds few groups — or raise the knob
    deliberately."""
    if depth < 1 or depth > len(_SALTS):
        raise ValueError(f"depth must be 1..{len(_SALTS)}, got {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, np.ndarray] = {}
        counts: dict[tuple, int] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            for gkey, sub in (
                pdf.groupby(list(keys)) if keys else [((), pdf)]
            ):
                gkey = gkey if isinstance(gkey, tuple) else (gkey,)
                vals = sub[value_col].dropna()
                if not len(vals):
                    continue
                if gkey not in acc and len(acc) >= max_groups_per_partition:
                    raise ValueError(
                        f"cms_sketch saw more than {max_groups_per_partition} "
                        f"distinct {keys} groups in one partition "
                        f"(~{depth * width * 8 // 1024} KiB of counters "
                        "each). Repartition by the group key first, or "
                        "raise max_groups_per_partition deliberately."
                    )
                m = acc.setdefault(
                    gkey, np.zeros((depth, width), dtype=np.int64)
                )
                counts[gkey] = counts.get(gkey, 0) + len(vals)
                for d, cols in enumerate(_rows_cols(vals, depth, width)):
                    np.add.at(m[d], cols.astype(np.int64), 1)
        for gkey, m in acc.items():
            yield pd.DataFrame(
                {
                    **{k: [v] for k, v in zip(keys, gkey)},
                    "n_rows": [counts[gkey]],
                    "cms": [m.flatten().tolist()],
                }
            )

    key_schema = ", ".join(
        f"`{k}` {df.schema[k].dataType.simpleString()}" for k in keys
    )
    schema = (key_schema + ", " if keys else "") + "n_rows long, cms array<long>"
    parts = df.select(*keys, value_col).mapInPandas(partials, schema=schema)
    merged = parts.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.aggregate(
            F.collect_list("cms"),
            F.array_repeat(F.lit(0).cast("long"), depth * width),
            lambda acc, m: F.zip_with(acc, m, lambda a, b: a + b),
        ).alias("cms"),
    )
    return merged.select(
        *keys,
        F.lit(depth).cast("int").alias("depth"),
        F.lit(width).cast("int").alias("width"),
        F.lit(_HASH_V).cast("int").alias("hash_v"),
        "n_rows",
        "cms",
    )


def cms_merge(sketches: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Roll stored sketch rows up to ``keys`` (None/[] = one global
    row): matrices and row counts add exactly. Geometry AND hash
    scheme are validated IN the plan: a group mixing (depth, width)
    pairs, or carrying rows from a different probe scheme, fails the
    job loudly (adding a 4x1024 matrix to a 2x2048 one — or to a
    matrix hashed under a retired scheme — would be silent garbage).
    The guard rides EVERY output column a consumer could use (both
    ``n_rows`` and ``cms``), so Catalyst column pruning cannot
    optimize the check away no matter which columns the caller
    selects (ADVICE r10); the common geometry rides along in the
    output."""
    grouped = sketches.groupBy(*keys) if keys else sketches.groupBy()
    first_len = F.size(F.first("cms"))
    agg = grouped.agg(
        F.count_distinct(F.struct("depth", "width", "hash_v")).alias("_n_geoms"),
        F.first("depth").alias("depth"),
        F.first("width").alias("width"),
        F.first("hash_v").alias("hash_v"),
        F.sum("n_rows").alias("n_rows"),
        F.aggregate(
            F.collect_list("cms"),
            F.array_repeat(F.lit(0).cast("long"), first_len),
            lambda acc, m: F.zip_with(acc, m, lambda a, b: a + b),
        ).alias("cms"),
    )

    # when/otherwise with identical branches gets simplified away, so
    # the failing branch must be raise_error itself: pass -> the real
    # column, fail -> job dies.
    def _guarded(col: str):
        return (
            F.when(
                F.col("_n_geoms") != 1,
                F.raise_error(
                    F.lit(
                        "cms_merge: sketches in one group have different "
                        "(depth, width, hash_v) — they cannot be added"
                    )
                ),
            )
            .when(
                F.col("hash_v") != _HASH_V,
                F.raise_error(
                    F.lit(
                        "cms_merge: sketches were built under hash scheme "
                        f"v!={_HASH_V} (a retired probe scheme); their "
                        "counters are not addressable by this build — "
                        "rebuild the sketches with cms_sketch"
                    )
                ),
            )
            .otherwise(F.col(col))
            .alias(col)
        )

    out_keys = list(keys) if keys else []
    return agg.select(
        *out_keys,
        "depth",
        "width",
        "hash_v",
        _guarded("n_rows"),
        _guarded("cms"),
    )


def cms_query(
    cms: list[int],
    values: list,
    depth: int | None = None,
    width: int | None = None,
    hash_v: int | None = None,
) -> dict:
    """Driver-side point estimates from one stored sketch row:
    value -> min over depth rows. est >= true always; the overshoot
    bound is eps*N with eps = e/width at confidence 1 - e^-depth.
    (depth, width, hash_v) must be the stored row's own columns —
    there are NO defaults: geometries of equal area (2x2048 vs
    4x1024) are indistinguishable from the array length alone, and a
    row hashed under a retired probe scheme would be probed at
    arbitrary cells, silently breaking est >= true (ADVICE r9/r10).
    A mismatch of either raises."""
    if depth is None or width is None:
        raise ValueError(
            "cms_query geometry required: pass the depth/width stored "
            "beside the cms column (row.depth, row.width). Defaults are "
            "refused — equal-area geometries like 2x2048 and 4x1024 "
            "cannot be told apart from the array length."
        )
    if hash_v is None:
        raise ValueError(
            "cms_query hash scheme required: pass the hash_v stored "
            "beside the cms column (row.hash_v). Rows without one were "
            "built by a retired probe scheme and must be rebuilt with "
            "cms_sketch."
        )
    if hash_v != _HASH_V:
        raise ValueError(
            f"cms_query: sketch was built under hash scheme v{hash_v}, "
            f"this build probes v{_HASH_V} — the counters are not "
            "addressable; rebuild the sketch with cms_sketch"
        )
    if depth * width != len(cms):
        raise ValueError(
            f"cms_query geometry mismatch: depth*width = {depth}*{width} = "
            f"{depth * width}, but the sketch array has {len(cms)} counters. "
            "Pass the depth/width stored beside the cms column."
        )
    m = np.asarray(cms, dtype=np.int64).reshape(depth, width)
    s = pd.Series(values)
    out = {}
    rows = _rows_cols(s, depth, width)
    for i, v in enumerate(values):
        out[v] = int(min(m[d][int(rows[d][i])] for d in range(depth)))
    return out
