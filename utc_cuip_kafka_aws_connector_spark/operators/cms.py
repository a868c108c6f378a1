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

Hashing is pandas' 64-bit siphash of the value string, salted per
depth row by a fixed odd multiplier — deterministic across runs,
partitions, and engines (the determinism contract), no Python
row loop.
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


def _rows_cols(values: pd.Series, depth: int, width: int):
    h = pd.util.hash_array(values.astype(str).to_numpy(dtype=object)).astype(
        np.uint64
    )
    with np.errstate(over="ignore"):
        return [(h * _SALTS[d]) % np.uint64(width) for d in range(depth)]


def cms_sketch(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(keys..., n_rows, cms binary) — one Count-Min matrix per key
    group, built map-side (one matrix per partition per group) and
    SUMMED in the aggregate via a commutative binary fold expressed
    as elementwise array addition over the flattened counters."""
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
    return merged


def cms_merge(sketches: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Roll stored sketch rows up to ``keys`` (None/[] = one global
    row): matrices and row counts add exactly."""
    grouped = sketches.groupBy(*keys) if keys else sketches.groupBy()
    first_len = F.size(F.first("cms"))
    return grouped.agg(
        F.sum("n_rows").alias("n_rows"),
        F.aggregate(
            F.collect_list("cms"),
            F.array_repeat(F.lit(0).cast("long"), first_len),
            lambda acc, m: F.zip_with(acc, m, lambda a, b: a + b),
        ).alias("cms"),
    )


def cms_query(
    cms: list[int], values: list, depth: int = 4, width: int = 1024
) -> dict:
    """Driver-side point estimates from one stored sketch row:
    value -> min over depth rows. est >= true always; the overshoot
    bound is eps*N with eps = e/width at confidence 1 - e^-depth."""
    m = np.asarray(cms, dtype=np.int64).reshape(depth, width)
    s = pd.Series(values)
    out = {}
    rows = _rows_cols(s, depth, width)
    for i, v in enumerate(values):
        out[v] = int(min(m[d][int(rows[d][i])] for d in range(depth)))
    return out
