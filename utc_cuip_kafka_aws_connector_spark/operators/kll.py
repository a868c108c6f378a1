"""Mergeable quantile sketch (KLL) — the missing member of the
sketch family (cardinality.py: HLL distinct counts; cms.py: Count-Min
frequencies; heavyhitters.py: top items; bloom.py: membership). A
corpus data card wants "p50/p95/p99 document length per source,
always current" the same way it wants distinct counts: maintained
incrementally from shard deltas, never by rescanning 100 TB, and
merged across shards without loss of guarantee.

Algorithm: Karnin-Lang-Liberty 2016 ("Optimal quantile approximation
in streams") in its standard practical form (the Apache DataSketches
layout): a stack of levels, level ``h`` holding items of weight
``2^h``; when a level overflows its capacity ``ceil(k * (2/3)^d)``
(``d`` = distance from the top level, floor 8) it sorts, keeps every
other element from a chosen offset, and promotes the survivors —
halving the count, doubling the weight. Normalized rank error is
O(1/k) with high probability (k=256 ≈ well under 1% — the tests
measure it against exact numpy ranks). Merging concatenates levels
and re-compacts: the bound survives merge, in any order, which is
what makes the sketch a shard-delta artifact.

Determinism: the compaction offset bit comes from a splitmix64
counter (seeded per sketch), not an RNG — the same value sequence
always yields the same sketch. Spark caveat, stated honestly: the
VALUE SEQUENCE depends on partitioning, so unlike sampling.py's
content-hash draws the ESTIMATE may move within the error bound when
the data is repartitioned; the bound itself is deterministic. Exact
surfaces (n_rows, min/max) are partitioning-invariant.

Scale shape (the cms.py doctrine): one ``mapInPandas`` pass builds a
sketch per (partition, group) — memory per group is
O(k log(n/k)) doubles, KBs at k=256 — then one hash shuffle on the
group keys and a per-group ``applyInPandas`` merge of the ~#partition
partial sketches. Queries read sketch rows only; the data is never
touched again.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MIN_CAP = 8
_FMT_V = 1  # serialization version stamp, checked on merge/query


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


class _KLL:
    """Driver/executor-local sketch core (pure numpy, no Spark)."""

    __slots__ = ("k", "n", "levels", "_coin")

    def __init__(self, k: int):
        self.k = k
        self.n = 0
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._coin = 0  # compaction counter -> deterministic offset bits

    def _cap(self, h: int) -> int:
        d = len(self.levels) - 1 - h
        return max(int(math.ceil(self.k * (2.0 / 3.0) ** d)), _MIN_CAP)

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def merge(self, other: "_KLL") -> None:
        if other.k != self.k:
            raise ValueError(f"cannot merge k={other.k} into k={self.k}")
        self.n += other.n
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lvl in enumerate(other.levels):
            if len(lvl):
                self.levels[h] = np.concatenate([self.levels[h], lvl])
        self._compress()

    def _compress(self) -> None:
        # restart after every compaction: promoting into a NEW top
        # level shrinks every lower level's capacity (d grows), so a
        # single bottom-up pass can leave levels over budget
        while True:
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._cap(h):
                    break
            else:
                return
            buf = np.sort(self.levels[h])
            offset = _splitmix64(self._coin) & 1
            self._coin += 1
            survivors = buf[offset::2]
            self.levels[h] = np.empty(0, dtype=np.float64)
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[h + 1] = np.concatenate(
                [self.levels[h + 1], survivors]
            )

    def items_weights(self) -> tuple[np.ndarray, np.ndarray]:
        vals = [lvl for lvl in self.levels if len(lvl)]
        wts = [
            np.full(len(lvl), 1 << h, dtype=np.float64)
            for h, lvl in enumerate(self.levels)
            if len(lvl)
        ]
        if not vals:
            return np.empty(0), np.empty(0)
        return np.concatenate(vals), np.concatenate(wts)

    def quantile(self, q: float) -> float:
        vals, wts = self.items_weights()
        if not len(vals):
            return float("nan")
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        target = max(q * cum[-1], 1.0)
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(vals[min(idx, len(vals) - 1)])

    def to_row(self) -> tuple[int, list[list[float]]]:
        return self.n, [lvl.tolist() for lvl in self.levels]

    @classmethod
    def from_row(cls, k: int, n: int, levels: list) -> "_KLL":
        s = cls(k)
        s.n = int(n)
        s.levels = [np.asarray(lvl, dtype=np.float64) for lvl in levels]
        if not s.levels:
            s.levels = [np.empty(0, dtype=np.float64)]
        return s


def _key_schema(df: DataFrame, keys: list[str]) -> str:
    return ", ".join(
        f"`{k}` {df.schema[k].dataType.simpleString()}" for k in keys
    )


_SKETCH_COLS = (
    "fmt_v int, k int, n_rows long, vmin double, vmax double, "
    "levels array<array<double>>"
)


def kll_sketch(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    k: int = 256,
    max_groups_per_partition: int = 4096,
) -> DataFrame:
    """(keys..., fmt_v, k, n_rows, vmin, vmax, levels) — one merged
    KLL sketch per key group. NaN/NULL values are skipped (they have
    no rank); a group with no finite values yields no row. ``vmin``/
    ``vmax`` are exact (quantile 0/1 should never be approximate).

    Memory contract (the cms.py doctrine): the map-side accumulator
    holds one sketch PER GROUP SEEN IN THE PARTITION — intended for
    low-cardinality slices (source, lang, shard). It refuses loudly
    past ``max_groups_per_partition``; repartition by the group key
    first or raise the knob deliberately."""
    if k < 16:
        raise ValueError(f"k must be >= 16, got {k}")

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, _KLL] = {}
        mins: dict[tuple, float] = {}
        maxs: dict[tuple, float] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            # default dropna: NULL group keys are dropped, matching
            # cms_sketch (and avoiding pandas' NaN-for-null coercion
            # breaking the Arrow cast for non-string key types)
            for gkey, sub in (
                pdf.groupby(list(keys)) if keys else [((), pdf)]
            ):
                gkey = gkey if isinstance(gkey, tuple) else (gkey,)
                vals = sub[value_col].astype("float64").dropna().to_numpy()
                if not len(vals):
                    continue
                if gkey not in acc and len(acc) >= max_groups_per_partition:
                    raise ValueError(
                        "kll_sketch saw more than "
                        f"{max_groups_per_partition} distinct {keys} groups "
                        "in one partition. Repartition by the group key "
                        "first, or raise max_groups_per_partition."
                    )
                s = acc.setdefault(gkey, _KLL(k))
                s.update(vals)
                lo, hi = float(np.min(vals)), float(np.max(vals))
                mins[gkey] = min(mins.get(gkey, lo), lo)
                maxs[gkey] = max(maxs.get(gkey, hi), hi)
        for gkey, s in acc.items():
            n, levels = s.to_row()
            yield pd.DataFrame(
                {
                    **{c: [v] for c, v in zip(keys, gkey)},
                    "fmt_v": [_FMT_V],
                    "k": [k],
                    "n_rows": [n],
                    "vmin": [mins[gkey]],
                    "vmax": [maxs[gkey]],
                    "levels": [levels],
                }
            )

    schema = (
        (_key_schema(df, keys) + ", " if keys else "") + _SKETCH_COLS
    )
    parts = df.select(*keys, value_col).mapInPandas(partials, schema=schema)
    return kll_merge(parts, keys=keys)


def kll_merge(sketches: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Merge sketch rows down to one per key group — the shard-delta
    path: append fresh shard sketches to a stored table, merge, store
    back; estimates keep the O(1/k) bound regardless of merge order.
    Mixed ``k`` or format versions in one group are a spec error and
    raise."""
    keys = keys or []

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["fmt_v"].nunique() != 1 or pdf["k"].nunique() != 1:
            raise ValueError(
                "kll_merge: mixed sketch formats in one group: "
                f"fmt_v={sorted(pdf['fmt_v'].unique())}, "
                f"k={sorted(pdf['k'].unique())}"
            )
        k = int(pdf["k"].iloc[0])
        acc = _KLL(k)
        for _, row in pdf.iterrows():
            acc.merge(_KLL.from_row(k, row["n_rows"], row["levels"]))
        n, levels = acc.to_row()
        out = {c: [pdf[c].iloc[0]] for c in keys}
        out.update(
            {
                "fmt_v": [_FMT_V],
                "k": [k],
                "n_rows": [n],
                "vmin": [float(pdf["vmin"].min())],
                "vmax": [float(pdf["vmax"].max())],
                "levels": [levels],
            }
        )
        return pd.DataFrame(out)

    schema = (
        (_key_schema(sketches, keys) + ", " if keys else "") + _SKETCH_COLS
    )
    if keys:
        return sketches.groupBy(*keys).applyInPandas(merge_group, schema)
    # grouping expressions are not part of the pdf applyInPandas hands
    # to the function, so a literal group key needs no drop
    return sketches.groupBy(F.lit(1).alias("__g")).applyInPandas(
        merge_group, schema
    )


def kll_quantiles(
    sketches: DataFrame,
    qs: list[float],
    keys: list[str] | None = None,
) -> DataFrame:
    """(keys..., q, value): quantile estimates per key group — one
    row per (group, q). Accepts unmerged sketch rows (merges first).
    q=0 and q=1 return the EXACT min/max carried on the sketch; the
    interior is rank-approximate within the k bound."""
    if not qs or any(q < 0 or q > 1 for q in qs):
        raise ValueError(f"qs must be non-empty, each in [0,1]: {qs}")
    keys = keys or []
    merged = kll_merge(sketches, keys=keys)
    qs = [float(q) for q in qs]

    def estimate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                s = _KLL.from_row(int(row["k"]), row["n_rows"], row["levels"])
                vals = [
                    row["vmin"]
                    if q == 0.0
                    else row["vmax"]
                    if q == 1.0
                    else s.quantile(q)
                    for q in qs
                ]
                yield pd.DataFrame(
                    {
                        **{c: [row[c]] * len(qs) for c in keys},
                        "q": qs,
                        "value": vals,
                    }
                )

    schema = (
        (_key_schema(sketches, keys) + ", " if keys else "")
        + "q double, value double"
    )
    return merged.mapInPandas(estimate, schema=schema)
