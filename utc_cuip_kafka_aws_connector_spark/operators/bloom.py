"""Bloom-filter membership: a bytes-sized set summary for
pre-filtering 100 TB scans before expensive joins.

The runtime-filter pattern (Spark's own InjectRuntimeFilter, Trino's
dynamic filters — public designs; Spark 4's `bloom_filter_agg` is
not SQL-registered in this build, so the operator is implemented
from the textbook construction): summarize the SMALL side's join
keys into m bits + k hashes, broadcast the bytes, and drop big-side
rows that cannot match BEFORE the shuffle/join. Guarantee is
one-sided — no false negatives ever; false positives at rate
~(1-e^{-kn/m})^k just waste a little post-filter work — so
``bloom_semi_filter``'s output joined exactly equals the unfiltered
join (test-pinned equivalence).

Uses beyond joins, all the same three calls: decontamination
(benchmark n-gram membership), incremental-dedup pre-screen (skip
docs sharing no band key with the index), CDC key overlap.

Mechanics: double hashing h1 + i*h2 (Kirsch-Mitzenmacher 2006 — two
hash evaluations give k independent probes), with
``pandas.util.hash_array`` (keyed SipHash-like, vectorized,
deterministic for fixed keys) supplying h1/h2 per Arrow batch.
Build is one mapInPandas pass emitting a PER-PARTITION bitmap
(m/8 bytes each) OR-merged on the driver — the mergeable-summary
shape (cf. operators/heavyhitters.py); probe is the same vectorized
kernel testing k bits per row, Arrow-batched, scan-local.

Sizing: ``bloom_params`` gives the textbook optimum
m = -n ln p / (ln 2)^2, k = (m/n) ln 2; 10M keys at 1% FPR is
~12 MB — broadcast-trivial.

Reference basis: Bloom 1970; Kirsch-Mitzenmacher 2006; the
reference repo has no such surface (389 lines, Kafka->csv).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_KEY1 = "0123456789abcdef"  # fixed hash keys: build/probe must agree
_KEY2 = "fedcba9876543210"


def bloom_params(num_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, k) for ``num_items`` keys at false-positive
    rate ``fpp``."""
    if num_items < 1 or not 0 < fpp < 1:
        raise ValueError(f"need num_items >= 1 and 0 < fpp < 1, got {num_items}, {fpp}")
    m = max(64, int(math.ceil(-num_items * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m / num_items * math.log(2))))
    return m, k


def _positions(values: pd.Series, m: int, k: int) -> np.ndarray:
    """(len(values), k) bit positions via double hashing."""
    s = values.astype(str).to_numpy(dtype=object)
    h1 = pd.util.hash_array(s, hash_key=_KEY1).astype(np.uint64)
    h2 = pd.util.hash_array(s, hash_key=_KEY2).astype(np.uint64) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(
        np.int64
    )


def bloom_build(
    df: DataFrame, col: str, num_items: int, fpp: float = 0.01
) -> dict:
    """One distributed pass; returns {"m", "k", "bits": bytes,
    "n_added"}. Nulls are skipped (a null key matches nothing)."""
    m, k = bloom_params(num_items, fpp)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(m // 8 + 1, dtype=np.uint8)
        n = 0
        for pdf in batches:
            s = pdf[col].dropna()
            if not len(s):
                continue
            n += len(s)
            pos = _positions(s, m, k).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if n:
            yield pd.DataFrame({"bits": [bits.tobytes()], "n": [n]})

    rows = df.select(col).mapInPandas(build, schema="bits binary, n long").collect()
    merged = np.zeros(m // 8 + 1, dtype=np.uint8)
    n_added = 0
    for r in rows:
        merged |= np.frombuffer(r.bits, dtype=np.uint8)
        n_added += r.n
    return {"m": m, "k": k, "bits": merged.tobytes(), "n_added": n_added}


def bloom_might_contain(
    df: DataFrame, col: str, model: dict, out_col: str = "might_contain"
) -> DataFrame:
    """Append a boolean membership column — true for every key that
    was added (guaranteed) and for ~fpp of the rest. Null keys are
    false. Vectorized k-bit test per Arrow batch, scan-local."""
    m, k = model["m"], model["k"]
    bits = np.frombuffer(model["bits"], dtype=np.uint8)
    cols = list(df.columns)
    fields = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = np.zeros(len(pdf), dtype=bool)
            live = pdf[col].notna().to_numpy()
            if live.any():
                pos = _positions(pdf[col][live], m, k)
                hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
                res[live] = hit.all(axis=1)
            out = pdf.copy()
            out[out_col] = res
            yield out

    return df.mapInPandas(probe, schema=f"{fields}, {out_col} boolean")


def bloom_semi_filter(df: DataFrame, col: str, model: dict) -> DataFrame:
    """Rows whose key MIGHT be in the summarized set — a superset of
    the exact semi-join result (never drops a true match), shrinking
    the big side before the real join/dedup pays its shuffle."""
    return (
        bloom_might_contain(df, col, model, out_col="__bf")
        .filter("__bf")
        .drop("__bf")
    )


def bloom_dumps(model: dict) -> str:
    """JSON wire format for a summary (bits base64-encoded) — the
    one tested round-trip every persisted-bloom consumer shares
    (stream-curate's snapshot sidecar; any saved index summary)."""
    import base64
    import json

    return json.dumps(
        {
            "m": int(model["m"]),
            "k": int(model["k"]),
            "n_added": int(model["n_added"]),
            "bits_b64": base64.b64encode(model["bits"]).decode("ascii"),
        }
    )


def bloom_loads(text: str) -> dict:
    """Inverse of bloom_dumps, with STRUCTURAL validation — persisted
    summaries are pure accelerators, so a consumer must be able to
    catch one ValueError and fall back rather than crash later inside
    an executor probe (truncated bits -> IndexError, m=0 -> modulo
    error). Raises ValueError on anything malformed."""
    import base64
    import json

    try:
        meta = json.loads(text)
    except json.JSONDecodeError as e:
        raise ValueError(f"bloom summary is not JSON: {e}") from e
    if not isinstance(meta, dict):
        raise ValueError("bloom summary is not a JSON object")
    try:
        m, k, n = int(meta["m"]), int(meta["k"]), int(meta["n_added"])
        bits = base64.b64decode(meta["bits_b64"], validate=True)
    except (KeyError, TypeError, ValueError) as e:
        raise ValueError(f"bloom summary fields malformed: {e}") from e
    if m <= 0 or k <= 0:
        raise ValueError(f"bloom summary has m={m}, k={k}")
    if len(bits) != m // 8 + 1:
        raise ValueError(
            f"bloom bits length {len(bits)} != m//8+1 = {m // 8 + 1}"
        )
    return {"m": m, "k": k, "bits": bits, "n_added": n}
