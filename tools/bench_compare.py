"""Bench regression guard: compare two bench JSON outputs and flag
per-query regressions.

Usage:
    python tools/bench_compare.py BASELINE.json CURRENT.json [--threshold 2.0]

Each file is either a raw ``bench.py`` output line
(``{"metric": ..., "queries": {...}}``) or a driver ``BENCH_r{N}.json``
envelope whose ``tail`` field holds a (possibly truncated) fragment of
that line -- per-query numbers are recovered by regex in that case.

Exit code 0 = no query regressed beyond the threshold; 1 = at least
one did (names and ratios printed). Queries present in only one file
are reported informationally and never fail the guard (the catalog
grows and consolidates across rounds).
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def load_probe(path: str) -> float | None:
    """The envelope's machine-load marker probe time (round 7+), or
    None for older artifacts. Driver BENCH_r{N}.json envelopes carry
    the marker only inside the (possibly truncated) ``tail`` fragment
    -- recover it by regex there, as load_timings does for timings
    (the motivating use is normalizing a driver envelope against a
    local run, so this path must work)."""
    with open(path) as fh:
        doc = json.load(fh)
    for d in (doc, doc.get("parsed") or {}):
        load = d.get("load")
        if isinstance(load, dict) and isinstance(load.get("probe_sec"), (int, float)):
            return float(load["probe_sec"])
    tail = doc.get("tail")
    if isinstance(tail, str):
        # number pattern covers scientific notation: json.dumps emits
        # e.g. 9.7e-05 for very small probe times (round-7 ADVICE)
        m = re.search(r'"probe_sec":\s*([0-9]+\.?[0-9]*(?:[eE][+-]?[0-9]+)?)', tail)
        if m:
            return float(m.group(1))
    return None


def load_timings(path: str) -> dict[str, float]:
    with open(path) as fh:
        doc = json.load(fh)
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        # Driver envelope whose compact line parsed cleanly: use it
        # (holds the totals + 10 slowest; finer than tail-regexing).
        doc = doc["parsed"]
    if "queries" in doc:
        # numeric timings only; {"err": ...} entries (bench.py's
        # per-query failure isolation) are reported, not compared
        out, errs = {}, []
        for k, v in doc["queries"].items():
            if isinstance(v, (int, float)):
                out[k] = float(v)
            else:
                errs.append(k)
        if errs:
            print(f"{path}: {len(errs)} errored queries excluded: {', '.join(sorted(errs))}")
        return out
    if "tail" in doc:
        # Driver envelope: the tail is a fragment of the bench JSON
        # line; recover whatever per-query pairs survived truncation.
        # \s* not a literal space: bench.py's compact line is emitted
        # with separators=(",", ":") -- no space after the colon.
        pairs = re.findall(
            r'"(q\w+|pipeline_ingest|curate_pipeline)":'
            r"\s*([0-9]+\.?[0-9]*(?:[eE][+-]?[0-9]+)?)",
            doc["tail"],
        )
        if pairs:
            return {k: float(v) for k, v in pairs}
    raise SystemExit(f"{path}: no per-query timings found")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("baseline")
    ap.add_argument("current")
    ap.add_argument(
        "--threshold",
        type=float,
        default=2.0,
        help="fail when current/baseline exceeds this ratio (default 2.0)",
    )
    ap.add_argument(
        "--min-sec",
        type=float,
        default=0.5,
        help="ignore queries faster than this in BOTH files -- sub-second "
        "timings are noise-dominated (default 0.5)",
    )
    ap.add_argument(
        "--normalize-load",
        action="store_true",
        help="scale CURRENT timings by base_probe/current_probe using the "
        "envelopes' machine-load markers, separating a uniform "
        "environment shift from real regressions (both files must "
        "carry the round-7+ load marker)",
    )
    args = ap.parse_args()

    base = load_timings(args.baseline)
    cur = load_timings(args.current)
    if args.normalize_load:
        bp, cp = load_probe(args.baseline), load_probe(args.current)
        if bp is None or cp is None:
            raise SystemExit(
                "--normalize-load: both envelopes need a load marker "
                f"(baseline: {bp}, current: {cp})"
            )
        scale = bp / cp
        print(f"load-normalizing current by probe ratio {scale:.3f} (base {bp}s / cur {cp}s)")
        cur = {k: v * scale for k, v in cur.items()}
    shared = sorted(set(base) & set(cur))

    regressions: list[tuple[float, str]] = []
    for name in shared:
        if base[name] < args.min_sec and cur[name] < args.min_sec:
            continue
        ratio = cur[name] / max(base[name], 1e-9)
        marker = ""
        if ratio > args.threshold:
            regressions.append((ratio, name))
            marker = "  <-- REGRESSION"
        if ratio > args.threshold or ratio < 1 / args.threshold:
            print(f"{name:36s} base={base[name]:7.2f}s cur={cur[name]:7.2f}s x{ratio:.2f}{marker}")

    bt = sum(base[n] for n in shared)
    ct = sum(cur[n] for n in shared)
    print(f"\nshared {len(shared)} queries: base={bt:.1f}s cur={ct:.1f}s x{ct / max(bt, 1e-9):.2f}")
    for name in sorted(set(cur) - set(base)):
        print(f"  new: {name} ({cur[name]:.2f}s)")
    for name in sorted(set(base) - set(cur)):
        print(f"  dropped: {name} (was {base[name]:.2f}s)")

    if regressions:
        print(f"\nFAIL: {len(regressions)} quer{'y' if len(regressions) == 1 else 'ies'} regressed >x{args.threshold}:")
        for ratio, name in sorted(regressions, reverse=True):
            print(f"  {name} x{ratio:.2f}")
        return 1
    print("OK: no per-query regression beyond threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
