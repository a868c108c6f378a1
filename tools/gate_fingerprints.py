"""Maintain tests/gate_fingerprints.json -- the freshness ledger the
gate-window test enforces.

The external driver gate only emits CORRECTNESS rows for the first 50
registered catalog queries, so a query can "rest" on evidence from an
earlier round only while its code is byte-for-byte what that round
verified. This ledger pins, per query:

  fp             sha256 over ast.dump of the builder function, the
                 oracle SQL, and the ast.dump of every
                 operators.<mod> module the builder source mentions
                 (so editing an operator invalidates the queries
                 built on it, not just edits to catalog.py).
  attested_round the driver round whose window the query was in when
                 this fp was captured.

tests/test_catalog_order.py fails whenever a query's current fp
differs from the ledger but the query is NOT in the current
_GATE_PRIORITY window -- i.e. you cannot change a query (or an
operator under it) without routing it back through driver
verification. Regenerate after rotating the window:

    python tools/gate_fingerprints.py --round N

which re-stamps ONLY the queries currently in the window (they will
receive a round-N driver row) and leaves the rest on their prior
attestation, erroring if any non-window query drifted.

Round-6 lesson (phantom attestations): ``--round N`` stamps at
window-ROTATION time, so a window revision AFTER stamping leaves
rotated-out queries claiming a driver round they were never part of.
After every driver run, reconcile the ledger against reality:

    python tools/gate_fingerprints.py --reconcile

which resets any ``attested_round`` that has no green row in that
round's ``CORRECTNESS_r*.json`` back to the newest round that DOES
hold a green row for the query. tests/test_catalog_order.py
additionally asserts ledger <= driver rows so a phantom can never
survive a pytest run again.
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import inspect
import json
import os
import re
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "tests", "gate_fingerprints.json")

if REPO not in sys.path:  # runnable as `python tools/gate_fingerprints.py`
    sys.path.insert(0, REPO)

_MOD_IMPORT = re.compile(r"(operators|sources|streaming)\.(\w+)")


def _module_ast_sha(pkg: str, mod_name: str) -> str:
    path = os.path.join(
        REPO, "utc_cuip_kafka_aws_connector_spark", pkg, f"{mod_name}.py"
    )
    with open(path) as fh:
        return hashlib.sha256(ast.dump(ast.parse(fh.read())).encode()).hexdigest()


def fingerprint(entry) -> str:
    """sha256 over (builder AST, oracle SQL, AST of every operators/
    sources/streaming module the builder source names). The universal
    dependency -- load_table in sources/batch.py -- is invisible here
    (builders call it through the module-level ``T`` alias); drift in
    it is guarded by tests/test_schema_contract.py instead, which pins
    the post-load dtypes every builder assumes."""
    src = textwrap.dedent(inspect.getsource(entry.builder))
    parts = [ast.dump(ast.parse(src)), entry.oracle or ""]
    for pkg, mod in sorted(set(_MOD_IMPORT.findall(src))):
        if not os.path.exists(
            os.path.join(REPO, "utc_cuip_kafka_aws_connector_spark", pkg, f"{mod}.py")
        ):
            continue  # e.g. "sources.batch" naming in prose, module layout moved
        parts.append(f"{pkg}.{mod}:{_module_ast_sha(pkg, mod)}")
    return hashlib.sha256("\0".join(parts).encode()).hexdigest()


def current_fingerprints() -> dict[str, str]:
    from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG

    return {name: fingerprint(e) for name, e in CATALOG.items()}


def load_ledger() -> dict:
    if not os.path.exists(LEDGER):
        return {}
    with open(LEDGER) as fh:
        return json.load(fh)


def _row_is_green(row: dict) -> bool:
    """A driver CORRECTNESS row counts as evidence only when rows and
    schema match and the value hash did not mismatch (hash_match may be
    null for the driver's weaker rows-only check on oracle-less ops)."""
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match") is not False
    )


def green_rounds(corr_dir: str = REPO) -> dict[str, list[int]]:
    """name -> sorted driver rounds holding a green CORRECTNESS row."""
    import glob

    out: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(corr_dir, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if _row_is_green(row):
                out.setdefault(name, []).append(rnd)
    return out


def reconcile(
    ledger: dict, corr_dir: str = REPO, fp_at_attestation=None
) -> tuple[dict, list[str]]:
    """Stamp from driver reality, not window membership: any
    attested_round whose CORRECTNESS_r{N}.json EXISTS but holds no
    green row for the query is reset to the newest round that does
    hold one. A stamp for a round whose driver gate has not run yet
    (no CORRECTNESS file) is provisional and left alone -- the test
    layer separately requires those entries to sit inside the current
    gate window. Returns (corrected ledger, corrected query names).

    Laundering guard (same check as demote_evicted_provisionals): a
    reset is only legal when the fingerprint the ledger recorded at
    the restored round's attestation (git history) equals the entry's
    CURRENT fp -- otherwise the code drifted after the real evidence
    (e.g. it was changed for a window run that came back red) and
    restoring the old round would mark the NEW code verified. Such a
    query must go back through the gate window instead."""
    if fp_at_attestation is None:
        fp_at_attestation = _fp_at_attestation
    evidence = green_rounds(corr_dir)
    fixed: list[str] = []
    for name, ent in ledger.items():
        attested = ent["attested_round"]
        if not os.path.exists(
            os.path.join(corr_dir, f"CORRECTNESS_r{attested:02d}.json")
        ):
            continue  # provisional pre-run stamp
        rounds = evidence.get(name, [])
        if attested in rounds:
            continue  # stamp is backed by a real green row
        if not rounds:
            raise SystemExit(
                f"ERROR: {name} attested for round {attested} but has no "
                "green row in ANY CORRECTNESS file -- no true round to "
                "restore; rotate it into the gate window instead."
            )
        real = max(rounds)
        hist_fp = fp_at_attestation(name, real)
        if hist_fp != ent["fp"]:
            raise SystemExit(
                f"ERROR: {name}'s round-{attested} stamp has no green row, "
                f"and its ledger fingerprint differs from the one round "
                f"{real} (its newest real evidence) verified -- the code "
                "changed after that evidence, so restoring the old round "
                "would mark unverified code as verified. Rotate it into "
                "the gate window instead."
            )
        ent["attested_round"] = real
        fixed.append(name)
    return ledger, fixed


def _fp_at_attestation(name: str, rnd: int) -> str | None:
    """The fingerprint the ledger recorded for ``name`` when it was
    last stamped ``attested_round == rnd``, recovered from the git
    history of the ledger file (newest matching commit wins). None if
    no committed ledger version ever attested that round."""
    import subprocess

    commits = subprocess.check_output(
        ["git", "log", "--format=%H", "--", "tests/gate_fingerprints.json"],
        cwd=REPO,
        text=True,
    ).split()
    for commit in commits:
        try:
            blob = subprocess.check_output(
                ["git", "show", f"{commit}:tests/gate_fingerprints.json"],
                cwd=REPO,
                text=True,
                stderr=subprocess.DEVNULL,
            )
        except subprocess.CalledProcessError:
            continue
        ent = json.loads(blob).get(name)
        if ent and ent.get("attested_round") == rnd:
            return ent["fp"]
    return None


def demote_evicted_provisionals(
    ledger: dict,
    window: set[str],
    fps: dict[str, str],
    corr_dir: str = REPO,
    fp_at_attestation=_fp_at_attestation,
) -> list[tuple[str, int, int]]:
    """The r7 eviction lesson (the r6 phantom mechanism in a new
    guise): a query stamped provisionally for the round being
    prepared and then rotated OUT of the window keeps claiming a
    driver run it will not be part of. Reset each such entry to its
    newest REAL green round — but only when the fingerprint recorded
    at that round's attestation (from the ledger's git history)
    equals the current one, so drift since the real evidence can
    never be laundered into a demoted stamp. Mutates ``ledger``;
    returns (name, provisional_round, restored_round) demotions."""
    evidence = green_rounds(corr_dir)
    demoted: list[tuple[str, int, int]] = []
    for name, ent in ledger.items():
        if name in window:
            continue
        attested = ent["attested_round"]
        if os.path.exists(
            os.path.join(corr_dir, f"CORRECTNESS_r{attested:02d}.json")
        ):
            continue  # real (or phantom -> reconcile's job), not provisional
        rounds = evidence.get(name, [])
        if not rounds:
            raise SystemExit(
                f"ERROR: {name} holds a provisional round-{attested} stamp "
                "but is no longer in the gate window and has no green row "
                "in any CORRECTNESS file — rotate it back into "
                "_GATE_PRIORITY (a never-verified query cannot rest)."
            )
        real = max(rounds)
        hist_fp = fp_at_attestation(name, real)
        if hist_fp != fps.get(name):
            raise SystemExit(
                f"ERROR: {name} was rotated out of the window while "
                f"provisionally stamped for round {attested}, and its "
                f"current fingerprint differs from the one round {real} "
                "verified (or no committed ledger ever attested that "
                "round) — its code drifted since the real evidence (or "
                "the fingerprint algorithm changed; see --rekey). Rotate "
                "it back into the gate window instead of letting it rest."
            )
        ent["attested_round"] = real
        demoted.append((name, attested, real))
    return demoted


def _verify_drift_is_algorithm_only(
    drifted: list[str], ledger: dict, old_ref: str
) -> list[str]:
    """Load this tool as of ``old_ref`` from git and recompute every
    drifted query's fingerprint under that OLD algorithm. Returns the
    queries whose old-algorithm fingerprint does NOT equal the ledger
    value -- i.e. whose drift is a genuine code change that --rekey
    must not launder into a preserved attestation."""
    import importlib.util
    import subprocess
    import tempfile

    src = subprocess.check_output(
        ["git", "show", f"{old_ref}:tools/gate_fingerprints.py"],
        cwd=REPO,
        text=True,
    )
    # The temp copy must live in tools/ so the old module's REPO
    # (dirname(dirname(__file__))) resolves to this repo.
    with tempfile.NamedTemporaryFile(
        "w", suffix=".py", dir=os.path.join(REPO, "tools"), delete=False
    ) as tf:
        tf.write(src)
        old_path = tf.name
    try:
        spec = importlib.util.spec_from_file_location("gate_fps_old", old_path)
        old_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(old_mod)
        old_fps = old_mod.current_fingerprints()
    finally:
        os.unlink(old_path)
    return [n for n in drifted if old_fps.get(n) != ledger[n]["fp"]]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--reconcile",
        action="store_true",
        help="post-driver-run step: reset any attested_round that has no "
        "green row in that round's CORRECTNESS_r*.json back to the "
        "newest round that does (fingerprints untouched). Run this at "
        "the START of every round, before rotating the window.",
    )
    ap.add_argument("--round", type=int, help="driver round now being prepared")
    ap.add_argument(
        "--force",
        action="store_true",
        help="re-stamp drifted NON-window queries too (only when their "
        "change is provably cosmetic; normally an error)",
    )
    ap.add_argument(
        "--rekey",
        action="store_true",
        help="the fingerprint ALGORITHM changed (not the code): update "
        "fp for drifted non-window queries but KEEP their prior "
        "attested_round. Verified, not trusted: each drifted query's "
        "fingerprint is recomputed under the OLD algorithm (this tool "
        "as of --old-ref) and must equal the ledger value -- a real "
        "code change cannot launder itself into a kept attestation.",
    )
    ap.add_argument(
        "--old-ref",
        default="HEAD",
        help="git ref holding the previous fingerprint algorithm for "
        "--rekey verification (default HEAD: the last committed tool)",
    )
    args = ap.parse_args()

    if args.reconcile:
        ledger, fixed = reconcile(load_ledger())
        with open(LEDGER, "w") as fh:
            json.dump(ledger, fh, indent=1, sort_keys=False)
            fh.write("\n")
        print(
            f"reconciled {len(fixed)} phantom attestation(s)"
            + (f": {fixed}" if fixed else "")
            + f"; ledger -> {LEDGER}"
        )
        return 0

    if args.round is None:
        ap.error("--round is required unless --reconcile is given")

    from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG, _GATE_PRIORITY

    window = set(_GATE_PRIORITY)
    fps = current_fingerprints()
    ledger = load_ledger()
    drifted = [
        n
        for n in CATALOG
        if n not in window
        and n in ledger
        and ledger[n]["fp"] != fps[n]
    ]
    if drifted and not (args.force or args.rekey):
        print(
            "ERROR: changed outside the gate window (rotate them in or "
            f"revert): {drifted}"
        )
        return 1
    if args.rekey and drifted:
        bad = _verify_drift_is_algorithm_only(drifted, ledger, args.old_ref)
        if bad:
            print(
                "ERROR: --rekey refused. Under the OLD algorithm "
                f"({args.old_ref}) these queries do NOT match their ledger "
                f"fingerprint, so their drift is a real code change, not an "
                f"algorithm change: {bad}. Rotate them into the gate window."
            )
            return 1
    never_attested = [n for n in CATALOG if n not in ledger and n not in window]
    if never_attested:
        # Stamping these would mint evidence for a run they won't be
        # part of -- the r6 phantom mechanism. Refuse.
        print(
            "ERROR: new queries outside the gate window (rotate them into "
            f"_GATE_PRIORITY so round {args.round} actually verifies them): "
            f"{never_attested}"
        )
        return 1
    for name in CATALOG:
        if args.rekey and name in drifted and name not in window:
            ledger[name] = {"fp": fps[name], "attested_round": ledger[name]["attested_round"]}
        elif name in window or (args.force and name in drifted):
            ledger[name] = {"fp": fps[name], "attested_round": args.round}
        # else: out-of-window and unchanged -- keep the prior attestation
    ledger = {n: ledger[n] for n in CATALOG}  # drop deleted queries, fix order
    # Names stamped in THIS run are legitimate provisionals: the
    # window queries, plus (under --force) the drifted non-window
    # queries that were just re-stamped. Excluding the latter from
    # demotion is what lets --force do its stated job -- a drifted
    # query's current fp necessarily differs from its last attested
    # fp, so demote_evicted_provisionals would otherwise always raise
    # and the ledger would never be written (round-7 ADVICE finding).
    stamped = window | (set(drifted) if args.force else set())
    demoted = demote_evicted_provisionals(ledger, stamped, fps)
    for name, prov, real in demoted:
        print(
            f"demoted {name}: provisional r{prov} stamp (rotated out of "
            f"the window) -> real round-{real} evidence"
        )
    with open(LEDGER, "w") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=False)
        fh.write("\n")
    stamped = sum(1 for n in CATALOG if n in window)
    print(f"stamped {stamped} window queries at round {args.round}; ledger -> {LEDGER}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
