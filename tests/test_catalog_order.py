"""Guard the driver-gate registration contract: the external
correctness gate only emits rows for the first 50 registered queries,
so ordering is load-bearing (round-2 lesson: 36 queries went
unverified for two rounds because they registered after slot 50).

The fingerprint ledger (tests/gate_fingerprints.json, maintained by
tools/gate_fingerprints.py) additionally makes freshness mechanical:
a query outside the window may only rest on a prior round's green row
while its code -- builder AST, oracle SQL, and the operators modules
it uses -- is exactly what that round verified."""

from __future__ import annotations

import importlib.util
import json
import os

from utc_cuip_kafka_aws_connector_spark.plans import catalog

_HERE = os.path.dirname(os.path.abspath(__file__))
LEDGER_PATH = os.path.join(_HERE, "gate_fingerprints.json")


def _fingerprint_tool():
    spec = importlib.util.spec_from_file_location(
        "gate_fingerprints",
        os.path.join(_HERE, "..", "tools", "gate_fingerprints.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gate_priority_is_the_window():
    names = list(catalog.CATALOG)
    assert names[: len(catalog._GATE_PRIORITY)] == catalog._GATE_PRIORITY


def test_gate_priority_fills_window_exactly():
    """50 slots, 50 priority names -- no slot wasted, none overflowed."""
    assert len(catalog._GATE_PRIORITY) == 50


def test_every_query_has_an_oracle():
    """Every catalog entry currently carries a DuckDB oracle (none have
    regressed to rows-only); if a genuinely non-SQL-expressible op is
    added later, update this to an explicit allowlist."""
    missing = [n for n, e in catalog.CATALOG.items() if e.oracle is None]
    assert missing == []


def test_ledger_covers_catalog_exactly():
    with open(LEDGER_PATH) as fh:
        ledger = json.load(fh)
    assert set(ledger) == set(catalog.CATALOG), (
        "ledger out of date: run `python tools/gate_fingerprints.py --round N`"
    )


def test_changed_queries_are_in_gate_window():
    """THE freshness invariant: any query whose fingerprint (builder
    AST + oracle + imported operators modules) drifted from its last
    driver attestation MUST be inside the 50-slot window so the next
    driver run re-verifies it. Converts 'the out-of-window queries are
    unchanged since their green row' from a hand-audit into a test."""
    with open(LEDGER_PATH) as fh:
        ledger = json.load(fh)
    fps = _fingerprint_tool().current_fingerprints()
    window = set(catalog._GATE_PRIORITY)
    stale = [
        n
        for n, fp in fps.items()
        if n not in window and (n not in ledger or ledger[n]["fp"] != fp)
    ]
    assert stale == [], (
        f"changed outside the driver window (rotate into _GATE_PRIORITY "
        f"or revert): {stale}"
    )


def test_ledger_attestations_are_backed_by_driver_rows():
    """Ledger <= driver reality (round-6 phantom lesson): an
    attested_round whose CORRECTNESS_r{N}.json exists must be backed
    by a green row in it; a stamp for a round the driver has not run
    yet is provisional and only legal for queries inside the current
    gate window (so a window revision after stamping surfaces here
    instead of minting evidence)."""
    with open(LEDGER_PATH) as fh:
        ledger = json.load(fh)
    tool = _fingerprint_tool()
    evidence = tool.green_rounds()
    window = set(catalog._GATE_PRIORITY)
    repo = os.path.join(_HERE, "..")
    bad = []
    for name, ent in ledger.items():
        attested = ent["attested_round"]
        if os.path.exists(os.path.join(repo, f"CORRECTNESS_r{attested:02d}.json")):
            if attested not in evidence.get(name, []):
                bad.append((name, attested, "no green driver row"))
        elif name not in window:
            bad.append((name, attested, "provisional stamp outside window"))
    assert bad == [], (
        f"phantom attestations (run `python tools/gate_fingerprints.py "
        f"--reconcile`): {bad}"
    )


def test_no_attestation_older_than_one_round():
    """Rotation policy: every NON-RETIRED query is driver-verified at
    least every other round -- the out-of-window tail must hold rows
    from the round immediately before the one being prepared. Retired
    queries (catalog.GATE_RETIRED, the post-ceiling policy decided at
    r8) rest permanently on their last real driver round; their
    correctness evidence is the local oracle-parity suite plus their
    frozen fingerprint (test_changed_queries_are_in_gate_window still
    forces any retired-query drift back through the window)."""
    with open(LEDGER_PATH) as fh:
        ledger = json.load(fh)
    rounds = {
        e["attested_round"]
        for n, e in ledger.items()
        if n not in catalog.GATE_RETIRED
    }
    assert max(rounds) - min(rounds) <= 1, (
        f"attestations span rounds {sorted(rounds)}; rotate the oldest "
        "queries into _GATE_PRIORITY"
    )


def test_retired_queries_rest_on_real_driver_evidence():
    """A query may only be RETIRED from the rotation (pytest-only
    coverage) while its ledger round is backed by a real green driver
    row AND its code is byte-for-byte what that round verified --
    retirement freezes evidence, it never mints any. It must also
    keep a DuckDB oracle so the local parity suite stays its
    correctness gate."""
    with open(LEDGER_PATH) as fh:
        ledger = json.load(fh)
    tool = _fingerprint_tool()
    evidence = tool.green_rounds()
    fps = tool.current_fingerprints()
    for name in catalog.GATE_RETIRED:
        assert name in catalog.CATALOG
        assert name not in catalog._GATE_PRIORITY
        assert catalog.CATALOG[name].oracle is not None
        ent = ledger[name]
        assert ent["attested_round"] in evidence.get(name, []), (
            f"retired {name} has no green driver row for its ledger round"
        )
        assert fps[name] == ent["fp"], (
            f"retired {name} drifted from its attested code -- rotate it "
            "back into the gate window (retirement does not waive "
            "verification of changes)"
        )


def test_reconcile_resets_phantoms_and_keeps_provisional(tmp_path):
    """Unit contract of tools/gate_fingerprints.py::reconcile (the r6
    phantom fix): a stamp contradicted by an EXISTING CORRECTNESS file
    resets to the newest green round; a stamp for a round whose file
    does not exist yet is provisional and untouched; a stamp with no
    green evidence anywhere is a hard error."""
    import pytest

    tool = _fingerprint_tool()
    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    red = {"rows_match": False, "schema_match": True, "hash_match": False}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"qa": green, "qb": green, "qc": green})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"qa": green, "qd": red})
    )
    ledger = {
        "qa": {"fp": "x", "attested_round": 2},  # backed: keep
        "qb": {"fp": "x", "attested_round": 2},  # phantom: reset to 1
        "qc": {"fp": "x", "attested_round": 3},  # r3 file absent: provisional
    }
    out, fixed = tool.reconcile(
        dict(ledger), corr_dir=str(tmp_path),
        fp_at_attestation=lambda n, r: "x",
    )
    assert fixed == ["qb"]
    assert out["qa"]["attested_round"] == 2
    assert out["qb"]["attested_round"] == 1
    assert out["qc"]["attested_round"] == 3

    # hash_match=False is NOT green evidence -> no true round exists
    bad = {"qd": {"fp": "x", "attested_round": 2}}
    with pytest.raises(SystemExit, match="no green row in ANY"):
        tool.reconcile(bad, corr_dir=str(tmp_path))

    # Laundering guard: qb's current fp differs from what round 1
    # actually verified -> refuse to restore the old round.
    with pytest.raises(SystemExit, match="would mark unverified code"):
        tool.reconcile(
            {"qb": {"fp": "x", "attested_round": 2}},
            corr_dir=str(tmp_path),
            fp_at_attestation=lambda n, r: "old_fp",
        )


def test_repo_ledger_is_a_reconcile_fixed_point():
    """After the r7 reconciliation the real ledger must be a fixed
    point of reconcile(): running it again changes nothing. Catches
    any future drift between the ledger and the CORRECTNESS record
    the moment it is introduced."""
    tool = _fingerprint_tool()
    with open(LEDGER_PATH) as fh:
        ledger = json.load(fh)
    _, fixed = tool.reconcile(json.loads(json.dumps(ledger)))
    assert fixed == []


def test_demote_evicted_provisionals(tmp_path):
    """Unit contract of tools/gate_fingerprints.py::
    demote_evicted_provisionals (the r7 eviction lesson): an
    out-of-window query holding a provisional stamp is reset to its
    newest real green round IF the fingerprint recorded at that
    round's attestation equals the current one; fingerprint drift
    since the real evidence (or no real evidence at all) is a hard
    error, and in-window provisional stamps are untouched."""
    import pytest

    tool = _fingerprint_tool()
    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    (tmp_path / "CORRECTNESS_r06.json").write_text(
        json.dumps({"qa": green, "qb": green})
    )
    history = {("qa", 6): "fp_a", ("qb", 6): "fp_b_old"}
    fps = {"qa": "fp_a", "qb": "fp_b_new", "qc": "fp_c", "qd": "fp_d"}

    # qa: evicted provisional, history fp matches current -> demote.
    # qd: provisional but IN window -> untouched.
    ledger = {
        "qa": {"fp": "fp_a", "attested_round": 7},
        "qd": {"fp": "fp_d", "attested_round": 7},
    }
    demoted = tool.demote_evicted_provisionals(
        ledger, {"qd"}, fps, corr_dir=str(tmp_path),
        fp_at_attestation=lambda n, r: history.get((n, r)),
    )
    assert demoted == [("qa", 7, 6)]
    assert ledger["qa"]["attested_round"] == 6
    assert ledger["qd"]["attested_round"] == 7

    # qb: drifted since its real round-6 evidence -> refuse.
    with pytest.raises(SystemExit, match="drifted since the real evidence"):
        tool.demote_evicted_provisionals(
            {"qb": {"fp": "fp_b_new", "attested_round": 7}},
            set(), fps, corr_dir=str(tmp_path),
            fp_at_attestation=lambda n, r: history.get((n, r)),
        )

    # qc: provisional, no green row anywhere -> refuse.
    with pytest.raises(SystemExit, match="cannot rest"):
        tool.demote_evicted_provisionals(
            {"qc": {"fp": "fp_c", "attested_round": 7}},
            set(), fps, corr_dir=str(tmp_path),
            fp_at_attestation=lambda n, r: history.get((n, r)),
        )


def test_force_restamped_drifted_query_is_not_demoted(tmp_path):
    """The r7 ADVICE finding: under ``--force``, a drifted non-window
    query is deliberately re-stamped at the round being prepared, so
    main() must treat it as stamped-this-run and EXCLUDE it from
    eviction demotion — its current fp necessarily differs from any
    historical attestation, so passing only the window would make
    demote_evicted_provisionals raise and --force could never write
    the ledger. main() now passes ``window | drifted`` as the stamped
    set; this pins that composition's behavior."""
    tool = _fingerprint_tool()
    # qx drifted outside the window and was --force re-stamped at r9
    # (no CORRECTNESS_r09 file yet -> provisional).
    ledger = {"qx": {"fp": "fp_new", "attested_round": 9}}
    fps = {"qx": "fp_new"}
    window: set[str] = set()
    drifted = ["qx"]
    stamped = window | set(drifted)  # the fixed main() composition
    demoted = tool.demote_evicted_provisionals(
        ledger, stamped, fps, corr_dir=str(tmp_path),
        fp_at_attestation=lambda n, r: "fp_old",
    )
    assert demoted == []
    assert ledger["qx"]["attested_round"] == 9
    # and the source really does compose the stamped set this way
    import inspect

    assert "window | (set(drifted) if args.force else set())" in inspect.getsource(
        tool.main
    )


def test_fp_at_attestation_reads_git_history():
    """The git-history lookup must recover, for a resting query (one
    attested at the ledger's oldest round), exactly the fingerprint
    the repo ledger currently holds for it (resters rest precisely
    because their code is unchanged since that round), and None for a
    round no committed ledger ever attested."""
    tool = _fingerprint_tool()
    with open(LEDGER_PATH) as fh:
        ledger = json.load(fh)
    rest_round = min(e["attested_round"] for e in ledger.values())
    resters = [n for n, e in ledger.items() if e["attested_round"] == rest_round]
    assert resters, "precondition: some query rests on older evidence"
    name = resters[0]
    assert tool._fp_at_attestation(name, rest_round) == ledger[name]["fp"]
    assert tool._fp_at_attestation(name, 99) is None
