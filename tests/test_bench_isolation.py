"""bench.py per-query failure isolation (round-4 lesson: one
AnalysisException in the warmup pass zeroed out the entire BENCH
artifact -- rc=1, no timings for 74 healthy queries).

Runs bench.main() against a shrunken catalog where one builder always
raises, and asserts the envelope still comes out with timings for the
healthy queries and an {"err": ...} entry for the broken one.
"""

from __future__ import annotations

import json
import os

import bench
from utc_cuip_kafka_aws_connector_spark.plans import catalog


def test_broken_query_cannot_zero_the_artifact(spark, monkeypatch, capsys, tmp_path):
    sf_dir = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

    def boom(spark, sf_dir):
        raise RuntimeError("deliberately broken builder")

    small = {
        "q23_predicates": catalog.CATALOG["q23_predicates"],
        "q_broken": catalog.CatalogEntry(name="q_broken", builder=boom, oracle=None),
        "q13_having": catalog.CATALOG["q13_having"],
    }
    monkeypatch.setattr(catalog, "CATALOG", small)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf_dir)
    monkeypatch.setattr(
        bench, "_bench_reference_pipeline", lambda spark, sf_dir: 0.0
    )
    monkeypatch.setattr(
        "utc_cuip_kafka_aws_connector_spark.cli.run_curate",
        lambda *a, **kw: {"read": 0, "survived": 0},
    )
    monkeypatch.setattr(
        "utc_cuip_kafka_aws_connector_spark.session.get_spark",
        lambda **kw: spark,
    )
    # Redirect the full-envelope file: the default lands in the repo
    # root, and a test run must never clobber a recorded bench
    # artifact there.
    full_path = str(tmp_path / "bench_full.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FULL", full_path)

    bench.main()

    # The LAST stdout line is the compact driver-facing summary and
    # must fit the driver's ~2 KiB stdout tail on its own.
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(out) <= 1900
    payload = json.loads(out)
    q = payload["queries"]
    assert isinstance(q["q23_predicates"], float)
    assert isinstance(q["q13_having"], float)
    assert payload["errors"] == 1
    assert payload["partial"] is True  # totals over survivors only
    assert payload["value"] > 0
    assert payload["n_queries"] == 5  # 2 healthy + pipeline_ingest + curate_pipeline + clean_pipeline

    # The complete per-query envelope (timings + err entries) lands
    # at the redirected bench_full.json path.
    with open(full_path) as fh:
        full = json.load(fh)
    assert "deliberately broken builder" in full["queries"]["q_broken"]["err"]
    assert isinstance(full["queries"]["q23_predicates"], float)
    assert full["partial"] is True


def test_envelope_carries_load_marker(spark, monkeypatch, capsys, tmp_path):
    """Round-6 VERDICT: driver-envelope totals shift uniformly with
    machine load; the envelope must carry a loadavg + fixed-probe
    marker so cross-round comparisons can be normalized."""
    sf_dir = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")
    small = {"q23_predicates": catalog.CATALOG["q23_predicates"]}
    monkeypatch.setattr(catalog, "CATALOG", small)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf_dir)
    monkeypatch.setattr(bench, "_bench_reference_pipeline", lambda spark, sf_dir: 0.0)
    monkeypatch.setattr(
        "utc_cuip_kafka_aws_connector_spark.cli.run_curate",
        lambda *a, **kw: {"read": 0, "survived": 0},
    )
    monkeypatch.setattr(
        "utc_cuip_kafka_aws_connector_spark.session.get_spark", lambda **kw: spark
    )
    full_path = str(tmp_path / "bench_full.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FULL", full_path)

    bench.main()

    out = capsys.readouterr().out.strip().splitlines()[-1]
    compact = json.loads(out)
    full = json.load(open(full_path))
    for payload in (compact, full):
        marker = payload["load"]
        assert len(marker["loadavg"]) == 3
        assert marker["probe_sec"] > 0
    assert len(out) <= 1900


def test_bench_compare_reads_driver_envelopes(tmp_path):
    """tools/bench_compare.py must recover timings and the load
    marker from a DRIVER BENCH_r{N}.json envelope: via the `parsed`
    compact object when the line survived truncation, via tail regex
    otherwise -- and the tail regex must accept the compact format's
    space-free `"name":1.23` pairs (the form BENCH_r06 actually
    carries; a ' ' after the colon silently matched nothing)."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_compare",
        os.path.join(os.path.dirname(__file__), "..", "tools", "bench_compare.py"),
    )
    bc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bc)

    compact = {
        "metric": "catalog_total_runtime",
        "value": 10.0,
        "queries": {"q01_pricing_summary": 1.23, "pipeline_ingest": 0.5},
        "load": {"loadavg": [1.0, 1.0, 1.0], "probe_sec": 0.1},
    }
    line = json.dumps(compact, separators=(",", ":"))

    parsed_env = tmp_path / "parsed.json"
    parsed_env.write_text(json.dumps({"tail": "noise\n" + line, "parsed": compact}))
    assert bc.load_timings(str(parsed_env)) == {
        "q01_pricing_summary": 1.23,
        "pipeline_ingest": 0.5,
    }
    assert bc.load_probe(str(parsed_env)) == 0.1

    # Truncated: parsed is null, only a tail fragment survives.
    tail_env = tmp_path / "tail.json"
    tail_env.write_text(
        json.dumps({"tail": line[: line.index('"load"')], "parsed": None})
    )
    assert bc.load_timings(str(tail_env)) == {
        "q01_pricing_summary": 1.23,
        "pipeline_ingest": 0.5,
    }
