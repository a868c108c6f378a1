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
    assert payload["n_queries"] == 4  # 2 healthy + pipeline_ingest + curate_pipeline

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
