"""CLI entry (reference R24 parity): ingest routes by topic family and
produces the golden lake layout."""

from __future__ import annotations

import json
import os

from utc_cuip_kafka_aws_connector_spark.cli import run_ingest

VISION = [
    {"timestamp": 1610668800000, "camera_id": "cam-a",
     "locations": [{"x": 1.0, "y": 2.0, "label": "car"}]},
    {"timestamp": 1612137600000, "camera_id": "cam-b", "locations": [], "hit_counts": 0},
]


def test_ingest_vision_and_dead_letter(spark, tmp_path):
    src = tmp_path / "vision.jsonl"
    src.write_text("\n".join(json.dumps(m) for m in VISION))
    lake = str(tmp_path / "lake")

    assert run_ingest(spark, "cuip_vision_events", str(src), lake) == "vision"
    assert os.path.isdir(f"{lake}/camera_id=cam-a/year=2021/month=1")
    assert spark.read.parquet(lake).count() == 2

    assert run_ingest(spark, "totally_unknown", str(src), lake) == "dead_letter"
    assert spark.read.text(f"{lake}/dead_letter/totally_unknown").count() == 2
