"""CLI `backfill` verb: chunked snapshot load through the registry +
pipeline path, with --steps partial progress and resume-to-completion."""

from __future__ import annotations

import json

from one_stop_cdc_ingestion_toolkit_spark.cli import main
from one_stop_cdc_ingestion_toolkit_spark.registry import spec_to_json
from one_stop_cdc_ingestion_toolkit_spark.streaming.pipeline import (
    Pipeline,
    PipelineSpec,
    TableSpec,
)
from tests.cdc_fixtures import PERSON_SCHEMA


def test_cli_backfill_steps_then_complete(spark, tmp_path, capsys):
    spec = PipelineSpec(
        name="bfcli",
        source_dir=str(tmp_path / "stream"),
        tables=[TableSpec("person", ["firstName"], PERSON_SCHEMA)],
        sink_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps(spec_to_json(spec)))
    registry = str(tmp_path / "pipelines.json")
    assert main(["--registry", registry, "setup-pipeline", str(spec_file)]) == 0
    capsys.readouterr()

    snap_dir = str(tmp_path / "snap")
    rows = [(f"p{i}", f"l{i}", 30 + i) for i in range(8)]
    spark.createDataFrame(rows, PERSON_SCHEMA).write.parquet(snap_dir)

    args = [
        "--registry", registry, "backfill", "bfcli", "person", snap_dir,
        "--chunk-col", "firstName", "--chunk-size", "3",
    ]
    assert main([*args, "--steps", "1"]) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["chunks_done"] == 1 and not st["complete"]

    assert main(args) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["complete"] and st["rows_done"] == 8

    pipe = Pipeline(spark, spec)
    got = {r["firstName"] for r in pipe.read_table("person").collect()}
    assert got == {f"p{i}" for i in range(8)}
