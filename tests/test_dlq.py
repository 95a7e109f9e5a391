"""Dead-letter quarantine: malformed source records land in the reserved
``_dlq`` table with a reason, never poison the merge, and stay
idempotent under at-least-once replay."""

from __future__ import annotations

import json

from one_stop_cdc_ingestion_toolkit_spark.streaming.pipeline import (
    Pipeline,
    PipelineSpec,
    TableSpec,
)
from tests.cdc_fixtures import (
    CANONICAL_EVENTS,
    GOLDEN_STATE,
    PERSON_SCHEMA,
    write_stream_files,
)

BROKEN = [
    {"key": "x1", "value": "{this is not json"},
    {"key": "x2", "value": json.dumps({"foo": 1})},  # JSON, not an envelope
    {
        "key": "x3",
        # envelope-ish but no source.table
        "value": json.dumps(
            {"before": None, "after": {"firstName": "zed"}, "op": "c",
             "ts_ms": 1, "source": {"db": "cdc_test_db"}}
        ),
    },
]


def _spec(tmp_path) -> PipelineSpec:
    return PipelineSpec(
        name="dlq",
        source_dir=str(tmp_path / "stream"),
        tables=[TableSpec("person", ["firstName"], PERSON_SCHEMA)],
        sink_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )


def _state(df) -> dict:
    return {
        r["firstName"]: (r["firstName"], r["lastName"], r["age"])
        for r in df.collect()
    }


def test_malformed_records_quarantined_not_merged(spark, tmp_path):
    spec = _spec(tmp_path)
    write_stream_files(spec.source_dir, CANONICAL_EVENTS + BROKEN, files=2)
    pipe = Pipeline(spark, spec)
    pipe.process_available()
    pipe.stop()
    # the merge saw only the clean events
    assert _state(pipe.read_table("person")) == GOLDEN_STATE
    dlq = {r["key"]: r["reason"] for r in pipe.read_dlq().collect()}
    assert dlq == {
        "x1": "not_an_envelope",
        "x2": "not_an_envelope",
        "x3": "missing_source_table",
    }


def test_dlq_replay_idempotent(spark, tmp_path):
    """Re-delivering the same malformed records (at-least-once) must not
    duplicate DLQ rows."""
    spec = _spec(tmp_path)
    write_stream_files(spec.source_dir, CANONICAL_EVENTS + BROKEN, files=1)
    pipe = Pipeline(spark, spec)
    pipe.process_available()
    # second delivery of the same bad records in a NEW file (the file
    # source tracks processed paths by name)
    with open(f"{spec.source_dir}/redeliver.json", "w") as f:
        for e in BROKEN:
            f.write(json.dumps(e) + "\n")
    pipe.process_available()
    pipe.stop()
    assert pipe.read_dlq().count() == len(BROKEN)


def test_clean_stream_has_no_dlq(spark, tmp_path):
    spec = _spec(tmp_path)
    write_stream_files(spec.source_dir, CANONICAL_EVENTS, files=1)
    pipe = Pipeline(spark, spec)
    pipe.process_available()
    pipe.stop()
    assert pipe.read_dlq() is None
