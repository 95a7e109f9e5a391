"""Bucketed CDC state: golden equality with the whole-snapshot path, and
the scale property — a batch rewrites ONLY the buckets it touches."""

from __future__ import annotations

import json
import pathlib

from one_stop_cdc_ingestion_toolkit_spark.streaming.pipeline import (
    Pipeline,
    PipelineSpec,
    TableSpec,
)
from tests.cdc_fixtures import (
    CANONICAL_EVENTS,
    GOLDEN_STATE,
    PERSON_SCHEMA,
    envelope,
    person,
    write_stream_files,
)

N_BUCKETS = 8


def _spec(tmp_path) -> PipelineSpec:
    return PipelineSpec(
        name="pb",
        source_dir=str(tmp_path / "stream"),
        tables=[TableSpec("person", ["firstName"], PERSON_SCHEMA, n_buckets=N_BUCKETS)],
        sink_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )


def _state(pipe) -> dict:
    return {
        r["firstName"]: (r["firstName"], r["lastName"], r["age"])
        for r in pipe.read_table("person").collect()
    }


def test_bucketed_golden(spark, tmp_path):
    spec = _spec(tmp_path)
    write_stream_files(spec.source_dir, CANONICAL_EVENTS, files=2)
    pipe = Pipeline(spark, spec)
    pipe.process_available()
    pipe.stop()
    assert _state(pipe) == GOLDEN_STATE


def test_batch_rewrites_only_touched_buckets(spark, tmp_path):
    spec = _spec(tmp_path)
    write_stream_files(spec.source_dir, CANONICAL_EVENTS, files=1)
    pipe = Pipeline(spark, spec)
    pipe.process_available()
    pipe.stop()
    before = pipe.store.bucket_map("person")

    # second batch touches a single key → a single bucket
    late = [envelope("u", 10, before=person("alice", "brown", 31),
                     after=person("alice", "grey", 32))]
    with open(pathlib.Path(spec.source_dir) / "late.json", "w") as f:
        for e in late:
            f.write(json.dumps(e) + "\n")
    pipe2 = Pipeline(spark, spec)
    pipe2.process_available()
    pipe2.stop()
    after = pipe2.store.bucket_map("person")

    changed = {b for b in after if after[b] != before.get(b)}
    assert len(changed) == 1, f"one key => one rewritten bucket, got {changed}"
    expect = dict(GOLDEN_STATE)
    expect["alice"] = ("alice", "grey", 32)
    assert _state(pipe2) == expect
    # untouched buckets still point at the original generation
    untouched = set(before) - changed
    assert all(after[b] == before[b] for b in untouched)


def test_snapshot_to_bucketed_migration(spark, tmp_path):
    """Enabling n_buckets on an existing whole-snapshot table must fold
    the snapshot into the bucketed layout, not silently start empty."""
    spec_flat = PipelineSpec(
        name="pb",
        source_dir=str(tmp_path / "stream"),
        tables=[TableSpec("person", ["firstName"], PERSON_SCHEMA)],  # no buckets
        sink_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    write_stream_files(spec_flat.source_dir, CANONICAL_EVENTS, files=1)
    pipe = Pipeline(spark, spec_flat)
    pipe.process_available()
    pipe.stop()
    assert pipe.store.layout("person") == "snapshot"

    late = [envelope("u", 10, before=person("alice", "brown", 31),
                     after=person("alice", "grey", 32))]
    with open(pathlib.Path(spec_flat.source_dir) / "late.json", "w") as f:
        for e in late:
            f.write(json.dumps(e) + "\n")
    spec_b = _spec(tmp_path)  # same dirs, now bucketed
    pipe2 = Pipeline(spark, spec_b)
    pipe2.process_available()
    pipe2.stop()
    assert pipe2.store.layout("person") == "bucketed"
    expect = dict(GOLDEN_STATE)
    expect["alice"] = ("alice", "grey", 32)
    assert _state(pipe2) == expect  # snapshot rows survived the migration


def test_whole_snapshot_write_refused_on_bucketed_table(spark, tmp_path):
    import pytest

    spec = _spec(tmp_path)
    write_stream_files(spec.source_dir, CANONICAL_EVENTS[:2], files=1)
    pipe = Pipeline(spark, spec)
    pipe.process_available()
    pipe.stop()
    df = pipe.store.read(spark, "person")
    with pytest.raises(ValueError, match="bucketed layout"):
        pipe.store.write(df, "person")


def test_generation_pruning(spark, tmp_path):
    spec = _spec(tmp_path)
    write_stream_files(spec.source_dir, CANONICAL_EVENTS, files=4)
    pipe = Pipeline(spark, spec)
    pipe.process_available()
    pipe.stop()
    tdir = pathlib.Path(spec.sink_dir) / "person"
    live = set(pipe.store.bucket_map("person").values())
    on_disk = {p.name for p in tdir.glob("gen-*")}
    assert on_disk == live, "unreferenced generations must be pruned"
