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
