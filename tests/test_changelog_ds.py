"""Custom Python DataSource (`changelog`): batch read, record-granular
micro-batching, checkpoint restart, and Pipeline source swap-in."""

from __future__ import annotations

import json
import pathlib

import pytest

from one_stop_cdc_ingestion_toolkit_spark.sources.changelog_ds import (
    register_changelog,
)
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


def _records(df) -> list[tuple]:
    return sorted((r["key"], r["value"]) for r in df.collect())


def _expected(events) -> list[tuple]:
    return sorted((e["key"], e["value"]) for e in events)


def test_batch_read_matches_files(spark, tmp_path):
    src = str(tmp_path / "chg")
    write_stream_files(src, CANONICAL_EVENTS, files=3)
    register_changelog(spark)
    df = spark.read.format("changelog").option("path", src).load()
    assert df.columns == ["key", "value"]
    assert _records(df) == _expected(CANONICAL_EVENTS)


def test_batch_read_empty_dir(spark, tmp_path):
    src = str(tmp_path / "empty")
    pathlib.Path(src).mkdir()
    register_changelog(spark)
    df = spark.read.format("changelog").option("path", src).load()
    assert df.count() == 0


def test_stream_record_cap_splits_one_file(spark, tmp_path):
    """One fat segment file is consumed across MULTIPLE micro-batches —
    the capability the built-in file source (maxFilesPerTrigger) lacks."""
    src = str(tmp_path / "chg")
    write_stream_files(src, CANONICAL_EVENTS, files=1)  # 8 records, 1 file
    register_changelog(spark)
    out_dir = str(tmp_path / "out")
    seen: list[int] = []

    stream = (
        spark.readStream.format("changelog")
        .option("path", src)
        .option("maxRecordsPerBatch", 3)
        .load()
    )
    batches: list[list[tuple]] = []

    def on_batch(df, epoch_id):
        rows = [(r["key"], r["value"]) for r in df.collect()]
        if rows:
            batches.append(rows)
        seen.append(len(rows))

    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    total = [r for b in batches for r in b]
    assert sorted(total) == _expected(CANONICAL_EVENTS)
    assert all(n <= 3 for n in seen)
    assert len(batches) >= 3  # 8 records / cap 3 → at least 3 batches
    # record order within the replay is preserved (CDC needs it)
    flat_vals = [json.loads(v)["source"]["pos"] for _, v in total]
    canon = [json.loads(e["value"])["source"]["pos"] for e in CANONICAL_EVENTS]
    assert flat_vals == canon


def test_stream_restart_continues_from_checkpoint(spark, tmp_path):
    src = str(tmp_path / "chg")
    write_stream_files(src, CANONICAL_EVENTS[:4], files=1)
    register_changelog(spark)
    ckpt = str(tmp_path / "ckpt")
    got: list[tuple] = []

    def run_once():
        stream = (
            spark.readStream.format("changelog").option("path", src).load()
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, eid: got.extend(
                    (r["key"], r["value"]) for r in df.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    assert sorted(got) == _expected(CANONICAL_EVENTS[:4])
    # new segment appears while stopped; restart must pick up ONLY it
    with open(pathlib.Path(src) / "batch-9999.json", "w") as f:
        for e in CANONICAL_EVENTS[4:]:
            f.write(json.dumps(e) + "\n")
    run_once()
    assert sorted(got) == _expected(CANONICAL_EVENTS)


def test_pipeline_swaps_changelog_source(spark, tmp_path):
    """Pipeline with source_format=changelog lands the same golden state
    as the default file-source path."""
    spec = PipelineSpec(
        name="pds",
        source_dir=str(tmp_path / "stream"),
        tables=[TableSpec("person", ["firstName"], PERSON_SCHEMA)],
        sink_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        options={"source_format": "changelog", "max_records_per_batch": 3},
    )
    write_stream_files(spec.source_dir, CANONICAL_EVENTS, files=2)
    pipe = Pipeline(spark, spec)
    pipe.process_available()
    pipe.stop()
    snap = pipe.read_table("person")
    state = {
        r["firstName"]: (r["firstName"], r["lastName"], r["age"])
        for r in snap.collect()
    }
    assert state == GOLDEN_STATE
    # ADVICE r9: the pipeline keys the commit sidecar by its spec name
    # by default, so two pipelines over one source dir never share (or
    # fresh-start-delete) each other's committed-offset base
    assert (pathlib.Path(spec.source_dir) / "_changelog_committed-pds").exists()


def test_late_out_of_order_update_respected_across_batches(spark, tmp_path):
    """With cap=1 every envelope is its own micro-batch: the out-of-order
    pos=4 update arrives in a LATER batch than pos=5 and must still lose
    (sequence-number merge, not arrival order)."""
    events = [
        envelope("c", 1, after=person("zed", "alpha", 20)),
        envelope("u", 3, before=person("zed", "alpha", 20), after=person("zed", "gamma", 22)),
        envelope("u", 2, before=person("zed", "alpha", 20), after=person("zed", "beta", 21)),
    ]
    spec = PipelineSpec(
        name="pds2",
        source_dir=str(tmp_path / "stream"),
        tables=[TableSpec("person", ["firstName"], PERSON_SCHEMA)],
        sink_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        options={"source_format": "changelog", "max_records_per_batch": 1},
    )
    write_stream_files(spec.source_dir, events, files=1)
    pipe = Pipeline(spark, spec)
    pipe.process_available()
    pipe.stop()
    snap = pipe.read_table("person")
    rows = {r["firstName"]: r["lastName"] for r in snap.collect()}
    assert rows == {"zed": "gamma"}


def test_batch_write_read_roundtrip(spark, tmp_path):
    register_changelog(spark)
    dst = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(e["key"], e["value"]) for e in CANONICAL_EVENTS],
        "key string, value string",
    )
    df.write.format("changelog").option("path", dst).mode("append").save()
    back = spark.read.format("changelog").option("path", dst).load()
    assert _records(back) == _expected(CANONICAL_EVENTS)
    # no temp litter
    assert not [n for n in __import__("os").listdir(dst) if n.startswith(".")]


def test_stream_write_roundtrip_and_idempotent_names(spark, tmp_path):
    """changelog → changelog streaming copy: output dir re-reads equal to
    the input, and segment names are pure functions of the batch id."""
    import os

    register_changelog(spark)
    src = str(tmp_path / "in")
    dst = str(tmp_path / "out")
    write_stream_files(src, CANONICAL_EVENTS, files=1)
    stream = (
        spark.readStream.format("changelog")
        .option("path", src)
        .option("maxRecordsPerBatch", 3)
        .load()
    )
    q = (
        stream.writeStream.format("changelog")
        .option("path", dst)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    back = spark.read.format("changelog").option("path", dst).load()
    assert _records(back) == _expected(CANONICAL_EVENTS)
    names = sorted(os.listdir(dst))
    assert all(n.startswith("b") and n.endswith(".json") for n in names)
    assert len(names) >= 3  # record cap forced multiple micro-batches
    # replay order preserved end-to-end (filename order == offset order)
    got = [
        json.loads(json.loads(line)["value"])["source"]["pos"]
        for n in names  # already filename-sorted == batch order
        for line in open(os.path.join(dst, n))
    ]
    canon = [json.loads(e["value"])["source"]["pos"] for e in CANONICAL_EVENTS]
    assert got == canon


def test_stream_writer_commit_is_replay_idempotent(tmp_path):
    """Unit: committing the same batchId twice lands on the same segment
    names — a crashed-then-replayed micro-batch overwrites, not appends."""
    from pyspark.sql import Row

    from one_stop_cdc_ingestion_toolkit_spark.sources.changelog_ds import (
        ChangelogStreamWriter,
    )
    import os

    dst = str(tmp_path / "sink")
    w = ChangelogStreamWriter({"path": dst})
    for _ in range(2):  # original attempt + replay
        msg = w.write(iter([Row(key="k1", value="v1"), Row(key="k2", value="v2")]))
        w.commit([msg], batchId=7)
    names = os.listdir(dst)
    assert names == ["b0000000007-0000.json"]
    assert len(open(os.path.join(dst, names[0])).readlines()) == 2


def test_batch_loads_sort_after_existing_segments(spark, tmp_path):
    """Advisory r3: a second batch load must never sort lexicographically
    BEFORE an earlier one — the stream reader's offset mapping is
    filename order, so segment names must be append-monotonic."""
    import os

    register_changelog(spark)
    path = str(tmp_path / "cl")
    df1 = spark.createDataFrame([("k1", "v1")], "key string, value string")
    df2 = spark.createDataFrame([("k2", "v2")], "key string, value string")
    df1.coalesce(1).write.format("changelog").mode("append").save(path)
    first = sorted(
        n for n in os.listdir(path) if not n.startswith((".", "_"))
    )
    df2.coalesce(1).write.format("changelog").mode("append").save(path)
    all_names = sorted(
        n for n in os.listdir(path) if not n.startswith((".", "_"))
    )
    new = [n for n in all_names if n not in first]
    assert new, "second load must add a segment"
    assert all(n > max(first) for n in new), (first, new)
    # replay order: first load's record precedes the second's
    back = spark.read.format("changelog").load(path).collect()
    assert [r["key"] for r in back] == ["k1", "k2"]


def test_stream_reader_cap_base_survives_restart(tmp_path):
    """After a clean stop (all batches committed), a fresh reader's cap
    base must start at the committed offset — a base of 0 made
    latestOffset REGRESS below the checkpoint and replay consumed
    records (review r7)."""
    from one_stop_cdc_ingestion_toolkit_spark.sources.changelog_ds import (
        ChangelogStreamReader,
    )

    d = tmp_path / "log"
    d.mkdir()
    for i in range(3):
        (d / f"seg{i}.json").write_text(
            "".join(json.dumps({"key": str(j), "value": "x"}) + "\n"
                    for j in range(10))
        )
    opts = {"path": str(d), "maxRecordsPerBatch": "10"}
    r1 = ChangelogStreamReader(opts)
    assert r1.latestOffset() == {"total": 10}
    r1.commit({"total": 10})
    # restart: fresh reader, same directory — the first trigger plans
    # from the committed base (10), not from 0, and the cap still
    # limits the step to committed + 10
    r2 = ChangelogStreamReader(opts)
    assert r2.latestOffset() == {"total": 20}


def test_fresh_start_resets_stale_sidecar_cap_base(tmp_path):
    """ADVICE r8: after the checkpoint is deleted to reprocess (standard
    workflow), the stale commit sidecar must NOT become the cap base —
    Spark calls initialOffset() only on a checkpoint-less start, and
    that resets the base to 0 so maxRecordsPerBatch holds."""
    from one_stop_cdc_ingestion_toolkit_spark.sources.changelog_ds import (
        ChangelogStreamReader,
    )

    d = tmp_path / "log"
    d.mkdir()
    (d / "seg0.json").write_text(
        "".join(json.dumps({"key": str(j), "value": "x"}) + "\n" for j in range(30))
    )
    opts = {"path": str(d), "maxRecordsPerBatch": "10"}
    r1 = ChangelogStreamReader(opts)
    r1.latestOffset()
    r1.latestOffset()
    r1.commit({"total": 20})  # stale sidecar says 20
    # reprocess: fresh reader AND no checkpoint → Spark asks initialOffset
    r2 = ChangelogStreamReader(opts)
    assert r2.initialOffset() == {"total": 0}
    assert r2.latestOffset() == {"total": 10}  # capped from 0, not 20+cap
    # review r8: the reset must reach DISK too — crash after the first
    # offset is WAL'd but before the first commit(), and the NEXT fresh
    # reader (which skips initialOffset: the WAL has an offset) must not
    # re-seed its cap base from the stale pre-reprocess sidecar
    r3 = ChangelogStreamReader(opts)
    assert r3.latestOffset() == {"total": 10}


def test_stream_id_keys_sidecar_per_stream(tmp_path):
    """ADVICE r8: two queries sharing one source dir clobbered each
    other's sidecar — the streamId option keys it per stream."""
    from one_stop_cdc_ingestion_toolkit_spark.sources.changelog_ds import (
        ChangelogStreamReader,
    )

    d = tmp_path / "log"
    d.mkdir()
    (d / "seg0.json").write_text(
        "".join(json.dumps({"key": str(j), "value": "x"}) + "\n" for j in range(30))
    )
    a = ChangelogStreamReader({"path": str(d), "maxRecordsPerBatch": "10",
                               "streamid": "qa"})
    b = ChangelogStreamReader({"path": str(d), "maxRecordsPerBatch": "5",
                               "streamid": "qb"})
    a.latestOffset(); a.latestOffset(); a.commit({"total": 20})
    b.latestOffset(); b.commit({"total": 5})
    # clean-stop restart (checkpoint intact → no initialOffset call):
    # each stream resumes from ITS OWN committed base
    a2 = ChangelogStreamReader({"path": str(d), "maxRecordsPerBatch": "10",
                                "streamid": "qa"})
    b2 = ChangelogStreamReader({"path": str(d), "maxRecordsPerBatch": "5",
                                "streamid": "qb"})
    assert a2.latestOffset() == {"total": 30}
    assert b2.latestOffset() == {"total": 10}


def test_keyed_restart_adopts_legacy_unkeyed_sidecar(tmp_path):
    """Review r9: a pipeline that committed offsets under the PRE-streamId
    shared sidecar and restarts keyed (checkpoint intact → initialOffset
    never called) must seed its cap base from the legacy file — a base
    of 0 would let latestOffset regress below the checkpointed offset
    and replay consumed records. After the first keyed commit, the keyed
    sidecar takes precedence."""
    import json as _json

    from one_stop_cdc_ingestion_toolkit_spark.sources.changelog_ds import (
        ChangelogStreamReader,
    )

    d = tmp_path / "log"
    d.mkdir()
    (d / "seg0.json").write_text(
        "".join(_json.dumps({"key": str(j), "value": "x"}) + "\n" for j in range(30))
    )
    # pre-upgrade incarnation: unkeyed, committed 20
    old = ChangelogStreamReader({"path": str(d), "maxRecordsPerBatch": "10"})
    old.latestOffset(); old.latestOffset()
    old.commit({"total": 20})
    del old
    # post-upgrade keyed restart (checkpoint intact, no initialOffset)
    r = ChangelogStreamReader(
        {"path": str(d), "maxRecordsPerBatch": "10", "streamid": "pds"}
    )
    assert r.latestOffset() == {"total": 30}  # 20 + cap, NOT 0 + cap
    r.commit({"total": 30})
    assert (d / "_changelog_committed-pds").exists()
    # keyed file now wins even if the legacy one goes stale
    (d / "_changelog_committed").write_text('{"total": 5}')
    r2 = ChangelogStreamReader(
        {"path": str(d), "maxRecordsPerBatch": "10", "streamid": "pds"}
    )
    assert r2.latestOffset() == {"total": 30}  # capped from 30, not 5
    # a genuinely FRESH keyed stream is unaffected: initialOffset re-zeros
    r3 = ChangelogStreamReader(
        {"path": str(d), "maxRecordsPerBatch": "10", "streamid": "new"}
    )
    assert r3.initialOffset() == {"total": 0}
    assert r3.latestOffset() == {"total": 10}


def test_keyed_fresh_start_crash_does_not_adopt_legacy(tmp_path):
    """ADVICE r10: a FRESH keyed start that crashes after its first
    WAL'd offset but before its first commit() must not fall through
    to the shared legacy sidecar on restart — initialOffset now writes
    {"total": 0} to the keyed sidecar (not just unlink), so keyed state
    exists from first touch. Also: legacy adoption (the checkpoint-
    intact migration path) write-throughs the keyed sidecar so the
    fallback fires at most once."""
    import json as _json

    from one_stop_cdc_ingestion_toolkit_spark.sources.changelog_ds import (
        ChangelogStreamReader,
    )

    d = tmp_path / "log"
    d.mkdir()
    (d / "seg0.json").write_text(
        "".join(_json.dumps({"key": str(j), "value": "x"}) + "\n" for j in range(30))
    )
    # another (older, unkeyed) stream's committed offset sits in the dir
    (d / "_changelog_committed").write_text('{"total": 20}')
    # fresh keyed start: initialOffset fires, first offset is WAL'd by
    # Spark, then the process dies before commit()
    r = ChangelogStreamReader(
        {"path": str(d), "maxRecordsPerBatch": "10", "streamid": "qx"}
    )
    assert r.initialOffset() == {"total": 0}
    assert r.latestOffset() == {"total": 10}
    del r  # crash: no commit()
    # restart (checkpoint has the WAL'd offset → no initialOffset call):
    # the cap base must be the keyed 0, NOT the legacy stream's 20
    r2 = ChangelogStreamReader(
        {"path": str(d), "maxRecordsPerBatch": "10", "streamid": "qx"}
    )
    assert r2.latestOffset() == {"total": 10}  # 0 + cap, not 20 + cap
    # migration write-through: a DIFFERENT keyed stream with no keyed
    # sidecar adopts the legacy value AND persists it keyed immediately,
    # so later legacy drift can't re-infect it
    r3 = ChangelogStreamReader(
        {"path": str(d), "maxRecordsPerBatch": "10", "streamid": "qy"}
    )
    assert (d / "_changelog_committed-qy").exists()
    (d / "_changelog_committed").write_text('{"total": 999}')
    r4 = ChangelogStreamReader(
        {"path": str(d), "maxRecordsPerBatch": "10", "streamid": "qy"}
    )
    assert r4.latestOffset() == {"total": 30}  # 20 + cap, not 999-capped
    del r3


def test_second_unkeyed_reader_warns_keyed_does_not(tmp_path):
    """ADVICE r9: unkeyed readers share one per-directory commit sidecar,
    and a fresh start deletes it — constructing a second unkeyed reader
    while the first is still alive must WARN (best-effort, in-process);
    keyed readers and post-GC sequential restarts stay silent."""
    import warnings as _w

    from one_stop_cdc_ingestion_toolkit_spark.sources.changelog_ds import (
        ChangelogStreamReader,
    )

    d = tmp_path / "log"
    d.mkdir()
    (d / "seg0.json").write_text('{"key": "1", "value": "x"}\n')
    opts = {"path": str(d)}
    r1 = ChangelogStreamReader(opts)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        r2 = ChangelogStreamReader(opts)  # r1 still alive → warn
    assert any("unkeyed" in str(w.message) for w in rec)
    del r1, r2  # collected → registry entry (weak) vanishes
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        ChangelogStreamReader(opts)  # sequential restart: silent
    assert not rec
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        ChangelogStreamReader({**opts, "streamid": "qa"})
        ChangelogStreamReader({**opts, "streamid": "qb"})  # keyed: exempt
    assert not rec


def test_stream_writer_refuses_reordering_commit(tmp_path):
    """A batch-load segment sorting after the stream's names would
    silently shift every reader's offset mapping — the stream writer
    must refuse the commit loudly (review r7)."""
    from one_stop_cdc_ingestion_toolkit_spark.sources.changelog_ds import (
        ChangelogStreamWriter,
        _Written,
    )

    d = tmp_path / "log"
    d.mkdir()
    (d / "load2-000000000001-abcd-0000.json").write_text(
        json.dumps({"key": "k", "value": "v"}) + "\n"
    )
    tmp = d / ".tmp-x"
    tmp.write_text(json.dumps({"key": "k2", "value": "v2"}) + "\n")
    w = ChangelogStreamWriter({"path": str(d)})
    with pytest.raises(ValueError, match="reorder"):
        w.commit([_Written(str(tmp), 1)], 0)
