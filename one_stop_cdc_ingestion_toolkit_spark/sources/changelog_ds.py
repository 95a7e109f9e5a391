"""`changelog` — a custom Python DataSource (Spark 4 `pyspark.sql.datasource`
API) that replays a directory of envelope-JSON segment files as a batch
table OR an offset-tracked stream with RECORD-granular rate limiting.

Why it exists next to the built-in file source (`streaming/pipeline.py
Pipeline.start`): the JSON file source's only capacity knob is
``maxFilesPerTrigger`` — a whole segment is the smallest unit of work, so
one fat binlog segment becomes one fat micro-batch. This source tracks a
global RECORD offset (`{"total": n}` over the line-concatenation of all
segments in filename order) and honors ``maxRecordsPerBatch``, the
record-level capacity control the reference configures on its connector
(`/root/reference/bin/mskc-connector.sh:292-297` provisioned-capacity
rationale; A14 in SURVEY §2.1).

Contract (binlog-segment semantics): segment files are APPEND-ONCE —
once a segment has been listed it never grows; new data arrives as new
files sorted lexicographically after existing ones (exactly how the
tests' ``write_stream_files`` and MySQL binlog rotation behave). Line
counts of already-seen segments are therefore cached driver-side; only
unseen files are scanned by ``latestOffset`` — O(new data), not O(dir).

Scale posture: this is a control-plane-scale source (CDC replay,
fixture/golden streams, backfill rehearsal). Executor-side parsing is
one ``json.loads`` per line — fine at changelog volumes; the 100 TB data
plane stays on the JVM Kafka/file sources that share the same downstream
decode (`sources/debezium.py decode_json`). Rows are emitted
(key, value) exactly like `streaming/pipeline.py RAW_SCHEMA`, so
`Pipeline` can swap this source in without touching the decode path.

The WRITE side (`ChangelogBatchWriter` / `ChangelogStreamWriter`) makes
the format a round-trippable sink: executor tasks write dotfile temps
(invisible to the reader's listing), and the driver-side commit flips
them visible via rename — atomic per batch, and for the streaming sink
IDEMPOTENT under batch replay because segment names are a pure function
of (batchId, task). Commit-time renames assume the directory is shared
storage (local FS, NFS, or a fuse-mounted object store) — the same
assumption the checkpoint directory already makes.
"""

from __future__ import annotations

import json
import os
import weakref
from collections.abc import Iterator, Sequence

import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

FORMAT_NAME = "changelog"

#: live UNKEYED stream readers by directory (weak: a stopped query's
#: reader just gets collected). Unkeyed readers share one per-directory
#: commit sidecar, and initialOffset() deletes it on fresh start — a
#: second concurrent unkeyed reader would therefore clobber the first
#: one's committed-offset base (ADVICE r9). Construction WARNS while a
#: previous unkeyed reader for the directory is still alive (best
#: effort: Spark may hold the prior query's reader briefly after stop,
#: and concurrent queries may plan in separate worker processes — the
#: durable fix is a streamId, which Pipeline now derives from its spec
#: name). Keyed readers (streamId set) have per-stream sidecars and
#: are exempt.
_UNKEYED_READERS: weakref.WeakValueDictionary = weakref.WeakValueDictionary()

#: schema is fixed: the Kafka-record shape Pipeline's decode expects.
SCHEMA_DDL = "key string, value string"


def _segments(path: str) -> list[str]:
    """Segment files in replay order (filename-sorted, like binlog names)."""
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    return sorted(
        os.path.join(path, n)
        for n in names
        if not n.startswith((".", "_")) and os.path.isfile(os.path.join(path, n))
    )


def _count_lines(file: str) -> int:
    n = 0
    with open(file, "rb") as f:
        for _ in f:
            n += 1
    return n


class _Slice(InputPartition):
    """One segment's [start_line, end_line) slice of work."""

    def __init__(self, file: str, start_line: int, end_line: int):
        self.file = file
        self.start_line = start_line
        self.end_line = end_line


def _read_slice(part: _Slice) -> Iterator[tuple]:
    with open(part.file, encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i < part.start_line:
                continue
            if i >= part.end_line:
                break
            if not line.strip():
                continue
            rec = json.loads(line)
            yield (rec.get("key"), rec.get("value"))


class ChangelogBatchReader(DataSourceReader):
    """Whole-directory batch scan: one partition per segment file, so a
    multi-segment changelog parallelizes across executors."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("changelog source requires a path")

    def partitions(self) -> Sequence[InputPartition]:
        # to-EOF sentinel: _read_slice's `i >= end_line` bound never
        # fires, so the executors just read each file to its end — the
        # driver does NOT stream every byte at planning time to count
        # lines (that made planning latency scale with data size,
        # review r7). Only the stream reader needs exact counts.
        import sys

        return [
            _Slice(f, 0, sys.maxsize) for f in _segments(self.path)
        ] or [_Slice("", 0, 0)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        if not partition.file:
            return iter(())
        return _read_slice(partition)


class ChangelogStreamReader(DataSourceStreamReader):
    """Record-offset stream over the segment directory.

    Offset = ``{"total": n}``: n records consumed from the global
    filename-ordered line concatenation. ``maxRecordsPerBatch`` caps how
    far ``latestOffset`` advances past the last planned end — Spark then
    plans the micro-batch [committed, capped-latest). On restart the
    first replayed batch passes its checkpointed ``end`` through
    ``partitions``, which re-syncs the cap base (``_planned``) before
    the next ``latestOffset`` call, so the cap never plans a batch that
    ends before its start.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("changelog source requires a path")
        cap = options.get("maxrecordsperbatch") or options.get(
            "maxRecordsPerBatch"
        )
        self.cap = int(cap) if cap else None
        #: distinguishes sidecars when several streams read one directory
        #: (ADVICE r8: a shared sidecar let one stream's committed offset
        #: become another's cap base). Pass a stable id per query.
        self.stream_id = options.get("streamid") or options.get("streamId")
        if not self.stream_id:
            key = os.path.abspath(self.path)
            if _UNKEYED_READERS.get(key) is not None:
                import warnings

                warnings.warn(
                    f"changelog: a second unkeyed stream reader for "
                    f"{key!r} while another may still be running — "
                    f"unkeyed readers share one commit sidecar, and a "
                    f"fresh start (initialOffset) deletes it, resetting "
                    f"the other stream's cap base; pass a distinct "
                    f"streamId per query (ADVICE r9)",
                    stacklevel=2,
                )
            _UNKEYED_READERS[key] = self
        #: append-once contract: cache (file -> line count) forever.
        self._sizes: dict[str, int] = {}
        #: high-water mark of any batch end this reader has planned.
        #: Seeded from the commit sidecar: after a CLEAN stop (every
        #: batch committed, so no replay re-syncs it via partitions()),
        #: a fresh reader starting at 0 would make latestOffset REGRESS
        #: below the checkpointed offset and replay consumed records
        #: (review r7). One stream per (directory, streamId), like the
        #: checkpoint. initialOffset() resets this seed — see below.
        self._planned = self._read_committed()

    def _commit_file(self) -> str:
        # underscore prefix: invisible to _segments' listing
        suffix = f"-{self.stream_id}" if self.stream_id else ""
        return os.path.join(self.path, f"_changelog_committed{suffix}")

    def _read_committed(self) -> int:
        try:
            with open(self._commit_file(), encoding="utf-8") as f:
                return int(json.load(f)["total"])
        except (OSError, ValueError, KeyError):
            pass
        if self.stream_id:
            # migration (review r9): a pre-streamId incarnation committed
            # under the shared unkeyed sidecar. A KEYED restart WITH an
            # existing checkpoint never calls initialOffset, so without
            # this fallback the cap base would reset to 0 and latestOffset
            # could regress below the checkpointed offset. The adopted
            # value is persisted to the KEYED sidecar immediately (ADVICE
            # r9): an in-memory-only adoption left every future keyed
            # stream in the directory inheriting the stale shared file —
            # including a fresh keyed start that crashed after its first
            # WAL'd offset but before its first commit(), whose
            # initialOffset unlink removed only the keyed sidecar. With
            # the write-through, the fallback fires at most once per
            # stream_id, and initialOffset's {"total": 0} write (below)
            # guarantees a keyed sidecar exists after first touch.
            try:
                legacy = os.path.join(self.path, "_changelog_committed")
                with open(legacy, encoding="utf-8") as f:
                    adopted = int(json.load(f)["total"])
                self._write_committed(adopted)
                return adopted
            except (OSError, ValueError, KeyError):
                pass
        return 0

    def _write_committed(self, total: int) -> None:
        """Atomic-replace the (keyed) commit sidecar. Advisory state:
        on OSError the worst case is the old cap-base regression risk."""
        tmp = self._commit_file() + ".tmp"
        try:
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump({"total": int(total)}, f)
            os.replace(tmp, self._commit_file())
        except OSError:
            pass

    def _refresh(self) -> list[tuple[str, int]]:
        """(file, lines) in replay order; scans only unseen files."""
        out = []
        for f in _segments(self.path):
            if f not in self._sizes:
                self._sizes[f] = _count_lines(f)
            out.append((f, self._sizes[f]))
        return out

    def initialOffset(self) -> dict:
        # Spark asks for the initial offset ONLY when the checkpoint holds
        # no offset — a genuinely fresh start (including the standard
        # delete-checkpoint-to-reprocess workflow). The stream begins at
        # 0, so the cap base must too: a stale sidecar from a previous
        # incarnation would otherwise make the first micro-batch plan
        # [0, committed+cap], silently bypassing maxRecordsPerBatch
        # (ADVICE r8). The ON-DISK sidecar is OVERWRITTEN with 0 rather
        # than unlinked (ADVICE r9): an unlink removes only the keyed
        # sidecar, so a keyed reader that crashed after its first WAL'd
        # offset but before its first commit() would fall through
        # _read_committed's legacy-migration path and seed from the
        # shared unkeyed file — possibly another stream's offset.
        # Writing {"total": 0} guarantees keyed state exists from first
        # touch, so the fallback can never fire after a fresh start.
        self._planned = 0
        self._write_committed(0)
        return {"total": 0}

    def latestOffset(self) -> dict:
        avail = sum(n for _, n in self._refresh())
        if self.cap is not None:
            avail = min(avail, self._planned + self.cap)
        self._planned = max(self._planned, avail)
        return {"total": avail}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["total"], end["total"]
        self._planned = max(self._planned, hi)
        parts: list[InputPartition] = []
        base = 0
        for f, n in self._refresh():
            file_lo = max(lo - base, 0)
            file_hi = min(hi - base, n)
            if file_hi > file_lo:
                parts.append(_Slice(f, file_lo, file_hi))
            base += n
            if base >= hi:
                break
        # Spark requires >=1 partition even for an empty planned range.
        return parts or [_Slice("", 0, 0)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        if not partition.file:
            return iter(())
        return _read_slice(partition)

    def commit(self, end: dict) -> None:
        """Persist the committed offset (atomic replace) so a restarted
        reader's cap base starts at the stream's true position instead
        of 0 — see __init__."""
        self._write_committed(end["total"])


class _Written(WriterCommitMessage):
    """One task's uncommitted temp file (invisible to readers: dotfile)."""

    def __init__(self, tmp: str, rows: int):
        self.tmp = tmp
        self.rows = rows


def _write_task(path: str, it) -> _Written:
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".tmp-{uuid.uuid4().hex}")
    n = 0
    with open(tmp, "w", encoding="utf-8") as f:
        for row in it:
            f.write(json.dumps({"key": row["key"], "value": row["value"]}) + "\n")
            n += 1
    return _Written(tmp, n)


def _abort_task(messages) -> None:
    for m in messages:
        if m is not None and os.path.exists(m.tmp):
            os.remove(m.tmp)


def _next_seq(existing: list[str]) -> int:
    """Next monotonic batch-load sequence for a segment dir. ``load2-``
    sorts after both the stream writer's ``b…`` names and the legacy
    ``load-{hex}`` names, so seq 1 is safe for any pre-existing layout;
    thereafter the zero-padded counter keeps loads in commit order."""
    seqs = [
        int(n.split("-")[1])
        for n in existing
        if n.startswith("load2-") and n.split("-")[1].isdigit()
    ]
    return max(seqs, default=0) + 1


class ChangelogBatchWriter(DataSourceWriter):
    """Batch append: tasks write dotfile temps; driver-side commit renames
    them into visible segments in one pass. Readers never observe a
    partial write (the `_segments` listing skips dotfiles)."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("changelog sink requires a path")

    def write(self, iterator) -> WriterCommitMessage:
        return _write_task(self.path, iterator)

    def commit(self, messages) -> None:
        # the run prefix must sort AFTER every existing segment — the
        # stream reader's offset mapping assumes append-only filename
        # order, so a random prefix could silently reorder history
        # (advisory r3). Derive it from the current maximum: existing
        # names are compared as strings, so zero-padded "load2-<max+1>"
        # style prefixes keep the total order monotonic per directory.
        existing = [os.path.basename(p) for p in _segments(self.path)]
        # seq gives monotonic order vs existing segments; the uuid tail
        # keeps CONCURRENT loads (which race the listing and compute the
        # same seq) from clobbering each other's os.replace targets —
        # their relative order is arbitrary, but both survive.
        run = f"load2-{_next_seq(existing):012d}-{uuid.uuid4().hex[:8]}"
        for i, m in enumerate(messages):
            if m is None or m.rows == 0:
                _abort_task([m])
                continue
            os.replace(
                m.tmp, os.path.join(self.path, f"{run}-{i:04d}.json")
            )

    def abort(self, messages) -> None:
        _abort_task(messages)


class ChangelogStreamWriter(DataSourceStreamWriter):
    """Streaming sink with IDEMPOTENT per-batch commits: the visible
    segment name is a pure function of (batchId, task index) — a batch
    replayed after a crash-between-commit-and-checkpoint re-renames onto
    the SAME names instead of appending duplicates. Same discipline as
    `streaming/table_store.py`'s atomic generation pointer: visibility
    is a metadata flip (here: rename), never an in-place data mutation.
    Segment names embed the zero-padded batch id, so replay order ==
    filename order == the changelog source's offset order."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("changelog sink requires a path")

    def write(self, iterator) -> WriterCommitMessage:
        return _write_task(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        # Append-only guard (review r7): a reader's offset mapping is
        # the filename-sorted line concatenation, so a new segment must
        # sort AFTER every existing one. Stream names ('b…') sort before
        # batch-load names ('load2-…'/'load-…') — if a batch load landed
        # in this directory after the stream started, committing would
        # silently reorder history under any reader (records re-emitted
        # and an equal number skipped). Fail loudly instead; segments
        # from THIS stream (own 'b…' pattern) are exempt — replayed
        # batches legitimately sort before later committed ones.
        import re

        first = f"b{batchId:010d}-0000.json"
        own = re.compile(r"^b\d{10}-\d{4}\.json$")
        foreign = [
            n
            for n in (os.path.basename(p) for p in _segments(self.path))
            if n > first and not own.match(n)
        ]
        if foreign:
            raise ValueError(
                f"changelog dir {self.path!r} holds non-stream segments "
                f"that sort after this batch's name ({foreign[:3]}…): "
                "appending would reorder the reader's offset mapping — "
                "stream into a fresh directory, or batch-load into a "
                "different one"
            )
        for i, m in enumerate(messages):
            if m is None or m.rows == 0:
                _abort_task([m])
                continue
            os.replace(
                m.tmp,
                os.path.join(self.path, f"b{batchId:010d}-{i:04d}.json"),
            )

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        _abort_task(messages)


class ChangelogDataSource(DataSource):
    """`spark.read.format("changelog").option("path", dir)` — see module
    docstring. Register once per session via :func:`register_changelog`."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> DataSourceReader:
        return ChangelogBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return ChangelogStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        if overwrite:
            raise ValueError("changelog sink is append-only")
        return ChangelogBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return ChangelogStreamWriter(self.options)


def register_changelog(spark) -> None:
    """Idempotently register the format on a session (re-registration
    overwrites, which is a no-op for an identical class)."""
    spark.dataSource.register(ChangelogDataSource)
