"""Materialized-table store: versioned parquet snapshots with atomic swap.

The engine's analogue of the reference's tables-as-topics → lake tables
(Hudi hint, `/root/reference/README.md:22-32`), without Delta: each apply
writes a NEW snapshot generation directory and flips a pointer file, so

- readers never see a half-written snapshot (write staging → fsync →
  pointer flip),
- re-running a batch after a crash is safe (the pointer still names the
  last complete generation — idempotent with the merge's idempotency),
- old generations are pruned after the flip.

At 100 TB the same layout holds per partition: generation dirs under each
``(db, table, date)`` partition and a pointer per table, with only
batch-affected partitions rewritten (``cdc.affected_partitions``).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession


def _parseable_lines(path: Path) -> list:
    """Complete JSON records of an append-only jsonl file. A crash mid-
    append leaves at most ONE torn line (single writer, O_APPEND) — it is
    skipped: the record never became durable, exactly like a crash one
    instruction earlier (crash-fuzz r8)."""
    if not path.exists():
        return []
    out = []
    with path.open() as f:
        for line in f:
            try:
                out.append(json.loads(line))
            except ValueError:
                continue
    return out


def _complete_record_count(path: Path) -> int:
    """Number of complete records, parsing AT MOST the last line (the
    only one a single-writer append crash can tear — review r8: the
    per-append callers must stay O(lines), not O(lines) json parses)."""
    if not path.exists():
        return 0
    n, last = 0, None
    with path.open() as f:
        for line in f:
            if line.strip():
                n += 1
                last = line
    if last is not None:
        try:
            json.loads(last)
        except ValueError:
            n -= 1
    return n


def _truncate_torn_tail(path: Path) -> None:
    """When the file's existing content does not end in a newline (a torn
    append), REMOVE the fragment — equivalent to crashing one instruction
    earlier, since the torn record never became durable. Truncation (not
    sealing with a newline, ADVICE r9) keeps ``_complete_record_count``
    exact: a sealed fragment became a newline-terminated junk line that
    counted as a complete record once it was no longer last, so seq/epoch
    numbers silently skipped values after the first repair."""
    if not path.exists() or not path.stat().st_size:
        return
    with path.open("rb+") as f:
        f.seek(0, 2)
        size = f.tell()
        f.seek(-1, 2)
        if f.read(1) == b"\n":
            return
        # scan backwards in chunks for the last newline; everything
        # after it is the torn fragment
        pos, chunk = size, 4096
        while pos > 0:
            lo = max(0, pos - chunk)
            f.seek(lo)
            buf = f.read(pos - lo)
            nl = buf.rfind(b"\n")
            if nl != -1:
                f.truncate(lo + nl + 1)
                return
            pos = lo
        f.truncate(0)


def key_bucket(n_buckets: int, *cols) -> Column:
    """THE key→bucket hash: ``pmod(xxhash64(cols...), n)`` as int.

    Bucket pruning is only correct because every module — the pipeline's
    merge and pruned maintenance reads, the dedup/search indexes,
    tombstone GC — agrees on this exact function; a drifted copy would
    silently mis-prune buckets and drop rows from reads (review r7).
    Keep every call site on this single definition."""
    from pyspark.sql import functions as F

    return F.pmod(F.xxhash64(*cols), F.lit(n_buckets)).cast("int")


class TableStore:
    def __init__(self, root: str | Path, retain: int = 0):
        """``retain``: how many PRIOR pointer states keep their data on
        disk (time travel depth). 0 = prune immediately (default; the
        CDC state tables don't need history). Every pointer flip is
        recorded in ``_HISTORY`` regardless, so lineage is auditable
        even where the data itself is pruned."""
        self.root = Path(root)
        self.retain = retain
        self.root.mkdir(parents=True, exist_ok=True)

    def _table_dir(self, table: str) -> Path:
        return self.root / table

    def _pointer(self, table: str) -> Path:
        return self._table_dir(table) / "_CURRENT"

    def _history_file(self, table: str) -> Path:
        return self._table_dir(table) / "_HISTORY"

    def _log_state(self, table: str, kind: str, state) -> None:
        """Append one pointer state to the table's _HISTORY jsonl.

        Torn-tail safe (crash-fuzz r8): a kill mid-append can leave a
        PARTIAL last line with no trailing newline — the fragment is
        truncated away before counting (the torn record never became
        readable, so its seq is legitimately reused), keeping seq exactly
        the count of complete records with no gaps (ADVICE r9)."""
        hf = self._history_file(table)
        _truncate_torn_tail(hf)
        seq = _complete_record_count(hf)
        with hf.open("a") as f:
            f.write(json.dumps({"seq": seq, "kind": kind, "state": state}) + "\n")

    def history(self, table: str) -> list[dict]:
        """Pointer-flip history, oldest first: [{seq, kind, state, live}].
        ``live`` = the referenced data still exists (within ``retain``)."""
        hf = self._history_file(table)
        if not hf.exists():
            return []
        out = []
        tdir = self._table_dir(table)
        for rec in _parseable_lines(hf):
            gens = (
                [rec["state"]]
                if rec["kind"] == "snapshot"
                else sorted(set(rec["state"].values()))
            )
            rec["live"] = all((tdir / g).exists() for g in gens)
            out.append(rec)
        return out

    def read_as_of(
        self, spark: SparkSession, table: str, seq: int
    ) -> DataFrame | None:
        """Time-travel read: the table exactly as pointer state ``seq``
        (from :meth:`history`) saw it. Raises if that state's data has
        been pruned (older than ``retain``)."""
        recs = {r["seq"]: r for r in self.history(table)}
        if seq not in recs:
            return None
        rec = recs[seq]
        if not rec["live"]:
            raise ValueError(
                f"generation data for {table}@{seq} was pruned "
                f"(store retain={self.retain}); re-create the store with a "
                "larger retain to keep time-travel depth"
            )
        tdir = self._table_dir(table)
        if rec["kind"] == "snapshot":
            return spark.read.parquet(str(tdir / rec["state"]))
        # a bucketed state can be EMPTY (a batch deleted every remaining
        # row: write_buckets pops all map entries) — mirror read_buckets'
        # None contract instead of handing spark.read.parquet() zero paths
        # (which raises an unrelated schema-inference error, review r7)
        if not rec["state"]:
            return None
        paths = [
            str(tdir / gen / f"__bucket={b}")
            for b, gen in sorted((int(k), v) for k, v in rec["state"].items())
        ]
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    def _live_states(self, table: str) -> list:
        """The pointer states whose data must survive pruning: the last
        ``retain + 1`` history entries (current + retained history)."""
        recs = _parseable_lines(self._history_file(table))
        return [r["state"] for r in recs[-(self.retain + 1) :]]

    def _last_seq(self, table: str) -> int | None:
        """Seq of the most recent pointer flip, json-parsing at most the
        last TWO _HISTORY lines. ``history()`` would also stat() every
        generation of every record to compute liveness — a
        per-micro-batch caller (log_epoch) doing that accumulates
        O(batches²) filesystem work (review r7) — and parsing every line
        per call would be O(batches²) json parses (review r8). Torn-tail
        safe: only the final line can be torn (single writer, O_APPEND);
        if it fails to parse, fall back to the line before it."""
        hf = self._history_file(table)
        if not hf.exists():
            return None
        last, prev = None, None
        with hf.open() as f:
            for line in f:
                if line.strip():
                    prev, last = last, line
        for candidate in (last, prev):
            if candidate is None:
                continue
            try:
                return json.loads(candidate)["seq"]
            except ValueError:
                continue
        return None

    # -- cross-table consistent snapshots (epochs) ------------------------

    def _epoch_file(self) -> Path:
        return self.root / "_EPOCHS"

    def log_epoch(self, tables: list[str]) -> int:
        """Record a consistency point: the current pointer seq of every
        given table, as one epoch. A CDC pipeline calls this after a
        micro-batch has merged into ALL its tables, so an epoch is a
        cross-table-consistent view (no torn reads of a half-applied
        batch when reading via :meth:`read_epoch`)."""
        seqs = {}
        for t in tables:
            seq = self._last_seq(t)
            if seq is not None:
                seqs[t] = seq
        ef = self._epoch_file()
        _truncate_torn_tail(ef)
        epoch = _complete_record_count(ef)
        with ef.open("a") as f:
            f.write(json.dumps({"epoch": epoch, "tables": seqs}) + "\n")
        return epoch

    def epochs(self) -> list[dict]:
        return _parseable_lines(self._epoch_file())

    def read_epoch(
        self, spark: SparkSession, epoch: int
    ) -> dict[str, DataFrame] | None:
        """All tables of one epoch, each exactly as that epoch saw it —
        the cross-table time-travel read. Raises (via read_as_of) if the
        epoch is older than the store's ``retain`` depth."""
        recs = {e["epoch"]: e for e in self.epochs()}
        if epoch not in recs:
            return None
        return {
            t: self.read_as_of(spark, t, seq)
            for t, seq in sorted(recs[epoch]["tables"].items())
        }

    def current_path(self, table: str) -> Path | None:
        ptr = self._pointer(table)
        if not ptr.exists():
            return None
        gen = ptr.read_text().strip()
        path = self._table_dir(table) / gen
        return path if path.exists() else None

    def read(self, spark: SparkSession, table: str) -> DataFrame | None:
        path = self.current_path(table)
        return spark.read.parquet(str(path)) if path else None

    def write(self, df: DataFrame, table: str) -> Path:
        """Write a new snapshot generation and flip the pointer."""
        if (self._table_dir(table) / "_BUCKETS").exists():
            raise ValueError(
                f"{table} uses the bucketed layout; writing a whole snapshot "
                "would be shadowed by the _BUCKETS pointer — use "
                "write_buckets, or drop the table first"
            )
        tdir = self._table_dir(table)
        tdir.mkdir(parents=True, exist_ok=True)
        ptr = self._pointer(table)
        prev = ptr.read_text().strip() if ptr.exists() else None
        gen = f"gen-{(int(prev.split('-')[1]) + 1) if prev else 0:06d}"
        out = tdir / gen
        df.write.mode("overwrite").parquet(str(out))
        tmp = tdir / "_CURRENT.tmp"
        tmp.write_text(gen)
        tmp.replace(ptr)  # atomic on POSIX
        self._log_state(table, "snapshot", gen)
        keep = {s for s in self._live_states(table) if isinstance(s, str)}
        keep.add(gen)
        for p in tdir.glob("gen-*"):
            if p.name not in keep:
                shutil.rmtree(p, ignore_errors=True)
        return out

    def drop(self, table: str) -> None:
        shutil.rmtree(self._table_dir(table), ignore_errors=True)

    def drop_tables(self, pattern: str) -> list[str]:
        """Drop every table whose name matches the regex — the engine
        analogue of the reference's regex topic deletion
        (`/root/reference/bin/mskc-connector.sh:97-114`,
        `bin/kafka-client.sh:50-68`). Best-effort idempotent."""
        import re

        rx = re.compile(pattern)
        dropped = [t for t in self.list_tables() if rx.fullmatch(t)]
        for t in dropped:
            self.drop(t)
        return dropped

    def list_tables(self) -> list[str]:
        return sorted(
            p.name
            for p in self.root.iterdir()
            if p.is_dir() and ((p / "_CURRENT").exists() or (p / "_BUCKETS").exists())
        )


class BucketedTableStore(TableStore):
    """Key-bucketed snapshots: the 100 TB CDC state layout.

    State is hash-partitioned into ``n_buckets`` by key; each merge batch
    rewrites ONLY the buckets its changes touch (a micro-batch touching
    0.1% of keys rewrites ~0.1% of the table, not all of it). Layout:

        <table>/gen-K/__bucket=i/...parquet   (one write per batch,
                                               partitioned by bucket)
        <table>/_BUCKETS                      {bucket: generation} pointer

    The pointer maps every bucket to the generation holding its current
    state; a batch flips only the affected buckets' entries (atomic file
    replace), then prunes generations no bucket references. Readers union
    the per-bucket paths. Crash safety matches TableStore: a half-written
    generation is invisible until the pointer flips.
    """

    def _bucket_pointer(self, table: str) -> Path:
        return self._table_dir(table) / "_BUCKETS"

    def bucket_map(self, table: str) -> dict[int, str]:
        ptr = self._bucket_pointer(table)
        if not ptr.exists():
            return {}
        return {int(k): v for k, v in json.loads(ptr.read_text()).items()}

    def layout(self, table: str) -> str | None:
        """'bucketed' | 'snapshot' | None — which pointer kind governs."""
        if self._bucket_pointer(table).exists():
            return "bucketed"
        if self._pointer(table).exists():
            return "snapshot"
        return None

    def read_buckets(
        self, spark: SparkSession, table: str, buckets: list[int] | None = None
    ) -> DataFrame | None:
        bmap = self.bucket_map(table)
        if buckets is not None:
            bmap = {b: g for b, g in bmap.items() if b in buckets}
        if not bmap:
            return None
        tdir = self._table_dir(table)
        paths = [str(tdir / gen / f"__bucket={b}") for b, gen in sorted(bmap.items())]
        # mergeSchema: buckets can sit at different generations that span a
        # compatible schema evolution; taking the schema from one file
        # would silently drop evolved columns from the others.
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    def read(self, spark: SparkSession, table: str) -> DataFrame | None:
        """Dispatch on layout: bucketed pointer if present, else the
        whole-snapshot _CURRENT pointer (a store can hold both kinds)."""
        if self._bucket_pointer(table).exists():
            return self.read_buckets(spark, table)
        return super().read(spark, table)

    def retire_snapshot(self, table: str) -> None:
        """Remove a whole-snapshot pointer + generation after migrating the
        table to the bucketed layout."""
        ptr = self._pointer(table)
        if ptr.exists():
            gen = ptr.read_text().strip()
            ptr.unlink()
            shutil.rmtree(self._table_dir(table) / gen, ignore_errors=True)

    def write_buckets(self, df: DataFrame, table: str, buckets: list[int]) -> Path:
        """Write a new generation holding ONLY the given buckets (df must
        carry a ``__bucket`` column) and flip their pointer entries."""
        tdir = self._table_dir(table)
        tdir.mkdir(parents=True, exist_ok=True)
        bmap = self.bucket_map(table)
        # number from ALL on-disk generations, not just bucket-referenced
        # ones — a snapshot-layout gen (during migration) must not be
        # reused as the write target while it is still the read source.
        gens = [int(p.name.split("-")[1]) for p in tdir.glob("gen-*")] or [-1]
        gen = f"gen-{max(gens) + 1:06d}"
        df.write.mode("overwrite").partitionBy("__bucket").parquet(str(tdir / gen))
        # a bucket whose rows all vanished in this batch (e.g. every index
        # entry deleted) produces no partition dir — it must leave the map,
        # not point at a path that doesn't exist.
        written = {
            int(p.name.split("=")[1]) for p in (tdir / gen).glob("__bucket=*")
        }
        for b in buckets:
            if b in written:
                bmap[b] = gen
            else:
                bmap.pop(b, None)
        state = {str(b): g for b, g in sorted(bmap.items())}
        tmp = tdir / "_BUCKETS.tmp"
        tmp.write_text(json.dumps(state))
        tmp.replace(self._bucket_pointer(table))
        self._log_state(table, "bucketed", state)
        # prune generations referenced by neither the current map nor the
        # retained history depth. Retained history can hold BOTH kinds of
        # state: a snapshot-layout generation (string) sits in the window
        # during a layout migration, and skipping it here deleted retained
        # time-travel depth on the first bucketed write (review r7).
        live = set(bmap.values())
        for s in self._live_states(table):
            if isinstance(s, dict):
                live |= set(s.values())
            else:
                live.add(s)
        for p in tdir.glob("gen-*"):
            if p.name not in live:
                shutil.rmtree(p, ignore_errors=True)
        return tdir / gen
