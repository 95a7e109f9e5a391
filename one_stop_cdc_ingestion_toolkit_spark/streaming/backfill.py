"""Chunked initial-snapshot backfill that interleaves with a live CDC
stream — the DBLog / Debezium incremental-snapshot algorithm
(`signal`-triggered `incremental` snapshots in Debezium 2.x, the
reference's connector plugin family — /root/reference/bin/constants.sh:11),
re-expressed for sequence-carrying merge state.

Why chunks: a monolithic initial snapshot of a 100 TB table would have
to be merged as ONE batch (one giant shuffle, peak state x2), and the
stream would sit blocked behind it. DBLog instead walks the table in
primary-key chunks, interleaving each chunk with the live change stream.

Why this engine needs NO watermark dance: DBLog's low/high-watermark
window exists to decide, for a chunk row read concurrently with ongoing
changes, whether the change log already covers it — the source rows
carry no log sequence. Here every merge row DOES carry one
(``__pos``/``__ts_ms``), and :func:`operators.cdc.apply_changes` is a
pure max-by-sequence per key. Emitting every chunk row as an ``op='r'``
envelope at the snapshot's log position makes the merge itself the
arbiter: a chunk row wins over nothing (key unseen) and loses to ANY
event the stream applied with a higher position — including deletes,
whose tombstones outrank the snapshot row instead of being resurrected.
Chunk application therefore commutes with stream batches and with
itself (idempotent re-apply), which is what makes crash-resume trivial.

Scale shape: chunk boundaries come from a sort of the KEY COLUMN only
(range exchange over key-sized rows, never row data); each chunk is one
ordinary micro-batch through ``Pipeline.apply_batch`` — same bucketed
rewrite, DLQ, index-maintenance path as live traffic. Progress is a
tiny JSON file next to the table (chunk-id high-water mark), so a
killed backfill resumes at the first unapplied chunk; replaying an
applied chunk is a no-op by idempotence.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


@dataclass(frozen=True)
class ChunkInfo:
    chunk_id: int
    lo: object  # inclusive first key of the chunk
    hi: object  # inclusive last key of the chunk
    n_rows: int


class SnapshotBackfill:
    """Backfill ``table`` of ``pipeline`` from a consistent source
    snapshot, one key-range chunk at a time.

    ``source_df`` must be a consistent read of the source table as of
    log position ``snapshot_pos`` (Debezium takes it under a
    repeatable-read transaction; a lakehouse export pins a version).
    Events already applied with pos > snapshot_pos keep winning — start
    the stream first, backfill whenever.

    ``chunk_col`` must be a single totally-ordered key column (DBLog
    chunks by primary key the same way).
    """

    def __init__(
        self,
        pipeline,
        table: str,
        source_df: DataFrame,
        chunk_col: str,
        chunk_size: int = 1024,
        snapshot_pos: int = 0,
        snapshot_ts_ms: int = 0,
    ):
        tspecs = [t for t in pipeline.spec.tables if t.name == table]
        if not tspecs:
            raise ValueError(f"table {table!r} not declared in pipeline")
        if chunk_col not in tspecs[0].row_schema.fieldNames():
            raise ValueError(f"chunk col {chunk_col!r} not in row schema")
        self.pipeline = pipeline
        self.table = table
        self.tspec = tspecs[0]
        self.source_df = source_df
        self.chunk_col = chunk_col
        self.chunk_size = chunk_size
        self.snapshot_pos = snapshot_pos
        self.snapshot_ts_ms = snapshot_ts_ms
        self._chunks: list[ChunkInfo] | None = None

    # -- progress log ------------------------------------------------------

    def _progress_file(self) -> Path:
        return Path(self.pipeline.spec.sink_dir) / f"_backfill_{self.table}.json"

    def _load_done(self) -> int:
        """Highest applied chunk_id + 1 (0 when none).

        Validates the stored plan shape against the CURRENT one: a
        resume with a different chunk_size (or source) would renumber
        the chunks, and blindly trusting next_chunk under the new
        numbering silently skips key ranges while status() reports
        complete (review r7)."""
        f = self._progress_file()
        if not f.exists():
            return 0
        try:
            doc = json.loads(f.read_text())
            if not isinstance(doc, dict):
                raise ValueError(f"not an object: {doc!r:.40}")
        except ValueError as exc:
            # _save_done writes atomically (tmp + fsync + replace), so a
            # torn file should not come from a crashed backfill — fail
            # loudly rather than silently restarting a possibly-huge
            # backfill from chunk 0 (review r8).
            raise ValueError(
                f"backfill progress file {f} is corrupt — delete it to "
                "restart from chunk 0 (chunk re-application is idempotent)"
            ) from exc
        stored_total = doc.get("total_chunks")
        stored_pos = doc.get("snapshot_pos")
        if stored_total is not None and stored_total != len(self.plan()):
            raise ValueError(
                f"backfill progress for {self.table!r} was written under a "
                f"different chunk plan ({stored_total} chunks, now "
                f"{len(self.plan())}) — resume with the original "
                "chunk_size/source, or delete the progress file to restart"
            )
        if stored_pos is not None and stored_pos != self.snapshot_pos:
            raise ValueError(
                f"backfill progress for {self.table!r} was written at "
                f"snapshot_pos={stored_pos}, now {self.snapshot_pos} — "
                "a changed arbiter position would merge chunks "
                "inconsistently; keep it fixed or restart"
            )
        return doc.get("next_chunk", 0)

    def _save_done(self, next_chunk: int, total: int) -> None:
        # atomic replace (review r8): a kill mid-write must never tear
        # the progress file — resume trusts it (same tmp+replace
        # discipline as the table store's pointers). fsync before the
        # rename: on a writeback filesystem the rename can be journaled
        # before the data blocks land, which would re-create the torn
        # file after a POWER loss, not just a process kill.
        import os

        f = self._progress_file()
        tmp = f.with_name(f.name + ".tmp")
        with tmp.open("w") as fh:
            fh.write(
                json.dumps(
                    {
                        "table": self.table,
                        "next_chunk": next_chunk,
                        "total_chunks": total,
                        "snapshot_pos": self.snapshot_pos,
                    }
                )
            )
            fh.flush()
            os.fsync(fh.fileno())
        tmp.replace(f)

    # -- planning ----------------------------------------------------------

    def plan(self) -> list[ChunkInfo]:
        """Compute deterministic key-range chunks.

        Only the KEY COLUMN is shuffled (one range exchange), and the
        global key rank is the distributed prefix sum — per-range local
        row_numbers plus a broadcast of per-partition count offsets (the
        d94_shard_packing formulation; a bare ``row_number() OVER
        (ORDER BY k)`` would drag every key into one partition). The
        chunk id is ``floor(rank / chunk_size)``, so chunks are
        equal-sized by construction regardless of key-value skew. The
        boundary collect is one row per chunk: bounded by table-rows /
        chunk_size, not by data volume."""
        if self._chunks is not None:
            return self._chunks
        keys = self.source_df.select(F.col(self.chunk_col).alias("k"))
        # NULL keys would be counted here but silently dropped by every
        # chunk's lo<=k<=hi range filter — never backfilled while
        # status() reads complete (review r7). The chunk column is the
        # primary key (DBLog semantics), so a NULL is a caller error.
        if keys.filter(F.col("k").isNull()).head() is not None:
            raise ValueError(
                f"chunk col {self.chunk_col!r} has NULL values — chunking "
                "requires a totally-ordered non-null key column"
            )
        nparts = max(1, self.source_df.rdd.getNumPartitions())
        ranged = keys.repartitionByRange(nparts, "k").withColumn(
            "__pid", F.spark_partition_id()
        )
        per = sorted(
            ranged.groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("c"), F.min("k").alias("lo"))
            .collect(),
            key=lambda r: (r["lo"] is None, r["lo"]),
        )
        offsets, acc = [], 0
        for row in per:
            offsets.append((row["__pid"], acc))
            acc += row["c"]
        off = F.broadcast(
            self.source_df.sparkSession.createDataFrame(
                offsets, "__pid int, __off long"
            )
        )
        local = F.row_number().over(W.partitionBy("__pid").orderBy("k")) - 1
        ranked = (
            ranged.join(off, "__pid")
            .withColumn(
                "cid",
                F.floor((F.col("__off") + local) / F.lit(self.chunk_size)).cast(
                    "long"
                ),
            )
        )
        rows = (
            ranked.groupBy("cid")
            .agg(
                F.min("k").alias("lo"),
                F.max("k").alias("hi"),
                F.count(F.lit(1)).alias("n"),
            )
            .orderBy("cid")
            .collect()
        )
        self._chunks = [
            ChunkInfo(int(r["cid"]), r["lo"], r["hi"], int(r["n"])) for r in rows
        ]
        return self._chunks

    # -- application -------------------------------------------------------

    def _chunk_envelopes(self, chunk: ChunkInfo) -> DataFrame:
        """The chunk's rows as op='r' Debezium envelopes at snapshot_pos —
        byte-compatible with the live stream, so the chunk flows through
        the identical decode/merge/index path."""
        cols = self.tspec.row_schema.fieldNames()
        rows = self.source_df.filter(
            (F.col(self.chunk_col) >= F.lit(chunk.lo))
            & (F.col(self.chunk_col) <= F.lit(chunk.hi))
        )
        after = F.struct(*[F.col(c) for c in cols])
        value = F.to_json(
            F.struct(
                F.lit(None).cast(self.tspec.row_schema).alias("before"),
                after.alias("after"),
                F.lit("r").alias("op"),
                F.lit(self.snapshot_ts_ms).alias("ts_ms"),
                F.struct(
                    F.lit(self.pipeline.spec.database_include[0]
                          if self.pipeline.spec.database_include else "db")
                    .alias("db"),
                    F.lit(self.table).alias("table"),
                    F.lit(self.snapshot_pos).alias("pos"),
                    F.lit(0).alias("server_id"),
                ).alias("source"),
            )
        )
        key = F.concat_ws(
            "|", *[F.col(k).cast("string") for k in self.tspec.key_cols]
        )
        return rows.select(key.alias("key"), value.alias("value"))

    def step(self) -> ChunkInfo | None:
        """Apply the next unapplied chunk through the pipeline's normal
        batch path; returns it, or None when the backfill is complete."""
        chunks = self.plan()
        nxt = self._load_done()
        if nxt >= len(chunks):
            return None
        chunk = chunks[nxt]
        self.pipeline.apply_batch(self._chunk_envelopes(chunk))
        self._save_done(nxt + 1, len(chunks))
        return chunk

    def run(self) -> int:
        """Apply every remaining chunk; returns how many were applied."""
        n = 0
        while self.step() is not None:
            n += 1
        return n

    def status(self) -> dict:
        chunks = self.plan()
        done = self._load_done()
        return {
            "table": self.table,
            "chunks_total": len(chunks),
            "chunks_done": done,
            "rows_total": sum(c.n_rows for c in chunks),
            "rows_done": sum(c.n_rows for c in chunks[:done]),
            "complete": done >= len(chunks),
        }
