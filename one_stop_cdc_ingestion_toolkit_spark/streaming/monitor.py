"""Pipeline monitoring & diagnostics.

The reference polls connector state in a loop
(`/root/reference/bin/mskc-connector.sh:461-489`) and greps S3 logs for
``error|failed|exception`` (`:491-499`). The engine gets both natively:

- :class:`PipelineListener` — a StreamingQueryListener appending one JSON
  line per progress/termination event (the CloudWatch-log analogue,
  queryable with any log tool).
- :func:`diagnose` — the log-grep analogue: surface the query's
  exception plus the last progress snapshot.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql.streaming import StreamingQueryListener


class PipelineListener(StreamingQueryListener):
    """Append-only JSONL event log for every streaming query in the session.

    Register with ``spark.streams.addListener(PipelineListener(path))``.
    """

    def __init__(self, log_path: str | Path):
        self.log_path = Path(log_path)
        self.log_path.parent.mkdir(parents=True, exist_ok=True)

    def _append(self, doc: dict) -> None:
        with self.log_path.open("a") as f:
            f.write(json.dumps(doc, default=str) + "\n")

    def onQueryStarted(self, event) -> None:
        self._append(
            {"ts": time.time(), "event": "started", "id": str(event.id), "name": event.name}
        )

    def onQueryProgress(self, event) -> None:
        # listener callbacks run on the listener bus thread; a raise here
        # is swallowed by Spark, so keep the extraction defensive.
        p = event.progress
        doc = {"ts": time.time(), "event": "progress", "id": str(p.id)}
        for attr in ("name", "batchId", "numInputRows", "inputRowsPerSecond"):
            try:
                doc[attr] = getattr(p, attr)
            except Exception:  # noqa: BLE001
                doc[attr] = None
        try:  # wall time the batch actually took (capacity_report input)
            doc["triggerMs"] = (p.durationMs or {}).get("triggerExecution")
        except Exception:  # noqa: BLE001
            doc["triggerMs"] = None
        self._append(doc)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self._append(
            {
                "ts": time.time(),
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )


def diagnose(pipeline) -> dict:
    """Error surface for a pipeline (`searchMskcConnectorLogErrors`
    analogue): state + exception + last progress + dead-letter depth +
    schema-registry rejections, no log-grep needed. The reference's
    only failure diagnosis is grepping connector logs for
    'error|failed' (A27, bin/mskc-connector.sh:491-499); the engine
    materializes each failure class where an operator can query it."""
    # count_dlq=False: diagnose reads the DLQ itself below — ONE
    # groupBy(reason) pass yields both the depth and the reason enum,
    # instead of status paying a count job and this function a second
    # distinct-collect job over the same table (review r7).
    status = pipeline.status(count_dlq=False)
    out = {
        "state": status.get("state"),
        "exception": None,
        "last_progress": None,
        "dlq_rows": 0,
        "open_transactions": status.get("open_transactions", 0),
        # (table, error) per rejected DDL — incompatible evolution is
        # recorded and skipped, never crashes the stream (A11 red path).
        "schema_rejections": [
            {"table": t, "error": err}
            for (t, _v, err) in getattr(pipeline, "schema_log", [])
            if err
        ],
        # quarantine reasons so the operator sees WHY without reading
        # the table (bounded: reasons are a small enum).
        "dlq_reasons": [],
    }
    dlq = pipeline.read_dlq()
    if dlq is not None:
        reason_counts = dlq.groupBy("reason").count().collect()
        out["dlq_rows"] = sum(r["count"] for r in reason_counts)
        out["dlq_reasons"] = sorted(r["reason"] for r in reason_counts)
    q = pipeline.query
    if q is not None:
        exc = q.exception()
        out["exception"] = str(exc) if exc else None
        if q.lastProgress:
            lp = q.lastProgress
            out["last_progress"] = {
                "batchId": lp.get("batchId"),
                "numInputRows": lp.get("numInputRows"),
            }
    return out


def read_event_log(log_path: str | Path) -> list[dict]:
    p = Path(log_path)
    if not p.exists():
        return []
    return [json.loads(line) for line in p.read_text().splitlines() if line.strip()]


def capacity_report(log_path: str | Path) -> list[dict]:
    """Right-sizing report from the listener event log — the engine's
    answer to the reference's fixed `1 MCU × 1 worker` capacity choice
    (`bin/osci.sh:19-20`): per query, how busy the allotted capacity
    actually is. For each query name: batches seen, total input rows,
    rows/sec over the observed span, the max single-batch trigger time,
    and ``busy_fraction`` = Σ trigger time / observed span. Reading the
    number: ≳0.8 means batches take about as long as the trigger
    interval (scale UP before falling behind); ≲0.2 means mostly idle
    (scale down or lengthen the trigger). Pure log math — no Spark
    session, no cluster round-trips."""
    def _num(v) -> float | None:
        try:
            return float(v)
        except (TypeError, ValueError):
            return None

    # defensive over user-supplied logs: drop events without a numeric
    # ts (they cannot be placed on the span) rather than crashing
    events = [
        e
        for e in read_event_log(log_path)
        if e.get("event") == "progress" and _num(e.get("ts")) is not None
    ]
    by_name: dict[str, list[dict]] = {}
    for e in events:
        by_name.setdefault(e.get("name") or str(e.get("id")), []).append(e)
    out = []
    for name, evs in sorted(by_name.items()):
        evs.sort(key=lambda e: float(e["ts"]))
        span_s = float(evs[-1]["ts"]) - float(evs[0]["ts"])
        # the span covers the N-1 intervals BETWEEN progress events; the
        # first batch ran before its own event, so its duration and rows
        # are excluded from the rate numerators (a 2-event log of 9 s
        # batches 10 s apart would otherwise report busy=1.8)
        tail = evs[1:]
        rows_tail = sum(int(_num(e.get("numInputRows")) or 0) for e in tail)
        trig_all = [
            int(t) for t in (_num(e.get("triggerMs")) for e in evs) if t is not None
        ]
        trig_tail = [
            int(t) for t in (_num(e.get("triggerMs")) for e in tail) if t is not None
        ]
        busy = (
            sum(trig_tail) / 1000.0 / span_s
            if (trig_tail and span_s > 0)
            else None
        )
        out.append(
            {
                "name": name,
                "n_batches": len(evs),
                "rows": sum(int(_num(e.get("numInputRows")) or 0) for e in evs),
                "rows_per_sec": round(rows_tail / span_s, 3)
                if span_s > 0
                else None,
                "max_trigger_ms": max(trig_all) if trig_all else None,
                "busy_fraction": round(busy, 4) if busy is not None else None,
            }
        )
    return out


def freshness(
    spark, store, tables: list[str] | None = None, now_ms: int | None = None
) -> list[dict]:
    """Replication-freshness report per materialized table — the number
    a CDC operator actually watches: how far each LAKE table's content
    trails the source clock. The reference's monitor loop watches the
    connector's state (`bin/mskc-connector.sh:461-489`); this watches
    the outcome. Per table: live row count (tombstones excluded),
    tombstone count, the source high-water mark (max applied ``__ts_ms``
    from the CDC merge meta), and ``lag_ms`` vs ``now_ms`` (pass a fixed
    clock for deterministic tests/reports; defaults to wall clock).
    Tables without CDC meta (plain snapshots) report ``ts_high_ms=None``
    — freshness is undefined for them, not zero.

    Scale: ONE column-pruned aggregate scan per table (count + max fold
    into a single partial agg; only the meta columns are read), and the
    per-table driver loop iterates metadata-cardinality, not data."""
    from pyspark.sql import functions as F

    now = int(time.time() * 1000) if now_ms is None else int(now_ms)
    names = sorted(tables) if tables is not None else store.list_tables()
    out: list[dict] = []
    for t in names:
        df = store.read(spark, t)
        if df is None:
            # an explicitly requested table that is missing/dropped is
            # the MAXIMALLY stale case — flag it, never hide it (a
            # report row an alert can fire on). Unrequested discovery
            # mode never reaches here (list_tables only names live
            # tables).
            out.append(
                {
                    "table": t,
                    "missing": True,
                    "rows_live": None,
                    "tombstones": None,
                    "ts_high_ms": None,
                    "lag_ms": None,
                }
            )
            continue
        aggs = [F.count(F.lit(1)).alias("rows")]
        has_ts = "__ts_ms" in df.columns
        has_del = "__deleted" in df.columns
        if has_ts:
            aggs.append(F.max("__ts_ms").alias("hi"))
        if has_del:
            aggs.append(
                F.sum(F.when(F.col("__deleted"), 1).otherwise(0)).alias("dead")
            )
        row = df.agg(*aggs).collect()[0]
        dead = int(row["dead"] or 0) if has_del else 0
        hi = int(row["hi"]) if has_ts and row["hi"] is not None else None
        out.append(
            {
                "table": t,
                "rows_live": int(row["rows"]) - dead,
                "tombstones": dead,
                "ts_high_ms": hi,
                "lag_ms": (now - hi) if hi is not None else None,
            }
        )
    return out
