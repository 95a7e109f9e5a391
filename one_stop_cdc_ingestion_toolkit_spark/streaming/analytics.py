"""Streaming analytics over event streams: tumbling/sliding windows,
session windows, stateful dedup — each with an exact batch twin
(SURVEY §2.3: streaming ops are verified by batch equivalence).

The fixtures' ``events.ts`` is a µs TIMESTAMP (legacy fixtures shipped
ns-since-epoch longs; ``catalog.py`` normalizes those). :func:`event_time`
adapts to either representation so ad-hoc DataFrames and file-source
streams work regardless of how ``ts`` arrives.

Scale posture: watermark + windowed aggregation is incremental state in
the state store (keyed by window × group), so a 100 TB/day stream holds
state proportional to open windows only; ``dropDuplicates`` with a
watermark bounds dedup state the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def event_time(df: DataFrame, col: str = "ts") -> Column:
    """Event-time column of ``df`` as µs TIMESTAMP (named ``ts_ev``).

    Adaptive: a long ``ts`` is treated as ns-since-epoch (legacy fixture
    encoding) and truncated to µs; a TIMESTAMP_NTZ ``ts`` (current
    fixtures) is cast to TIMESTAMP — watermarks and window operators
    require the zoned type, and the session pins UTC so the cast is an
    exact wall-clock identity. Outputs cast back to NTZ (see
    :func:`wall_clock`) so batch results keep the oracle's wall-clock type.
    """
    dt = dict(df.dtypes).get(col)
    if dt in ("bigint", "long"):
        return F.timestamp_micros(F.expr(f"{col} div 1000")).alias("ts_ev")
    if dt == "timestamp_ntz":
        return F.col(col).cast("timestamp").alias("ts_ev")
    return F.col(col).alias("ts_ev")


def wall_clock(c: Column | str) -> Column:
    """Zoned µs timestamp → wall-clock (NTZ) output type. Exact under the
    session's pinned UTC; keeps engine output types oracle-invariant."""
    return (c if isinstance(c, Column) else F.col(c)).cast("timestamp_ntz")


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per-(window, event_type) counts + value sums; works identically on a
    batch DataFrame and a watermarked stream (append mode after close)."""
    return (
        events.withColumn("ts_ev", event_time(events))
        .groupBy(F.window("ts_ev", width).alias("w"), "event_type")
        # DECIMAL sum: order-independent exact arithmetic, so batch, stream
        # and the DuckDB oracle agree bit-for-bit regardless of merge order.
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
        )
        .select(
            wall_clock("w.start").alias("w_start"),
            "event_type",
            "n",
            "v",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    return (
        events.withColumn("ts_ev", event_time(events))
        .groupBy(F.window("ts_ev", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(wall_clock("w.start").alias("w_start"), "event_type", "n")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows per user (native session_window operator —
    the streaming twin of the Q40 batch sessionization)."""
    return (
        events.withColumn("ts_ev", event_time(events))
        .groupBy(F.session_window("ts_ev", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            wall_clock("w.start").alias("s_start"),
            wall_clock("w.end").alias("s_end"),
            "user_id",
            "n_events",
        )
    )


def stream_of(spark, parquet_path: str, schema) -> DataFrame:
    """Replay a parquet file as a file-source stream (test/backfill aid)."""
    return spark.readStream.schema(schema).format("parquet").load(parquet_path)


def watermarked(df: DataFrame, delay: str = "10 minutes") -> DataFrame:
    return df.withColumn("ts_ev", event_time(df)).withWatermark("ts_ev", delay)


def dedup_stream(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Stateful exact dedup by (event_id, event time) with bounded state.

    The event-time column MUST be in the dedup subset: streaming
    ``dropDuplicates`` only evicts state for keys whose watermark column
    is part of the key — dedup on ``["event_id"]`` alone keeps every id
    ever seen in the state store FOREVER despite the watermark (the
    exact unbounded-state trap ``dropDuplicatesWithinWatermark`` was
    added to fix; review r7). With the pair key, state for event times
    older than the watermark is dropped.

    Semantics: drops exact redeliveries (same id, same event time — the
    at-least-once case, where duplicates are byte-identical records).
    The same id at a DIFFERENT event time is treated as a new event.
    For first-seen-wins dedup across differing timestamps within a lag
    window, use :func:`dedup_stream_within`. Batch twin:
    ``dropDuplicates`` / SELECT DISTINCT over the same pair."""
    return watermarked(events, delay).dropDuplicates(["event_id", "ts_ev"])


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    delay: str = "10 minutes",
    within: str = "30 minutes",
) -> DataFrame:
    """Stream-stream (or batch-batch — same code path) event-time interval
    join: pair each left event with right events for the same ``key``
    whose event time falls in ``[left_ts, left_ts + within]`` — the
    click→conversion attribution shape.

    Both sides are watermarked, and the join condition bounds event-time
    distance in BOTH directions, so Structured Streaming can expire
    buffered rows: state per side is ~(watermark delay + interval) of
    input, independent of total stream length. The join itself shuffles
    on the equi-key only; the interval predicate is evaluated post-match.
    """
    l = left.withColumn("ts_l", event_time(left)).select(
        F.col(key).alias("lk"),
        F.col("event_id").alias("l_id"),
        "ts_l",
    )
    r = right.withColumn("ts_r", event_time(right)).select(
        F.col(key).alias("rk"),
        F.col("event_id").alias("r_id"),
        "ts_r",
    )
    if delay:  # streaming state bound; harmless no-op semantics on batch
        l = l.withWatermark("ts_l", delay)
        r = r.withWatermark("ts_r", delay)
    # the interval bound must live IN the join condition (not a post-join
    # filter) for the streaming planner to derive a state watermark
    cond = (
        (F.col("lk") == F.col("rk"))
        & (F.col("ts_r") >= F.col("ts_l"))
        & (F.col("ts_r") <= F.col("ts_l") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond).select(
        F.col("lk").alias(key),
        "l_id",
        "r_id",
        wall_clock("ts_l").alias("ts_l"),
        wall_clock("ts_r").alias("ts_r"),
    )


def start_materialized_counts(
    spark,
    source_dir: str,
    schema,
    store,
    table: str = "event_counts",
    checkpoint_dir: str = "checkpoint/event_counts",
    width: str = "1 hour",
    delay: str = "10 minutes",
):
    """Incrementally-maintained materialized view: windowed counts kept
    up to date in the table store as the stream advances.

    Update-mode emits each (window, event_type) row whenever its
    aggregate changes; ``foreachBatch`` upserts those rows into the
    stored view (anti-join out the superseded keys, union the fresh
    ones). State in the streaming agg is bounded by the watermark; the
    stored view only ever rewrites the windows a batch touched — the
    same partition-scoped discipline as the CDC merge.
    """
    ev = stream_of(spark, source_dir, schema)
    ev = ev.withColumn("ts_ev", event_time(ev))
    agg = (
        ev.withWatermark("ts_ev", delay)
        .groupBy(F.window("ts_ev", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
        )
        .select(wall_clock("w.start").alias("w_start"), "event_type", "n", "v")
    )

    def upsert(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        current = store.read(spark, table)
        if current is None:
            new = batch
        else:
            keys = ["w_start", "event_type"]
            new = current.join(batch.select(*keys), keys, "left_anti").unionByName(
                batch
            )
        store.write(new, table)

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"mv_{table}")
        .start()
    )


def dedup_stream_within(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Exact dedup for duplicates that arrive WITHIN ``delay`` of each
    other (``dropDuplicatesWithinWatermark``): state for a key is
    dropped ``delay`` after it was FIRST seen, so total state is bounded
    by the redelivery window alone — unlike :func:`dedup_stream`, whose
    per-key state lives until the key's event time passes the watermark.
    The right tool when duplicates come from at-least-once redelivery
    (bounded lag) rather than event-time disorder; batch twin is the
    same ``SELECT DISTINCT``."""
    return watermarked(events, delay).dropDuplicatesWithinWatermark(["event_id"])


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    hint_broadcast: bool = True,
) -> DataFrame:
    """Stream-static dimension enrichment: join a (possibly streaming)
    event frame against a static dimension table — the bread-and-butter
    CDC pattern of decorating a click/txn stream with customer/product
    attributes.

    Stream-static joins need NO state store: Spark re-executes the
    static side's plan every micro-batch, so each batch joins against
    the dimension as read at batch planning time. With
    ``hint_broadcast`` (the default — dimensions are the small side)
    the join is a broadcast hash join per batch: the stream never
    shuffles, which is the 100 TB-stream posture. Set it False for a
    dimension too large to broadcast (falls back to a shuffle join of
    THAT BATCH only — still bounded by micro-batch size).

    For a dimension that the CDC pipeline itself maintains (a
    `TableStore` materialized table), prefer :func:`enrich_via_store`,
    which re-resolves the atomic generation pointer each batch so dim
    UPDATES become visible mid-stream.
    """
    d = F.broadcast(dim) if hint_broadcast else dim
    return events.join(d, on, how)


def enrich_via_store(
    spark,
    events: DataFrame,
    store,
    dim_table: str,
    on: str | list[str],
    out_path: str,
    checkpoint: str,
    how: str = "left",
    dim_schema=None,
):
    """Start a foreachBatch enrichment that re-reads the dimension from a
    :class:`TableStore` at EVERY micro-batch — dimension rows
    upserted/deleted by the CDC pipeline between batches are visible to
    the very next batch (the store's generation pointer is atomic, so a
    batch sees a consistent dim snapshot, never a half-written one).

    Enriched batches append to ``out_path`` as parquet. Returns the
    StreamingQuery. Restart-safe: foreachBatch re-delivery after a crash
    re-reads the CURRENT dim generation — enrichment is at-least-once
    with latest-dim semantics (the standard contract for slowly-changing
    enrichment; use `read_as_of` inside a custom fn for frozen-dim
    semantics).

    ``dim_schema`` (StructType): the dimension's row schema, used when
    the dim table has not materialized yet — batches then append with
    NULL dim columns, keeping every parquet file in ``out_path`` on ONE
    schema (without it, pre-dim batches would carry only event columns
    and a plain read of the output would silently drop the dim columns
    from them — review r7). Omitted: a batch arriving before the dim
    exists fails loudly instead of writing a divergent schema."""
    join_keys = [on] if isinstance(on, str) else list(on)

    def _apply(batch: DataFrame, _epoch: int) -> None:
        d = store.read(spark, dim_table)
        if d is not None:
            out = batch.join(F.broadcast(d), on, how)
        elif dim_schema is not None:
            out = batch.select(
                "*",
                *[
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in dim_schema.fields
                    if f.name not in join_keys
                ],
            )
        else:
            raise ValueError(
                f"dim table {dim_table!r} not materialized yet — create it "
                "first or pass dim_schema so pre-dim batches keep a stable "
                "output schema"
            )
        out.write.mode("append").parquet(out_path)

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .start()
    )
