"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics Spark's built-in stateful operators can't express (running
per-key accumulators that must emit on every batch, custom eviction
policies), the engine drops to the Arrow-batched grouped-state API —
state lives in the state store, keyed and checkpointed like any built-in
stateful operator, so recovery and watermark-based timeout come for free.

Shown here: a per-user running counter/value accumulator that emits its
updated totals each micro-batch — the streaming twin of
``events.groupBy(user_id).agg(count, sum)``, but incremental and
queryable mid-stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state.

    Input: a streaming events frame with user_id and value. Output: one
    updated (user_id, n_events, total_value) row per user per batch.
    State is two numbers per user — at 100 TB/day this is bounded by the
    user cardinality, not the event volume.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Timer-driven session finalizer (event-time timeout)
# ---------------------------------------------------------------------------

SESSION_SCHEMA = "user_id long, s_start long, s_end long, n_events long"
SESSION_STATE = "start long, last long, n long"
#: inactivity gap (µs) closing a session — matches session_counts/q40.
SESSION_GAP_US = 30 * 60 * 1_000_000


def _close_user_sessions(key, pdfs, state):
    """Exact gap-rule sessionization with an event-time TIMER: closed
    sessions emit as soon as the gap is provably over (either a later
    event arrives past the gap, or the watermark passes last+gap and the
    registered timeout fires) — not merely when more data happens to
    show up for the user. The state is 3 longs per OPEN session."""
    import pandas as pd  # local import: runs on executors

    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {"user_id": [user_id], "s_start": [start], "s_end": [last],
             "n_events": [n]}
        )
        return

    ts = []
    for pdf in pdfs:
        ts.extend(int(x) for x in pdf["ts_us"])
    ts.sort()
    sessions = []
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = None, None, 0
    for t in ts:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > SESSION_GAP_US:
            sessions.append((start, last, n))
            start, last, n = t, t, 1
        else:
            # min/max, not assignment: a cross-batch OUT-OF-ORDER event
            # (late but inside the watermark) must never move `last`
            # backward — that produced s_end < s_start and re-registered
            # the timeout timer too early (review r7)
            start, last, n = min(start, t), max(last, t), n + 1
    state.update((start, last, n))
    # event-time timeout at last+gap: fires once the watermark passes it
    state.setTimeoutTimestamp((last + SESSION_GAP_US) // 1000)
    if sessions:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "s_start": [s[0] for s in sessions],
                "s_end": [s[1] for s in sessions],
                "n_events": [s[2] for s in sessions],
            }
        )


def session_finalize(events: DataFrame, delay: str = "1 second") -> DataFrame:
    """Streaming gap-rule sessionization with explicit state + timers:
    emits one (user_id, s_start, s_end, n_events) row per CLOSED session
    (timestamps as epoch µs), closing via an event-time timeout when the
    watermark passes last-activity + gap — the applyInPandasWithState
    TIMER surface that `running_user_totals` (NoTimeout) doesn't
    exercise. Equivalent to `session_counts` / q40's batch gap rule;
    state is bounded by OPEN sessions only (closed state is removed on
    the timer), which is the 100 TB/day posture: memory follows
    concurrently-active users, not history."""
    from one_stop_cdc_ingestion_toolkit_spark.streaming.analytics import (
        watermarked,
    )

    wm = watermarked(events, delay)
    # NULL event times survive the engine's late-row filter (the
    # predicate evaluates to null, not true) and would crash the pandas
    # chunk on int(NaN) — a sessionless row carries no gap information,
    # drop it (review r7)
    keyed = wm.filter(F.col("ts_ev").isNotNull()).select(
        "ts_ev", "user_id", F.unix_micros(F.col("ts_ev")).alias("ts_us")
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _close_user_sessions,
        SESSION_SCHEMA,
        SESSION_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4): multiple typed state variables
# ---------------------------------------------------------------------------

PROFILE_SCHEMA = (
    "user_id long, event_type string, n_type long, n_events long, "
    "total_value double"
)

try:  # import-try gate: older PySpark builds lack transformWithState
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]


class UserProfileProcessor(StatefulProcessor):
    """Per-user profile with TWO independent state variables — a
    ValueState (running totals) plus a MapState (per-event-type counts).

    This is the capability boundary that motivates transformWithState
    over `applyInPandasWithState`: the older API forces ALL state into
    one flat tuple per key (a map would need serialize-the-world on
    every batch), while here each event type is its own state-store
    entry — updates touch only the types present in the batch, and TTL
    (`ttlDurationMs`) can bound retention per variable. State size:
    2 numbers + |event types| entries per user.
    """

    def __init__(self, ttl_ms: int | None = None):
        self._ttl = ttl_ms

    def init(self, handle) -> None:
        self._totals = handle.getValueState(
            "totals", "n long, total double", ttlDurationMs=self._ttl
        )
        self._by_type = handle.getMapState(
            "by_type", "event_type string", "n long", ttlDurationMs=self._ttl
        )

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd  # executor-side

        (user_id,) = key
        prev = self._totals.get() if self._totals.exists() else None
        n, total = prev if prev is not None else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            # fillna: pandas groupby drops NaN keys by default, so rows
            # with a null event_type would count into n_events/total but
            # vanish from the per-type map (and a batch of ONLY null
            # types would emit zero rows despite changed state) —
            # bucket them under an explicit sentinel type (review r7)
            for etype, cnt in (
                pdf.groupby(pdf["event_type"].fillna("__null__")).size().items()
            ):
                cur = self._by_type.getValue((etype,))
                self._by_type.updateValue(
                    (etype,), (int(cnt) + (cur[0] if cur else 0),)
                )
        self._totals.update((n, total))
        types, counts = [], []
        for (etype,), (cnt,) in self._by_type.iterator():
            types.append(etype)
            counts.append(cnt)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(types),
                "event_type": types,
                "n_type": counts,
                "n_events": [n] * len(types),
                "total_value": [total] * len(types),
            }
        )

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        return iter(())

    def handleInitialState(self, key, initial_state, timer_values) -> None:
        pass

    def close(self) -> None:
        pass


def user_profile_tws(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Streaming per-user profile via ``transformWithStateInPandas``:
    emits (user_id, event_type, n_type, n_events, total_value) — the
    FULL updated profile of every user touched by the micro-batch.

    Requires the RocksDB state store provider (transformWithState's
    backing store); the caller's session is configured by
    :func:`enable_tws`. Scale: state is keyed by user and segmented by
    state variable — a batch updates only the (user, touched-type)
    entries, and RocksDB keeps the working set off-heap, which is what
    makes 10^8-key state feasible on an executor."""
    return events.groupBy("user_id").transformWithStateInPandas(
        UserProfileProcessor(ttl_ms),
        PROFILE_SCHEMA,
        "update",
        "None",
    )


def tws_available() -> bool:
    """transformWithState needs (a) the Spark 4 StatefulProcessor API and
    (b) ``google.protobuf`` — its state-server wire protocol is proto-
    encoded and the DRIVER-side Python worker imports it at query start.
    Environments without protobuf (this container) get a clean gate, the
    same discipline as the Avro-jar and Kafka-broker probes."""
    if StatefulProcessor is object:  # import gate fell through
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return False
    return True


def enable_tws(spark) -> bool:
    """Point the session at the RocksDB state store provider (required
    by transformWithState). Returns False when the feature can't run
    in this environment (see :func:`tws_available`)."""
    if not tws_available():
        return False
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    return True
