"""Transaction-boundary atomicity for the CDC apply path.

Debezium (the reference's capture layer — `bin/mskc-connector.sh`
configures Debezium-MySQL 2.2.0) can annotate every change event with a
``transaction`` block and emit BEGIN/END boundary records on a metadata
stream (``provide.transaction.metadata=true``, public Debezium config).
The engine's merge is sequence-arbited and idempotent, so a torn
transaction eventually CONVERGES — but mid-stream readers could observe
half a source transaction. This gate upgrades "eventually consistent"
to "transactionally atomic": change records carrying a transaction id
are held in a durable buffer and released into the apply path only when
their transaction has provably COMMITTED (its END boundary was seen,
and, when the boundary carries ``event_count``, all its events are in
the buffer).

Together with the epoch log (`table_store.log_epoch`) this gives
cross-table, transaction-atomic snapshots: a released transaction's
rows for ALL tables enter in the same micro-batch, hence the same epoch.

Record shapes (over the raw ``(key, value)`` stream):

- data record in a tx: envelope JSON with ``transaction.id`` set;
- boundary record:  ``{"status": "BEGIN"|"END", "id": ..,
  "event_count": n?}`` (no ``op`` field — it would otherwise hit the
  DLQ, so the gate strips boundaries before the malformed-check);
- anything without ``transaction.id`` passes through untouched.

Durability: the buffer is a parquet dir + a JSON state file under the
pipeline's sink dir. A replayed micro-batch (crash between apply and
checkpoint commit) re-appends duplicate rows — harmless, because the
downstream merge is (key, pos) max-per-key idempotent, and the release
DISTINCTs the buffer. Buffer rewrites go through a staged swap (write
aside, atomic rename), the `table_store` discipline.

Scale: buffered volume is bounded by OPEN transactions only (released
data is physically removed), i.e. by transaction size × concurrency,
not stream history. All buffer operations are DataFrame scans/writes —
no driver-side row materialization except the (small) set of boundary
records per batch.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BUFFER_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("tx_id", T.StringType(), True),
    ]
)


class TxGate:
    """Durable hold-and-release buffer for in-flight transactions."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.dir = os.path.join(base_dir, "_txbuf")
        self.state_path = os.path.join(base_dir, "_txstate.json")
        os.makedirs(self.dir, exist_ok=True)

    # -- state ------------------------------------------------------------

    def _load_state(self) -> dict:
        if not os.path.exists(self.state_path):
            return {"ended": {}}
        with open(self.state_path) as f:
            return json.load(f)

    def _save_state(self, state: dict) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.state_path)

    # -- buffer I/O -------------------------------------------------------

    def _read_buffer(self) -> DataFrame:
        if any(n.endswith(".parquet") for n in os.listdir(self.dir)):
            return self.spark.read.schema(BUFFER_SCHEMA).parquet(self.dir)
        return self.spark.createDataFrame([], BUFFER_SCHEMA)

    def _append_buffer(self, df: DataFrame) -> None:
        # one file per batch, unique name: append without listing races
        df.coalesce(1).write.mode("append").parquet(self.dir)

    def _rewrite_buffer(self, df: DataFrame) -> None:
        stage = self.dir + f"-stage-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(stage)
        old = self.dir
        gone = self.dir + "-gone"
        os.rename(old, gone)
        os.rename(stage, old)
        shutil.rmtree(gone)

    # -- the gate ---------------------------------------------------------

    def filter_batch(self, raw: DataFrame) -> DataFrame:
        """One micro-batch in → the records the apply path may see now.

        Splits ``raw`` into boundary records (consumed here), tx-tagged
        data (buffered), and plain data (passes through). Returns plain
        data UNIONed with every buffered record of transactions that
        are now provably committed."""
        val = F.col("value").cast("string")
        tx_id = F.get_json_object(val, "$.transaction.id")
        is_boundary = (
            F.get_json_object(val, "$.status").isNotNull()
            & F.get_json_object(val, "$.id").isNotNull()
            & F.get_json_object(val, "$.op").isNull()
        )
        raw = raw.select(
            F.col("key").cast("string").alias("key"), val.alias("value")
        ).persist()
        try:
            # 1. consume boundaries (bounded by tx ends per batch)
            ends = (
                raw.filter(is_boundary)
                .select(
                    F.get_json_object(val, "$.status").alias("status"),
                    F.get_json_object(val, "$.id").alias("id"),
                    F.get_json_object(val, "$.event_count")
                    .cast("long")
                    .alias("event_count"),
                )
                .filter(F.col("status") == "END")
                .collect()
            )
            state = self._load_state()
            for r in ends:
                state["ended"][r["id"]] = r["event_count"]

            # 2. buffer tx-tagged data
            data = raw.filter(~is_boundary)
            tagged = data.filter(tx_id.isNotNull()).select(
                "key", "value", tx_id.alias("tx_id")
            )
            if not tagged.isEmpty():
                self._append_buffer(tagged)
            passthrough = data.filter(tx_id.isNull())

            # 3. release committed transactions
            if not state["ended"]:
                self._save_state(state)
                return passthrough
            buf = self._read_buffer().distinct()
            counts = {
                r["tx_id"]: r["n"]
                for r in buf.groupBy("tx_id")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            release = [
                t
                for t, need in state["ended"].items()
                if t in counts and (need is None or counts[t] >= need)
            ]
            if not release:
                self._save_state(state)
                return passthrough
            # stage released rows to parquet BEFORE the buffer swap
            # invalidates their lineage — distributed write, no driver
            # materialization of transaction payloads.
            release_dir = os.path.join(
                os.path.dirname(self.dir), "_txrelease"
            )
            buf.filter(F.col("tx_id").isin(release)).select(
                "key", "value"
            ).write.mode("overwrite").parquet(release_dir)
            self._rewrite_buffer(buf.filter(~F.col("tx_id").isin(release)))
            for t in release:
                del state["ended"][t]
            self._save_state(state)
            released = self.spark.read.schema(
                T.StructType(BUFFER_SCHEMA.fields[:2])
            ).parquet(release_dir)
            return passthrough.unionByName(released)
        finally:
            raw.unpersist()

    def pending(self) -> dict:
        """Observability: open transaction ids → buffered record count."""
        buf = self._read_buffer().distinct()
        return {
            r["tx_id"]: r["n"]
            for r in buf.groupBy("tx_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
