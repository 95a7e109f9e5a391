"""Stream-static dimension enrichment: batch equivalence, and mid-stream
dimension updates becoming visible via the TableStore generation pointer."""

from __future__ import annotations

from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.streaming.analytics import (
    enrich_stream,
    enrich_via_store,
    stream_of,
)
from one_stop_cdc_ingestion_toolkit_spark.streaming.table_store import TableStore
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"


def test_enrich_stream_equals_batch_join(spark, tmp_path):
    ev = spark.read.parquet(EVENTS)
    dim = (
        ev.select("user_id").distinct()
        .withColumn("tier", F.when(F.col("user_id") % 2 == 0, "gold").otherwise("basic"))
    )
    d = tmp_path / "src"
    d.mkdir()
    ev.coalesce(1).write.parquet(str(d / "b1.parquet"))
    stream = stream_of(spark, str(d) + "/*", ev.schema)
    q = (
        enrich_stream(stream, dim, "user_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r["event_id"], r["tier"])
            for r in spark.sql("SELECT event_id, tier FROM enriched_out").collect()
        )
    finally:
        q.stop()
    want = sorted(
        (r["event_id"], r["tier"])
        for r in ev.join(dim, "user_id").select("event_id", "tier").collect()
    )
    assert got == want


def test_enrich_stream_plan_broadcasts_dim(spark):
    from one_stop_cdc_ingestion_toolkit_spark.plans import uses_broadcast_join

    ev = spark.read.parquet(EVENTS)
    dim = ev.select("user_id").distinct().withColumn("tier", F.lit("gold"))
    assert uses_broadcast_join(enrich_stream(ev, dim, "user_id"))


def test_enrich_via_store_sees_dim_updates(spark, tmp_path):
    """Batch 1 joins dim generation 1; after the dim table is rewritten
    (generation 2), batch 2 must see the NEW attribute values."""
    ev = spark.read.parquet(EVENTS).orderBy("event_id").limit(40)
    rows = ev.collect()
    half = 20
    b1 = spark.createDataFrame(rows[:half], ev.schema)
    b2 = spark.createDataFrame(rows[half:], ev.schema)

    store = TableStore(tmp_path / "lake")
    dim_v1 = ev.select("user_id").distinct().withColumn("tier", F.lit("v1"))
    store.write(dim_v1, "user_dim")

    src = tmp_path / "src"
    src.mkdir()
    b1.coalesce(1).write.parquet(str(src / "b1.parquet"))
    out = str(tmp_path / "enriched")
    stream = stream_of(spark, str(src) + "/*", ev.schema)
    q = enrich_via_store(
        spark, stream, store, "user_dim", "user_id", out, str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
        store.write(dim_v1.withColumn("tier", F.lit("v2")), "user_dim")
        b2.coalesce(1).write.parquet(str(src / "b2.parquet"))
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out)
    ids_b1 = {r["event_id"] for r in b1.collect()}
    tiers = {
        (r["event_id"] in ids_b1, r["tier"])
        for r in got.select("event_id", "tier").collect()
    }
    assert got.count() == 40
    assert (True, "v1") in tiers and (False, "v2") in tiers
    assert (True, "v2") not in tiers and (False, "v1") not in tiers
