"""Incrementally-maintained near-duplicate index over a CDC-ingested
document table.

The reference's pipeline lands change streams in lake tables
(`/root/reference/README.md:22-32` — Hudi-bound topics); the first thing
a training-data pipeline does to such a corpus is dedup it. Recomputing
fingerprints over the whole corpus per micro-batch is O(corpus) — this
index makes it O(batch): each batch fingerprints ONLY the rows the merge
touched and upserts them into an index table (same atomic TableStore
swap as the data), so duplicate lookups are an index-bucket join, never
a corpus rescan.

Index rows: ``(id, fp, band_idx, band_sig)`` — one exact-content
fingerprint (md5 of normalized text, operators/text.py) and the MinHash
LSH band signatures (operators/dedup.py) per live document, exploded to
one row per band.

Incremental invariant (tested): after any replay of batches — including
duplicate delivery, cross-batch out-of-order updates and deletes — the
index equals what a full batch recompute over the merged snapshot would
produce. This holds because updates are driven by the POST-MERGE state
of the touched keys (never by the raw batch, whose per-batch winner can
lose to already-applied state), and the upsert (anti-join out touched
ids, union fresh rows) is idempotent under redelivery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.operators.dedup import (
    band_pairs,
    minhash_band_rows,
)
from one_stop_cdc_ingestion_toolkit_spark.operators.text import fingerprint


class DedupIndex:
    """Dedup index for one document table, materialized in ``store``."""

    def __init__(
        self,
        store,
        table: str,
        id_col: str | None = None,
        text_col: str | None = None,
    ):
        """``id_col``/``text_col`` are required for maintenance
        (:meth:`update`); lookups over an existing index need only the
        store and table."""
        self.store = store
        self.table = table
        self.index_table = f"{table}__dedup_idx"
        self.id_col = id_col
        self.text_col = text_col

    # -- maintenance -------------------------------------------------------

    def _index_rows(self, docs: DataFrame) -> DataFrame:
        """(id, fp, band_idx, band_sig) for the given documents."""
        fps = docs.select(
            F.col(self.id_col).alias("id"),
            fingerprint(F.col(self.text_col)).alias("fp"),
        )
        bands = minhash_band_rows(docs, self.id_col, self.text_col)
        return bands.join(fps, "id").select("id", "fp", "band_idx", "band_sig")

    def update(self, spark: SparkSession, touched_state: DataFrame) -> None:
        """Fold one micro-batch into the index.

        ``touched_state`` is the post-merge state restricted to the keys
        the batch touched: data columns plus ``__deleted``. Touched ids
        are dropped from the index and live rows re-inserted — O(batch)
        fingerprint work + one index rewrite (bucketable exactly like the
        data table at scale)."""
        touched = touched_state.select(
            F.col(self.id_col).alias("id"), self.text_col, "__deleted"
        )
        fresh = self._index_rows(
            touched.filter(~F.col("__deleted")).select(
                F.col("id").alias(self.id_col), self.text_col
            )
        )
        current = self.store.read(spark, self.index_table)
        if current is None:
            new = fresh
        else:
            gone = touched.select("id")
            new = current.join(gone, "id", "left_anti").unionByName(fresh)
        self.store.write(new, self.index_table)

    # -- lookups (index-only: no corpus rescan) ----------------------------

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read(spark, self.index_table)

    def exact_duplicates(self, spark: SparkSession) -> DataFrame:
        """Groups of identical (normalized) content: (fp, n, keeper)."""
        idx = self.read(spark)
        docs = idx.select("id", "fp").distinct()
        return (
            docs.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n"), F.min("id").alias("keeper"))
            .filter(F.col("n") > 1)
        )

    def near_duplicate_pairs(self, spark: SparkSession) -> DataFrame:
        """Candidate near-dup pairs (id_a < id_b) from the banded index."""
        idx = self.read(spark)
        return band_pairs(idx.select("id", "band_idx", "band_sig"))
