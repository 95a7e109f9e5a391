"""Incrementally-maintained full-text (BM25) search index over a
CDC-ingested document table.

Same maintenance contract as ``dedup_index.DedupIndex``: each
micro-batch re-derives index rows ONLY for the keys the merge touched
(driven by post-merge state, so redelivery and cross-batch reordering
converge) and swaps them in with the store's atomic generation pointer —
O(batch) content work, idempotent under foreachBatch re-execution after
a crash.

Index layout — ONE table, two row kinds, so the whole index moves
atomically:

- term rows  ``(id, term, tf, dl)`` — one per distinct term of a live
  document (tf = term frequency, dl = document length in tokens);
- doc rows   ``(id, term=NULL, tf=0, dl)`` — one per live document, so
  corpus statistics (N, avgdl) are derivable from the index alone, and
  empty documents stay indexed.

Query path (:meth:`bm25`): filter term rows to the query terms (parquet
predicate pushdown prunes row groups — at scale, sort-within-bucket by
term makes this a range read), derive per-term document frequencies from
the slice, broadcast the 1-row corpus stats, score with the SAME
``bm25_partial`` expression the batch operator f106 uses, sum per doc,
TakeOrdered top-k. No corpus rescan anywhere. At 100 TB the N/avgdl
aggregate over doc rows should itself be cached per generation — noted,
not needed at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.operators.retrieval import (
    bm25_partial,
    tokenize,
)
from one_stop_cdc_ingestion_toolkit_spark.streaming.table_store import key_bucket


class SearchIndex:
    """BM25 search index for one document table, materialized in ``store``."""

    def __init__(
        self,
        store,
        table: str,
        id_col: str | None = None,
        text_col: str | None = None,
        n_buckets: int | None = None,
    ):
        self.store = store
        self.table = table
        self.index_table = f"{table}__search_idx"
        self.id_col = id_col
        self.text_col = text_col
        self.n_buckets = n_buckets

    def _bucket_of(self, col: F.Column) -> F.Column:
        return key_bucket(self.n_buckets, col)

    # -- maintenance -------------------------------------------------------

    def _index_rows(self, docs: DataFrame) -> DataFrame:
        """Term rows + doc rows for the given (id, text) documents.

        NULL text coalesces to an empty token array: ``size(NULL)`` is
        -1, which would otherwise flow into a doc row's dl and silently
        bias the corpus stats (N counts the doc, sum(dl) absorbs −1)
        for every BM25 query (review r7). A NULL-text doc indexes like
        an empty one: present in N, dl = 0, no term rows."""
        words = docs.select(
            F.col(self.id_col).alias("id"),
            F.coalesce(
                tokenize(F.col(self.text_col)),
                F.array().cast("array<string>"),
            ).alias("words"),
        )
        term_rows = (
            words.select("id", F.size("words").alias("dl"), F.explode("words").alias("term"))
            .groupBy("id", "dl", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
            .select("id", "term", "tf", "dl")
        )
        doc_rows = words.select(
            "id",
            F.lit(None).cast("string").alias("term"),
            F.lit(0).cast("long").alias("tf"),
            F.size("words").cast("long").alias("dl"),
        )
        return term_rows.withColumn("dl", F.col("dl").cast("long")).unionByName(
            doc_rows
        )

    def update(
        self,
        spark: SparkSession,
        touched_state: DataFrame,
        affected: list[int] | None = None,
    ) -> None:
        """Fold one micro-batch into the index (same shape as
        DedupIndex.update: anti-join out touched ids, re-insert live
        rows; bucketed layout rewrites only touched id-hash buckets).
        ``affected``: the touched ids' bucket list when the caller
        already collected it (pipeline._bucket_pruned_state — same ids,
        same key_bucket hash); None collects it here (review r7)."""
        touched = touched_state.select(
            F.col(self.id_col).alias("id"), self.text_col, "__deleted"
        )
        fresh = self._index_rows(
            touched.filter(~F.col("__deleted")).select(
                F.col("id").alias(self.id_col), self.text_col
            )
        )
        gone = touched.select("id")
        if self.n_buckets:
            if affected is None:
                affected = sorted(
                    r[0]
                    for r in gone.select(
                        self._bucket_of(F.col("id")).alias("__b")
                    )
                    .distinct()
                    .collect()
                )
            current = self.store.read_buckets(spark, self.index_table, affected)
            new = fresh
            if current is not None:
                new = current.drop("__bucket").join(
                    gone.select("id"), "id", "left_anti"
                ).unionByName(fresh)
            new = new.withColumn("__bucket", self._bucket_of(F.col("id")))
            self.store.write_buckets(new, self.index_table, affected)
            return
        current = self.store.read(spark, self.index_table)
        if current is None:
            new = fresh
        else:
            new = current.join(gone, "id", "left_anti").unionByName(fresh)
        self.store.write(new, self.index_table)

    # -- queries (index-only: no corpus rescan) ----------------------------

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read(spark, self.index_table)

    def bm25(self, spark: SparkSession, terms: list[str], k: int = 10) -> DataFrame:
        """Top-``k`` (id, score) for the bag-of-words query ``terms``,
        scored purely from the index."""
        idx = self.read(spark)
        if idx is None:
            raise ValueError(f"no search index for table: {self.table}")
        doc_rows = idx.filter(F.col("term").isNull())
        stats = doc_rows.agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        )
        sliced = idx.filter(F.col("term").isin(list(terms)))
        dfs = sliced.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        partial = bm25_partial(
            F.col("tf").cast("double"),
            F.col("dl").cast("double"),
            F.col("df").cast("double"),
            F.col("n").cast("double"),
            F.col("avgdl"),
        )
        return (
            sliced.join(F.broadcast(dfs), "term")
            .crossJoin(F.broadcast(stats))
            .select("id", partial.alias("p"))
            .groupBy("id")
            .agg(F.round(F.sum("p"), 4).alias("score"))
            .orderBy(F.desc("score"), "id")
            .limit(k)
        )

    def rebuild(self, spark: SparkSession, snapshot: DataFrame) -> None:
        """Recompute the whole index from a table snapshot and swap it in
        — the repair verb for index drift (e.g. a crash landed between
        the data write and the index write, leaving the index one batch
        behind; the atomic generation swap makes the repair itself safe
        to re-run)."""
        rows = self._index_rows(snapshot)
        if self.n_buckets:
            rows = rows.withColumn("__bucket", self._bucket_of(F.col("id")))
            self.store.write_buckets(
                rows, self.index_table, list(range(self.n_buckets))
            )
            return
        self.store.write(rows, self.index_table)
