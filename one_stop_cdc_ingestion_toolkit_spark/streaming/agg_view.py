"""Incrementally-maintained aggregate view over a CDC-merged table.

The reference lands change streams in lake tables for downstream
analytics (`/root/reference/README.md:22-32`); the standing dashboards
over such tables are GROUP-BY aggregates. Recomputing them per
micro-batch is O(state) — this view maintains them in O(batch): per
batch, the delta is the difference between the touched keys' POST-merge
contributions and their PRIOR-state contributions, folded into the view
with one bounded merge (view size = group cardinality).

Why state-difference, not envelope before-images: a Debezium ``before``
image describes what the *producer* thought the prior row was — under
out-of-order / redelivered at-least-once delivery, the merge may have
discarded that change entirely (stale sequence), so retracting its
before-image would corrupt the view. The prior MERGED state is the only
authoritative record of what the view currently counts. This is the
same invariant the dedup/search indexes use (dedup_index.py), extended
to retractions.

Consistency protocol: the view records ``applied_upto`` — how many
pointer states of the base table it reflects. ``Pipeline.apply_batch``
compares that with the base table's history length before the merge:
equal → fold the O(batch) delta; gap (crash between base write and view
write, or view created after the table) → rebuild from the merged
snapshot. Replayed batches whose merge is a no-op produce a zero delta
(post == prior), so redelivery converges.

Maintainable aggregates are the abelian-group ones: COUNT and SUM (AVG
derived at read). MIN/MAX are NOT incrementally maintainable under
deletes without re-aggregation — deliberately excluded.
"""

from __future__ import annotations

import json
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class AggView:
    """One standing GROUP-BY view (count + sums) over a CDC table."""

    def __init__(self, store, table: str, group_cols: list[str], sum_cols: list[str]):
        self.store = store
        self.table = table
        self.group_cols = group_cols
        self.sum_cols = sum_cols
        self.view_table = f"{table}__aggview"

    # -- consistency metadata ---------------------------------------------

    def _meta_file(self):
        return self.store.root / self.view_table / "_VIEW_BASE"

    def applied_upto(self) -> int | None:
        """How many base-table pointer states the view reflects (None =
        never built). A torn/unparseable meta file reads as None so the
        sync check repairs by REBUILD instead of crash-looping on
        JSONDecodeError every replayed batch (review r7)."""
        f = self._meta_file()
        if not f.exists():
            return None
        try:
            return json.loads(f.read_text())["applied_upto"]
        except (json.JSONDecodeError, KeyError):
            return None

    def _record(self, applied_upto: int) -> None:
        # atomic replace, like the TableStore pointer flip — a crash mid
        # write_text left torn JSON (review r7)
        import os

        f = self._meta_file()
        f.parent.mkdir(parents=True, exist_ok=True)
        tmp = f.with_name("_VIEW_BASE.tmp")
        tmp.write_text(json.dumps({"applied_upto": applied_upto}))
        os.replace(tmp, f)

    # -- delta computation -------------------------------------------------

    def _contrib(self, state: DataFrame | None, sign: int) -> DataFrame | None:
        """Signed per-group contributions of live rows of a state slice."""
        if state is None:
            return None
        live = state.filter(~F.col("__deleted")) if "__deleted" in state.columns else state
        return live.groupBy(*self.group_cols).agg(
            (F.count(F.lit(1)) * sign).alias("n"),
            *[
                (F.coalesce(F.sum(F.col(c).cast("double")), F.lit(0.0)) * sign).alias(
                    f"sum_{c}"
                )
                for c in self.sum_cols
            ],
        )

    def delta(
        self, prior_touched: DataFrame | None, post_touched: DataFrame
    ) -> DataFrame:
        """Per-group delta = contrib(post) − contrib(prior), over the
        touched keys only (O(batch) input)."""
        post = self._contrib(post_touched, +1)
        prior = self._contrib(prior_touched, -1)
        both = post if prior is None else post.unionByName(prior)
        return both.groupBy(*self.group_cols).agg(
            F.sum("n").alias("n"),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in self.sum_cols],
        )

    # -- view maintenance --------------------------------------------------

    def _merge(self, view: DataFrame | None, delta: DataFrame) -> DataFrame:
        if view is None:
            merged = delta
        else:
            d = delta.select(
                *[F.col(g).alias(f"__g_{g}") for g in self.group_cols],
                F.col("n").alias("__dn"),
                *[F.col(f"sum_{c}").alias(f"__ds_{c}") for c in self.sum_cols],
            )
            # NULL-SAFE join on the group keys: a NULL group (nullable
            # group column) must match its own view row — a plain
            # column-list join never matches NULL to NULL, so the NULL
            # group duplicated one row per batch (review r7)
            cond = reduce(
                lambda p, q: p & q,
                [
                    view[g].eqNullSafe(d[f"__g_{g}"])
                    for g in self.group_cols
                ],
            )
            merged = (
                view.join(d, cond, "full_outer")
                .select(
                    *[
                        F.coalesce(view[g], d[f"__g_{g}"]).alias(g)
                        for g in self.group_cols
                    ],
                    (
                        F.coalesce(F.col("n"), F.lit(0))
                        + F.coalesce(F.col("__dn"), F.lit(0))
                    ).alias("n"),
                    *[
                        (
                            F.coalesce(F.col(f"sum_{c}"), F.lit(0.0))
                            + F.coalesce(F.col(f"__ds_{c}"), F.lit(0.0))
                        ).alias(f"sum_{c}")
                        for c in self.sum_cols
                    ],
                )
            )
        return merged.filter(F.col("n") > 0)

    def apply(self, spark: SparkSession, delta: DataFrame, applied_upto: int) -> None:
        """Fold one batch's delta into the view (O(groups) merge)."""
        view = self.store.read(spark, self.view_table)
        self.store.write(self._merge(view, delta), self.view_table)
        self._record(applied_upto)

    def rebuild(self, spark: SparkSession, state: DataFrame, applied_upto: int) -> None:
        """Full re-aggregation from a merged state snapshot — the repair
        path for gaps (crash between base write and view write) and the
        bootstrap path for views declared on existing tables."""
        full = self._contrib(state, +1)
        self.store.write(full.filter(F.col("n") > 0), self.view_table)
        self._record(applied_upto)

    # -- query side --------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame | None:
        """The view: group cols, n, sum_<c>, avg_<c> (derived)."""
        v = self.store.read(spark, self.view_table)
        if v is None:
            return None
        for c in self.sum_cols:
            v = v.withColumn(f"avg_{c}", F.col(f"sum_{c}") / F.col("n"))
        return v


def eager(df: DataFrame) -> DataFrame:
    """Materialize a (small) DataFrame now, cutting lineage — deltas must
    be computed BEFORE the base-table write prunes the prior generation's
    files (TableStore retain=0), then folded in after it. Pair with
    :func:`release_eager` once the delta is consumed."""
    return df.localCheckpoint(eager=True)


def release_eager(df: DataFrame) -> None:
    """Free an :func:`eager` delta's backing RDD once it is folded into
    the view. localCheckpoint storage is otherwise reclaimed only when a
    Python GC drops the last reference AND the JVM ContextCleaner runs —
    nondeterministic, so a long-lived pipeline would accumulate one
    checkpoint block-set per batch in the meantime. After this the
    DataFrame is not recomputable — only call on consumed deltas."""
    plan = df._jdf.queryExecution().analyzed()  # noqa: SLF001
    plan.rdd().unpersist(False)


def recompute_reference(
    state: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Batch recompute twin used by tests: what the view must equal."""
    live = state.filter(~F.col("__deleted")) if "__deleted" in state.columns else state
    return live.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        # coalesce to 0.0 like _contrib: a group whose sum column is
        # all-NULL reads 0.0 on the incremental side — the twin must
        # agree or views_equal reports a spurious mismatch (review r7)
        *[
            F.coalesce(F.sum(c).cast("double"), F.lit(0.0)).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )


def views_equal(a: DataFrame, b: DataFrame, group_cols: list[str], tol: float = 1e-6) -> bool:
    """Order-insensitive equality with float tolerance on sums (repeated
    incremental +/- on doubles accumulates representation error).
    Null-safe group join: a NULL group must compare against its own twin
    row, not read as two unmatched rows (review r7)."""
    ac = [c for c in a.columns]
    aa, bb = a.alias("a"), b.alias("b")
    cond = reduce(
        lambda p, q: p & q,
        [F.col(f"a.{g}").eqNullSafe(F.col(f"b.{g}")) for g in group_cols],
    )
    j = aa.join(bb, cond, "full_outer")
    checks = []
    for c in ac:
        if c in group_cols:
            continue
        x, y = F.col(f"a.{c}"), F.col(f"b.{c}")
        if c == "n":
            checks.append(x.eqNullSafe(y))
        else:
            # a group missing on one side entirely is caught by the n
            # check; for sums, NULL and 0.0 are the same contribution
            checks.append(
                F.abs(
                    F.coalesce(x, F.lit(0.0)) - F.coalesce(y, F.lit(0.0))
                )
                < F.lit(tol)
            )
    bad = j.filter(~reduce(lambda p, q: p & q, checks))
    return bad.isEmpty()
