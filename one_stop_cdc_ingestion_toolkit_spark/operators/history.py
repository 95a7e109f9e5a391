"""CDC consumption-side history operators: SCD Type 2 dimension history
and keyed snapshot diff (a change-data-feed between two table versions).

The reference materializes CDC topics into a lake for downstream merge
(`/root/reference/README.md:22-32` — "ingest ... into data lake" with a
Hudi hint); the two canonical ways downstream jobs *consume* that lake
are (1) a slowly-changing-dimension type-2 history table (every version
of every key, with validity intervals) and (2) a change feed between two
snapshots/table generations (what Delta calls CDF). Both are built here
as generic DataFrame functions plus registered oracle-checked queries
over the `events` changelog.

Scale notes:

- :func:`scd2_from_changelog` is ONE shuffle on the key: the change
  detection, the running version number, the per-version collapse and
  the validity-interval stitch are all windows/aggs partitioned by the
  same key columns, so Catalyst reuses a single hash partitioning
  end-to-end (no re-shuffle between the four steps). At 100 TB the only
  cost driver is key cardinality × versions — never a self-join.
- :func:`snapshot_diff` is one full-outer join on the key between two
  keyed snapshots. Both sides are post-aggregation (one row per key), so
  the join input is bounded by key cardinality, not raw row count; for a
  small dimension vs a large one AQE picks broadcast automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import register


def scd2_from_changelog(
    changes: DataFrame,
    key_cols: list[str],
    attr_col: str,
    order_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Collapse a changelog into SCD Type 2 history rows.

    Consecutive rows per key with the same ``attr_col`` value merge into
    one version (standard SCD2 compression); each version carries
    ``valid_from`` (first change ts), ``valid_to`` (next version's
    valid_from, NULL for the open version), a per-key ``version``
    ordinal, and ``is_current``.

    All four steps share the same ``partitionBy(key_cols)`` — one
    shuffle total (see module docstring).
    """
    w = W.partitionBy(*key_cols).orderBy(*order_cols)
    # first-row marker must not be lag(attr) IS NULL — a legitimate NULL
    # attribute value would then open a new version on every row.
    first = F.lag(F.lit(1)).over(w).isNull()
    chg = first | ~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w))
    versioned = changes.withColumn(
        "version",
        F.sum(chg.cast("int")).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    per_version = versioned.groupBy(*key_cols, "version").agg(
        F.min(ts_col).alias("valid_from"),
        F.first(attr_col).alias(attr_col),
    )
    wv = W.partitionBy(*key_cols).orderBy("version")
    return per_version.select(
        *key_cols,
        F.col(attr_col),
        F.col("version").cast("int").alias("version"),
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


def snapshot_diff(
    v_old: DataFrame,
    v_new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change feed between two keyed snapshots: one row per key whose
    state differs, tagged ``op`` ∈ {insert, update, delete}, with the
    old/new value of every compared column side by side.

    This is the engine's Delta-CDF equivalent over
    ``TableStore.read_as_of`` generations (time travel): diff any two
    versions of a materialized CDC table without a change log replay.
    Inputs must be keyed (≤1 row per key) — e.g. `cdc.snapshot` output.
    """
    o = v_old.select(
        *key_cols, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("__in_old", F.lit(True))
    n = v_new.select(
        *key_cols, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("__in_new", F.lit(True))
    j = o.join(n, key_cols, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    pairs = [x for c in compare_cols for x in (f"old_{c}", f"new_{c}")]
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(*key_cols, "op", *pairs)
    )


@register(
    "a145_scd2_history",
    """WITH o AS (
         SELECT user_id, event_type, ts, event_id,
                lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev,
                lag(1) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) IS NULL AS is_first
         FROM events),
       v AS (
         SELECT user_id, event_type, ts,
                SUM(CASE WHEN is_first OR prev IS DISTINCT FROM event_type
                         THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS version
         FROM o),
       g AS (
         SELECT user_id, version, MIN(ts) AS valid_from,
                MIN(event_type) AS status
         FROM v GROUP BY user_id, version)
       SELECT user_id, status, CAST(version AS INT) AS version, valid_from,
              lead(valid_from) OVER (PARTITION BY user_id
                                     ORDER BY version) AS valid_to,
              lead(valid_from) OVER (PARTITION BY user_id
                                     ORDER BY version) IS NULL AS is_current
       FROM g ORDER BY user_id, version""",
)
def a145_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 history of each user's last event type: the `events`
    stream read as a changelog of a one-attribute dimension. Consecutive
    same-status events collapse into one version row with
    [valid_from, valid_to) validity and an ``is_current`` flag — the
    table a warehouse would maintain downstream of the reference's CDC
    lake. One key shuffle end-to-end (see scd2_from_changelog)."""
    ev = tables(spark, sf_dir)["events"]
    hist = scd2_from_changelog(
        ev.select("user_id", "event_type", "ts", "event_id"),
        key_cols=["user_id"],
        attr_col="event_type",
        order_cols=["ts", "event_id"],
        ts_col="ts",
    )
    return hist.withColumnRenamed("event_type", "status").orderBy(
        "user_id", "version"
    )


_DIFF_CUT = "TIMESTAMP '2024-01-15 00:00:00'"


@register(
    "a146_snapshot_diff",
    f"""WITH r AS (
         SELECT user_id, event_type, value, ts,
                ts < {_DIFF_CUT} AS in_old,
                row_number() OVER (PARTITION BY user_id, event_type,
                                                ts < {_DIFF_CUT}
                                   ORDER BY ts DESC, event_id DESC) AS rn
         FROM events),
       v1 AS (
         SELECT user_id, event_type,
                CAST(COUNT(*) AS BIGINT) AS n,
                MAX(CASE WHEN rn = 1 THEN value END) AS last_value
         FROM r WHERE in_old GROUP BY user_id, event_type),
       v2 AS (
         SELECT user_id, event_type,
                CAST(COUNT(*) AS BIGINT) AS n,
                MAX(CASE WHEN rn = 1 THEN value END) AS last_value
         FROM r WHERE NOT in_old GROUP BY user_id, event_type),
       j AS (
         SELECT COALESCE(v1.user_id, v2.user_id) AS user_id,
                COALESCE(v1.event_type, v2.event_type) AS event_type,
                CASE WHEN v1.user_id IS NULL THEN 'insert'
                     WHEN v2.user_id IS NULL THEN 'delete'
                     WHEN v1.n <> v2.n
                          OR v1.last_value IS DISTINCT FROM v2.last_value
                     THEN 'update' END AS op,
                v1.n AS old_n, v2.n AS new_n,
                v1.last_value AS old_last_value,
                v2.last_value AS new_last_value
         FROM v1 FULL OUTER JOIN v2
           ON v1.user_id = v2.user_id AND v1.event_type = v2.event_type)
       SELECT * FROM j WHERE op IS NOT NULL
       ORDER BY user_id, event_type""",
)
def a146_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed between two period snapshots of per-(user, event_type)
    activity state: first half of January vs second half. Keys present
    only in the old window surface as deletes, only in the new window as
    inserts, value/count changes as updates — the full I/U/D envelope a
    Delta-CDF consumer expects, produced by :func:`snapshot_diff` from
    two bounded aggregations (join input is key-cardinality-sized)."""
    ev = tables(spark, sf_dir)["events"]
    cut = F.to_timestamp(F.lit("2024-01-15 00:00:00"))

    def state(df: DataFrame) -> DataFrame:
        # ONE aggregation: max over (ts, event_id, value) structs picks
        # the same (ts DESC, event_id DESC) winner the old window+filter
        # did (event_id is unique within a key, so the struct order is
        # total and `value` never participates in the comparison), and
        # the count rides in the same shuffle — the old shape scanned
        # the events slice twice and paid an extra join per side
        # (review r7)
        return df.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.struct("ts", "event_id", "value"))["value"].alias(
                "last_value"
            ),
        )

    diff = snapshot_diff(
        state(ev.filter(F.col("ts") < cut)),
        state(ev.filter(F.col("ts") >= cut)),
        key_cols=["user_id", "event_type"],
        compare_cols=["n", "last_value"],
    )
    return diff.select(
        "user_id",
        "event_type",
        "op",
        "old_n",
        "new_n",
        "old_last_value",
        "new_last_value",
    ).orderBy("user_id", "event_type")
