"""SparkSession construction with scale-aware defaults.

The reference sizes its pipeline statically (1 MCU x 1 worker,
``/root/reference/bin/osci.sh:19-20``); the Spark engine instead leans on
AQE for runtime re-planning and exposes the knobs that matter at scale
(shuffle partitions, broadcast threshold, Arrow batches).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "one-stop-cdc-ingestion-toolkit-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Defaults are tuned so the same code runs on ``local[N]`` for tests and
    on a multi-executor cluster unchanged:

    - AQE on (coalesce partitions, skew-join handling) so the sf0.001 test
      run and a 100 TB run both get sane post-shuffle partitioning.
    - Arrow on for any pandas-UDF path (dedup/similarity slow paths).
    - Session timezone pinned to UTC so timestamp semantics match the
      DuckDB oracle and are cluster-location independent.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    # AQE is the right default for real data sizes (runtime coalescing,
    # skew-join splitting). At sub-GB scale its extra query-stage
    # materialization + re-planning rounds cost ~0.1s per shuffle stage and
    # buy nothing, so the bench harness flips this off via env (see
    # bench.py); production leaves it on.
    aqe = os.environ.get("SPARK_GRAFT_AQE", "true")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # parquet scans: vectorized reader + pushdown are on by default;
        # keep file-split size explicit so huge files still parallelize.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # events.parquet carries TIMESTAMP(NANOS) which Spark cannot read as
        # a timestamp; read as raw ns-since-epoch longs (exact, no trunc).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
