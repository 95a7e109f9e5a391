"""Sort/Z-order layout optimization (sinks.optimize_layout): after
re-clustering, per-file min/max ranges must actually prune range scans
(files_touched ≪ all files), and the Morton layout must give locality on
BOTH dimensions."""

from __future__ import annotations

from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.sinks import (
    dir_stats,
    files_touched,
    layout_stats,
    optimize_layout,
    zorder_key,
)


def _write_scrambled(spark, path, n=20_000):
    """n rows with k uniform in [0, n) written in hash-scrambled order —
    every file's (min,max) spans ~the full domain, so nothing prunes."""
    df = (
        spark.range(n)
        .withColumn("k", F.col("id"))
        .withColumn("x", F.pmod(F.xxhash64("id"), F.lit(256)).cast("long"))
        .withColumn("y", F.pmod(F.xxhash64("id", "k"), F.lit(256)).cast("long"))
        .repartition(8, "x")  # scramble: files uncorrelated with k
    )
    df.write.mode("overwrite").parquet(path)
    return df


def test_range_sort_layout_prunes(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_scrambled(spark, path)

    before = layout_stats(spark, path, ["k"]).collect()
    # scrambled: a 5%-of-domain range intersects (almost) every file
    assert files_touched(before, "k", 1000, 2000) >= len(before) - 1

    n_files = optimize_layout(
        spark, path, ["k"], target_file_bytes=40_000
    )
    after = layout_stats(spark, path, ["k"]).collect()
    assert len(after) == n_files and n_files >= 4
    # clustered: disjoint ranges → the same scan touches few files
    touched = files_touched(after, "k", 1000, 2000)
    assert touched <= max(2, n_files // 3), (touched, n_files)
    # no rows lost, content identical
    assert spark.read.parquet(path).count() == 20_000
    assert (
        spark.read.parquet(path).agg(F.sum("k")).first()[0]
        == sum(range(20_000))
    )


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_scrambled(spark, path)
    n_files = optimize_layout(
        spark,
        path,
        [],
        target_file_bytes=40_000,
        zorder_pair=("x", "y"),
    )
    stats = layout_stats(spark, path, ["x", "y"]).collect()
    assert len(stats) == n_files and n_files >= 4
    # a 1/4-of-domain box on EITHER dimension skips a real fraction of
    # files — linear sort on x alone would leave y unclustered (every
    # file spanning y's full domain)
    tx = files_touched(stats, "x", 0, 63)
    ty = files_touched(stats, "y", 0, 63)
    assert tx < n_files and ty < n_files, (tx, ty, n_files)
    assert spark.read.parquet(path).count() == 20_000


def test_zorder_key_interleaves():
    import pyspark.sql.functions as F  # noqa: F401

    # driver-side truth check via a tiny DataFrame
    from one_stop_cdc_ingestion_toolkit_spark.session import get_session

    spark = get_session("zorder-test")
    df = spark.createDataFrame([(3, 5)], ["x", "y"]).select(
        zorder_key("x", "y", bits=4).alias("z")
    )
    # x=0b0011, y=0b0101 → z bits: y3 x3 y2 x2 y1 x1 y0 x0 = 0b10 01 11 01...
    # compute expected in python:
    x, y = 3, 5
    exp = 0
    for i in range(4):
        exp |= ((x >> i) & 1) << (2 * i)
        exp |= ((y >> i) & 1) << (2 * i + 1)
    assert df.first().z == exp


def test_optimize_layout_is_crash_safe(spark, tmp_path):
    """A stale ._old backup from a crashed swap must be restored before
    the next optimize rewrites anything (same discipline as compact)."""
    import pathlib

    path = str(tmp_path / "t")
    _write_scrambled(spark, path, n=2000)
    n0 = spark.read.parquet(path).count()
    # simulate crash: data moved to ._old, main dir vanished
    pathlib.Path(path).rename(pathlib.Path(path + "._old"))
    optimize_layout(spark, path, ["k"], target_file_bytes=40_000)
    assert spark.read.parquet(path).count() == n0
