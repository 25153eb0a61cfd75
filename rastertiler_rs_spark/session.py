"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "rastertiler_rs_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """local[N] session tuned for this engine.

    On a real cluster the same configs apply (AQE, Arrow, UTC); master
    and memory come from spark-submit instead.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # tile rows carry pixel blocks (up to ~tilesize^2 bytes each):
        # keep Arrow batches memory-bounded
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # split scans finer than the 128m default (sf-dir parquet is
        # small; 8m keeps small-query task counts sane while still
        # splitting multi-file tables). The render pipeline no longer
        # depends on scan splits at all: its map side (footprint +
        # cover explode) is pure JVM codegen and its Python stages sit
        # behind explicit repartitions. Round 2's global 4m setting —
        # which existed to parallelize the then-Python footprint stage —
        # doubled every small query's scan tasks and showed up in the
        # driver bench; don't re-tighten this session-wide.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"))
        # wrapping 64-bit hash arithmetic must not throw (Spark 4 ANSI default)
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
