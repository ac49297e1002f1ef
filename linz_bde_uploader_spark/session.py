"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]``; the same settings are what we would
ship as ``spark-defaults`` for a 1000-executor cluster run: AQE on (runtime
join-strategy + skew handling), Arrow on (Pandas-UDF slow path), shuffle
partitions sized to the cluster rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "linz_bde_uploader_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism so bench.py and tests
    share one code path. At cluster scale the master/core settings come from
    spark-submit; everything below the master line is scale-independent.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # GC note: default G1. ZGC was measured here and REJECTED — its
        # concurrent collector threads compete with local[32]'s fully
        # saturated executor threads (bench total regressed ~50%). The
        # occasional multi-second pause on one query per run is cheaper
        # than a constant throughput tax.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", ""),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
