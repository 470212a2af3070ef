"""SparkSession factory tuned for the engine.

Local-mode defaults match the sandbox (one JVM, N threads); the same config
block is what we'd ship to a 1000-executor cluster minus the master/memory
overrides.  AQE + skew-join splitting are always on (the north rule's skew
handling), Arrow batches are sized so each pandas-UDF call sees ProjCL-like
batch sizes (10⁴–10⁵ points per call).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH = 65536  # points per UDF call — the reference's sweet spot is large batches


def get_spark(
    app: str = "projcl_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    n = os.cpu_count() or 8 if cores == "*" else int(cores)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(2 * n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
