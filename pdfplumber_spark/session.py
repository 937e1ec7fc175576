"""SparkSession factory with scale-oriented defaults.

Local mode here is a stand-in for a 1000-executor cluster: every setting is
chosen to survive a 100x scale-up —

- AQE on (runtime re-plan, skew-join splitting, partition coalescing);
- Arrow execution for all pandas UDF exchange (the engine's kernels are
  Arrow-batched; per-row Python is banned by design);
- shuffle partitions sized to cores locally; on a real cluster set
  ``spark.sql.shuffle.partitions`` ~ 2-3x total cores and rely on AQE
  coalescing;
- ``maxRecordsPerBatch`` bounds Arrow batch memory for pages with huge char
  counts (mega-doc skew).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pdfplumber-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
